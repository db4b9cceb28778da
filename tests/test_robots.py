"""Unit tests for the Google-robotstxt-style matcher (SURVEY §2.3 T3)."""

from grawler_ray.robots import RobotsRules, _extract_path_params_query, agent_allowed

UA = "grawler"


def test_specific_group_overrides_star():
    body = (
        "User-agent: *\nDisallow: /private/\n\n"
        "User-agent: grawler\nDisallow: /grawler-only/\n"
    )
    assert agent_allowed(body, UA, "https://a.com/private/x")
    assert not agent_allowed(body, UA, "https://a.com/grawler-only/x")
    assert agent_allowed(body, UA, "https://a.com/other")


def test_longest_match_wins_allow_beats_tie():
    body = "User-agent: *\nDisallow: /private/\nAllow: /private/open\n"
    assert not agent_allowed(body, UA, "https://a.com/private/x")
    assert agent_allowed(body, UA, "https://a.com/private/open/page")
    tie = "User-agent: *\nDisallow: /page\nAllow: /page"
    assert agent_allowed(tie, UA, "https://a.com/page")


def test_wildcard_and_anchor():
    body = "User-agent: *\nDisallow: /*.pdf$\n"
    assert not agent_allowed(body, UA, "https://a.com/doc.pdf")
    assert agent_allowed(body, UA, "https://a.com/doc.pdfx")
    assert not agent_allowed(body, UA, "https://a.com/a/b/doc.pdf")


def test_empty_and_missing():
    assert agent_allowed("", UA, "https://a.com/x")
    assert agent_allowed("User-agent: *\nDisallow:", UA, "https://a.com/x")
    assert not agent_allowed("User-agent: *\nDisallow: /", UA, "https://a.com/x")


def test_agent_prefix_matching():
    assert not agent_allowed("User-agent: graw\nDisallow: /", UA, "https://a.com/x")
    assert agent_allowed("User-agent: grawlerbot\nDisallow: /", UA, "https://a.com/x")
    assert not agent_allowed("User-agent: GRAWLER\nDisallow: /", UA, "https://a.com/x")


def test_grouped_agents_and_comments():
    body = (
        "# robots\nUser-agent: a\nUser-agent: grawler\nDisallow: /x # inline\n"
        "User-agent: b\nDisallow: /y\n"
    )
    assert not agent_allowed(body, UA, "https://a.com/x1")
    assert agent_allowed(body, UA, "https://a.com/y1")


def test_query_in_match_target():
    assert _extract_path_params_query("https://a.com/p?q=1#f") == "/p?q=1"
    assert _extract_path_params_query("https://a.com") == "/"
    body = "User-agent: *\nDisallow: /p?q=1\n"
    assert not agent_allowed(body, UA, "https://a.com/p?q=1")


def test_rules_reusable():
    rules = RobotsRules("User-agent: *\nDisallow: /a\n")
    assert not rules.allowed(UA, "https://x.com/a")
    assert rules.allowed(UA, "https://x.com/b")


class TestSitemapDirectives:
    def test_extraction_order_dedup_comments(self):
        from grawler_ray.robots import sitemap_urls

        body = (
            "User-agent: *\nDisallow: /private\n"
            "Sitemap: https://h.test/sm1.xml\n"
            "sitemap:   https://h.test/sm2.xml.gz  # trailing comment\n"
            "SITEMAP: https://h.test/sm1.xml\n"   # dup -> first wins
            "Sitemap:\n"                            # empty -> dropped
        )
        assert sitemap_urls(body) == [
            "https://h.test/sm1.xml",
            "https://h.test/sm2.xml.gz",
        ]

    def test_relative_requires_base(self):
        from grawler_ray.robots import sitemap_urls

        body = "Sitemap: /sm.xml\n"
        assert sitemap_urls(body) == []
        assert sitemap_urls(body, base_url="https://h.test/") == [
            "https://h.test/sm.xml"
        ]

    def test_relative_resolves_against_origin(self):
        # base_url always carries the /robots.txt path in practice; the
        # path must NOT leak into the resolved sitemap URL
        from grawler_ray.robots import sitemap_urls

        body = "Sitemap: sm.xml\nSitemap: /deep/sm2.xml\n"
        assert sitemap_urls(body, base_url="https://h.test/robots.txt") == [
            "https://h.test/sm.xml",
            "https://h.test/deep/sm2.xml",
        ]
        # port is part of the origin; schemeless base yields no resolution
        assert sitemap_urls(body, base_url="http://h.test:8080/robots.txt") == [
            "http://h.test:8080/sm.xml",
            "http://h.test:8080/deep/sm2.xml",
        ]
        assert sitemap_urls(body, base_url="not-a-url") == []

    def test_group_independent(self):
        # the directive counts even between/inside agent groups
        from grawler_ray.robots import sitemap_urls

        body = (
            "User-agent: a\nDisallow: /x\nSitemap: https://h.test/a.xml\n"
            "User-agent: b\nSitemap: https://h.test/b.xml\nAllow: /\n"
        )
        assert sitemap_urls(body) == [
            "https://h.test/a.xml",
            "https://h.test/b.xml",
        ]
