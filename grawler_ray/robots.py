"""robots.txt matcher with Google robotstxt semantics.

The reference gates every URL through ``grobotstxt.AgentAllowed(robots,
"grawler", url)`` (src/crawler.go:249) — grobotstxt is a Go port of Google's
C++ robotstxt library, so we reimplement that library's published matching
semantics (https://github.com/google/robotstxt, Apache-2.0; also RFC 9309):

- lines are ``key: value`` with ``#`` comments; keys case-insensitive; the
  recognized keys are user-agent / allow / disallow (sitemap et al ignored).
- groups: consecutive user-agent lines share the rule block that follows.
- agent match: a group applies if its agent token is a case-insensitive
  PREFIX of the matcher's user agent product name ("grawler"); ``*`` matches
  any agent.  If any specific group matches, ``*`` groups are ignored.
- path match: patterns support ``*`` (any substring) and ``$`` (end anchor);
  the match target is path + '?' + query of the URL.  The LONGEST matching
  pattern wins; at equal length allow beats disallow.  An empty pattern is
  ignored.  No applicable group, or no matching rule => allowed.

The reference's behavioral quirks around robots live in ``agentAllowed``
(src/crawler.go:222-254) and are reproduced in the pipeline, not here:
fetch error (incl. status > 399, src/utils/utils.go:40-42) => URL skipped
(deny), cache TTL = 1 month + 15 days (src/crawler.go:230).
"""

from __future__ import annotations

import re


def _extract_path_params_query(url: str) -> str:
    """Google robotstxt GetPathParamsQuery: everything from the first '/'
    after the authority through the end, query kept, fragment dropped;
    defaults to '/'."""
    s = url
    hash_pos = s.find("#")
    if hash_pos >= 0:
        s = s[:hash_pos]
    scheme = s.find("://")
    if scheme >= 0:
        rest = s[scheme + 3 :]
    else:
        colon = s.find(":")
        rest = s[colon + 1 :] if colon >= 0 else s
    slash = rest.find("/")
    if slash < 0:
        return "/"
    return rest[slash:]


def _pattern_matches(pattern: str, path: str) -> bool:
    """Wildcard match: '*' = any substring, trailing '$' = end anchor."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    pos = 0
    for i, part in enumerate(parts):
        if i == 0:
            if not path.startswith(part):
                return False
            pos = len(part)
        else:
            idx = path.find(part, pos)
            if idx < 0:
                return False
            pos = idx + len(part)
    if anchored:
        if parts[-1] == "":  # pattern ended with '*$'
            return True
        return pos == len(path)
    return True


_PRODUCT_RE = re.compile(r"[A-Za-z_-]*")


class RobotsRules:
    """Parsed rule groups for one robots.txt body."""

    __slots__ = ("groups",)

    def __init__(self, body: str):
        # groups: list of (agents:list[str], rules:list[(allow:bool, pattern)])
        self.groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        agents: list[str] = []
        rules: list[tuple[bool, str]] = []
        collecting_agents = True
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            key, sep, value = line.partition(":")
            if not sep:
                continue
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if not collecting_agents and agents:
                    self.groups.append((agents, rules))
                    agents, rules = [], []
                collecting_agents = True
                if value.startswith("*"):
                    agents.append("*")
                else:
                    # Google: take the product token of the line value
                    agents.append(_PRODUCT_RE.match(value).group(0).lower())
            elif key in ("allow", "disallow"):
                if not agents:
                    continue  # rules before any user-agent line are ignored
                collecting_agents = False
                rules.append((key == "allow", value))
            # other keys (sitemap, crawl-delay, ...) ignored
        if agents:
            self.groups.append((agents, rules))

    def allowed(self, user_agent: str, url: str) -> bool:
        ua = (_PRODUCT_RE.match(user_agent).group(0) or user_agent).lower()
        path = _extract_path_params_query(url)

        specific: list[tuple[bool, str]] = []
        generic: list[tuple[bool, str]] = []
        has_specific = False
        for agents, rules in self.groups:
            is_specific = any(a and a != "*" and ua.startswith(a) for a in agents)
            if is_specific:
                has_specific = True
                specific.extend(rules)
            elif "*" in agents:
                generic.extend(rules)
        rules = specific if has_specific else generic

        best_len = -1
        best_allow = True
        for allow, pattern in rules:
            if pattern == "":
                continue
            if _pattern_matches(pattern, path):
                # longest pattern wins; tie -> allow wins
                plen = len(pattern)
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len = plen
                    best_allow = allow
        return best_allow if best_len >= 0 else True


def agent_allowed(robots_body: str, user_agent: str, url: str) -> bool:
    """grobotstxt.AgentAllowed equivalent."""
    return RobotsRules(robots_body).allowed(user_agent, url)


def sitemap_urls(robots_body: str, base_url: str = "") -> list[str]:
    """``Sitemap:`` directives from a robots.txt body, in file order with
    duplicates removed (first wins) — the standard discovery channel for
    ``--seed-sitemap`` crawl seeding (sitemaps.org / REP §2.4: the
    directive is group-independent, so it is scanned globally, exactly
    like the rule parser above ignores it).  Relative values (seen in the
    wild despite the spec requiring absolute URLs) resolve against
    ``base_url`` when given, else are dropped.  Resolution uses the
    ``scheme://host`` ORIGIN of base_url — robots.txt always sits at the
    origin root, so a base_url carrying a path (``…/robots.txt``) must
    not leak that path into the resolved sitemap URL."""
    origin = ""
    if base_url:
        sep_at = base_url.find("://")
        if sep_at >= 0:
            host_end = base_url.find("/", sep_at + 3)
            origin = base_url if host_end < 0 else base_url[:host_end]
    out: list[str] = []
    seen: set[str] = set()
    for raw in robots_body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep or key.strip().lower() != "sitemap":
            continue
        value = value.strip()
        if not value:
            continue
        if "://" not in value:
            if not origin:
                continue
            value = origin + "/" + value.lstrip("/")
        if value not in seen:
            seen.add(value)
            out.append(value)
    return out
