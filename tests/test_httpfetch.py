"""Live-HTTP fetch mode (S3, utils.go:22-45) against a loopback http.server:
fetch semantics (UA header, >399 => error), robots gate over HTTP
(deny-on-404), and a full run_crawl in fetch_mode="http"."""

import http.server
import os
import threading

import pytest

SITE = {
    "/index.html": (
        "<html><head><title>Home</title></head><body>"
        '<p>welcome to the tiny site</p>'
        '<a href="/page1.html">one</a> <a href="/secret/hidden.html">s</a>'
        "</body></html>"
    ),
    "/page1.html": (
        "<html><head><title>P1</title></head><body>"
        "<p>page one words here</p>"
        '<a href="/page2.html">two</a></body></html>'
    ),
    "/page2.html": "<html><body><p>the last page</p></body></html>",
    "/secret/hidden.html": "<html><body><p>should never fetch</p></body></html>",
    "/robots.txt": "User-agent: *\nDisallow: /secret/\n",
}


class Handler(http.server.BaseHTTPRequestHandler):
    seen_agents: list[str] = []

    def do_GET(self):
        Handler.seen_agents.append(self.headers.get("User-Agent", ""))
        body = SITE.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b"not found")
            return
        ctype = "text/plain" if self.path.endswith(".txt") else "text/html"
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_fetch_one_semantics(server):
    from grawler_ray.sources.httpfetch import fetch_one

    body, ctype, status, ok = fetch_one(f"{server}/index.html", "grawler", 5.0)
    assert ok and status == 200 and b"welcome" in body and ctype.startswith("text/html")
    assert "grawler" in Handler.seen_agents[-1]  # UA header (utils.go:28-31)
    _, _, status, ok = fetch_one(f"{server}/nope.html", "grawler", 5.0)
    assert not ok and status == 404  # >399 => fetch error (utils.go:40-42)
    _, _, _, ok = fetch_one("http://127.0.0.1:9/x", "grawler", 2.0)
    assert not ok  # transport error


def test_fetch_robots_http(server):
    from grawler_ray.sources.httpfetch import fetch_robots_http

    body = fetch_robots_http(server, "grawler", 5.0)
    assert body is not None and "Disallow: /secret/" in body


def test_crawl_http_mode(ray_session, server, tmp_path):
    from grawler_ray.config import CrawlConfig
    from grawler_ray.pipelines.crawl import read_documents, read_trace, run_crawl

    out = str(tmp_path / "out")
    cfg = CrawlConfig(
        fetch_mode="http", per_host_quota=10, max_rounds=4, seen_shards=2,
        http_concurrency=2, out_dir=out,
    )
    stats = run_crawl("", [f"{server}/index.html"], cfg)
    docs = read_documents(out).to_pandas()
    urls = set(docs.url)
    assert f"{server}/index.html" in urls
    assert f"{server}/page1.html" in urls
    assert f"{server}/page2.html" in urls
    # robots Disallow honored: the secret page is never fetched
    assert not any("secret" in u for u in urls)
    trace = read_trace(out).to_pandas()
    acts = dict(zip(trace.url, trace.action))
    assert acts[f"{server}/secret/hidden.html"] == "robots-drop"
    assert stats["fetched"] == 3
    assert "welcome to the tiny site" in docs[docs.url == f"{server}/index.html"].content.iloc[0]


def test_http_politeness_budget_under_actor_pool(ray_session, tmp_path):
    """The politeness budget holds under the LIVE actor pool, not just the
    deterministic corpus schedule: two loopback hosts with 12 children
    each and per_host_quota=4 — the server-side request log must show (a)
    every URL fetched exactly once, (b) <= quota fetches per (round,
    host), and (c) round barriers in wall-clock: all of round r's
    requests to a host complete before any round r+1 request arrives."""
    import time

    import http.server as hs

    def make_site(nkids):
        site = {
            "/index.html": (
                "<html><body>"
                + " ".join(f'<a href="/p{i}.html">k{i}</a>' for i in range(nkids))
                + "</body></html>"
            ),
            "/robots.txt": "User-agent: *\nAllow: /\n",
        }
        for i in range(nkids):
            site[f"/p{i}.html"] = f"<html><body><p>leaf {i} words</p></body></html>"
        return site

    class LogHandler(hs.BaseHTTPRequestHandler):
        site: dict
        log: list

        def do_GET(self):
            self.log.append((time.monotonic(), self.path))
            body = self.site.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            data = body.encode()
            ctype = "text/plain" if self.path.endswith(".txt") else "text/html"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    servers, bases, logs = [], [], []
    for _ in range(2):
        log: list = []
        H = type("H", (LogHandler,), {"site": make_site(12), "log": log})
        httpd = hs.ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        servers.append(httpd)
        bases.append(f"http://127.0.0.1:{httpd.server_address[1]}")
        logs.append(log)
    try:
        from grawler_ray.config import CrawlConfig
        from grawler_ray.pipelines.crawl import read_trace, run_crawl

        out = str(tmp_path / "out")
        quota = 4
        cfg = CrawlConfig(
            fetch_mode="http", per_host_quota=quota, max_rounds=6,
            seen_shards=2, http_concurrency=2, out_dir=out,
        )
        stats = run_crawl("", [f"{b}/index.html" for b in bases], cfg)
        assert stats["fetched"] == 2 * 13  # index + 12 kids per host

        trace = read_trace(out).to_pandas()
        fetched = trace[trace.action == "fetched"]
        # (b) quota per (round, host) in the TRACE
        per = fetched.groupby(["round", fetched.url.str.split("/").str[2]]).size()
        assert (per <= quota).all(), per[per > quota]

        for base, log in zip(bases, logs):
            host = base.split("//")[1]
            page_reqs = [(t, p) for t, p in log if p != "/robots.txt"]
            # (a) exactly once over the wire
            paths = [p for _, p in page_reqs]
            assert sorted(paths) == sorted(set(paths))
            assert len(paths) == 13
            # (c) wall-clock round barriers: map each path to its trace
            # round; requests of round r all precede round r+1's
            rounds = dict(
                zip(
                    fetched[fetched.url.str.contains(host, regex=False)]
                    .url.str.split("/").str[3],
                    fetched[fetched.url.str.contains(host, regex=False)]["round"],
                )
            )
            by_round: dict = {}
            for t, p in page_reqs:
                r = rounds[p.lstrip("/")]
                by_round.setdefault(r, []).append(t)
            rs = sorted(by_round)
            for a, b in zip(rs, rs[1:]):
                assert max(by_round[a]) <= min(by_round[b]), (a, b)
                # and each round's in-flight set respects the quota
                assert len(by_round[b]) <= quota
    finally:
        for s in servers:
            s.shutdown()
