"""Live-HTTP fetch stage — the reference's actual fetch path (S3,
src/utils/utils.go:22-45), as an actor-pool ``map_batches`` stage.

The reference does one blocking ``http.Get`` per URL on 20 goroutines
(src/crawler.go:96).  Here each pool actor owns a thread pool and fetches a
whole admission batch concurrently; `concurrency x max_threads` bounds total
in-flight requests.  Reference semantics mirrored exactly:

- request carries the configured User-Agent header (utils.go:28-31);
- ANY transport error OR status > 399 is a fetch error (utils.go:40-42) —
  surfaced as found=False so the pipeline traces ``fetch-miss``;
- body bytes + Content-Type header are returned raw; parsing stays in the
  parse stage.

The corpus-join mode (pipelines/crawl.py `_fetch_group`) remains the
benchmark/test path — this container has no network, so the unit test runs
a loopback http.server (tests/test_httpfetch.py).
"""

from __future__ import annotations

import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyarrow as pa

_PASSTHROUGH = ["seq", "url", "parent_url", "host", "base_url", "key_hash"]


def fetch_one(url: str, user_agent: str, timeout_s: float) -> tuple[bytes, str, int, bool]:
    """(body, content_type, status, ok) for one URL, utils.go:22-45 rules."""
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            status = resp.status
            body = resp.read()
            ctype = resp.headers.get("Content-Type", "") or ""
    except urllib.error.HTTPError as e:
        # 4xx/5xx reach us as HTTPError; >399 is a fetch error either way
        return b"", "", int(e.code), False
    except Exception:
        return b"", "", 0, False
    if status > 399:
        return b"", "", status, False
    return body, ctype, status, True


class HttpFetcher:
    """Callable class for ``map_batches(HttpFetcher, concurrency=N, ...)``:
    the thread pool is built once per actor (__init__), each batch fans its
    URLs across it."""

    def __init__(self, user_agent: str = "grawler", timeout_s: float = 10.0, max_threads: int = 16):
        self.user_agent = user_agent
        self.timeout_s = timeout_s
        self.pool = ThreadPoolExecutor(max_workers=max_threads)

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        results = list(
            self.pool.map(lambda u: fetch_one(u, self.user_agent, self.timeout_s), urls)
        )
        cols = {name: t.column(name) for name in _PASSTHROUGH if name in t.schema.names}
        cols["html"] = pa.array([r[0] for r in results], pa.binary())
        cols["content_type"] = pa.array([r[1] for r in results], pa.string())
        cols["status_code"] = pa.array(
            np.array([r[2] for r in results], dtype=np.int16), pa.int16()
        )
        cols["found"] = pa.array([r[3] for r in results], pa.bool_())
        return pa.table(cols)


def fetch_robots_http(base_url: str, user_agent: str, timeout_s: float = 10.0) -> str | None:
    """{base}/robots.txt over live HTTP; None on any error (=> deny, the
    agentAllowed error path, crawler.go:142-150)."""
    body, _, _, ok = fetch_one(f"{base_url}/robots.txt", user_agent, timeout_s)
    if not ok:
        return None
    return body.decode("utf-8", errors="replace")
