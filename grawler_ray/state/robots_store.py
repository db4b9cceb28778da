"""Sharded robots.txt cache + gate — actor-pool stateful stage (SURVEY §2.3 T3).

The reference stores robots rows only in the DB and does a network round trip
per URL (src/crawler.go:222-254, src/db/db.go:81-109).  Here each shard actor
owns the cache for ``xxhash64(host) % num_shards`` hosts: parsed rule objects
in memory, "fetches" of missing/stale robots.txt served by a point read into
the bucketed corpus (a single-bucket, single-url predicate-pushdown Parquet
scan — the same layout the fetch join uses), and the reference's semantics:

- TTL: entry stale when ``ts < now - robots_ttl_days`` (crawler.go:230;
  1 month + 15 days).
- fetch error => DENY the URL (crawler.go:142-150 returns err => skip), and
  status > 399 counts as a fetch error (utils.go:40-42) — including 404,
  unlike allow-on-404 crawlers.
- freshly fetched bodies are upserted with ts=now (crawler.go:244); the
  written-back robots table is this cache's snapshot.
"""

from __future__ import annotations

import os

import pyarrow.dataset as pads

from ..robots import RobotsRules
from ..urlops import xxhash64


class RobotsShard:
    def __init__(
        self,
        corpus_dir: str,
        num_buckets: int,
        user_agent: str,
        now_us: int,
        ttl_days: int,
        initial: dict[str, tuple[str, int]] | None = None,
        fetch_mode: str = "corpus",
        http_timeout_s: float = 10.0,
    ):
        self.corpus_dir = corpus_dir
        self.num_buckets = num_buckets
        self.user_agent = user_agent
        self.now_us = now_us
        self.fetch_mode = fetch_mode
        self.http_timeout_s = http_timeout_s
        self.ttl_us = ttl_days * 86_400_000_000
        # host -> (body, ts_us) | None = known-missing (negative cache)
        self.cache: dict[str, tuple[str, int] | None] = dict(initial or {})
        self.rules: dict[str, RobotsRules] = {}
        # hosts whose (re)fetch failed this run: deny, but KEEP any stale
        # cached body for the snapshot (the reference only upserts robots rows
        # on fetch success, src/db/db.go:95-100 — a failed refetch leaves the
        # old DB row in place; the oracle mirrors that in robots_allowed)
        self.denied: set[str] = set()

    def _fetch_robots(self, base_url: str) -> tuple[str, int] | None:
        """{base}/robots.txt — point lookup in the bucketed corpus, or a live
        HTTP GET in fetch_mode="http" (S3 live mode)."""
        if self.fetch_mode == "http":
            from ..sources.httpfetch import fetch_robots_http

            body = fetch_robots_http(base_url, self.user_agent, self.http_timeout_s)
            return None if body is None else (body, self.now_us)
        url = f"{base_url}/robots.txt"
        bucket = xxhash64(url) % self.num_buckets
        path = os.path.join(self.corpus_dir, f"bucket={bucket}")
        if not os.path.isdir(path):
            return None
        ds = pads.dataset(path, format="parquet")
        t = ds.to_table(
            columns=["url", "html", "status_code"],
            filter=pads.field("url") == url,
        )
        if t.num_rows == 0 or t.column("status_code")[0].as_py() > 399:
            return None
        body = t.column("html")[0].as_py().decode("utf-8", errors="replace")
        return body, self.now_us

    def _resolve(self, host: str, base_url: str) -> RobotsRules | None:
        """Rules for a host, or None = deny.  Resolves cache -> corpus fetch
        -> deny once per host; failed fetches memoize a deny (now_us is fixed
        for the run, so a retry would fail identically) without evicting a
        stale cached body from the snapshot."""
        if host in self.denied:
            return None
        entry = self.cache.get(host, "MISS")
        stale = entry != "MISS" and entry is not None and entry[1] < self.now_us - self.ttl_us
        if entry == "MISS" or stale:
            fetched = self._fetch_robots(base_url)
            if fetched is None:
                if entry == "MISS":
                    self.cache[host] = None  # negative cache (never snapshotted)
                self.denied.add(host)
                return None  # deny-on-error (incl. robots 404)
            self.cache[host] = fetched
            self.rules.pop(host, None)
            entry = fetched
        if entry is None:
            return None
        if host not in self.rules:
            self.rules[host] = RobotsRules(entry[0])
        return self.rules[host]

    def gate(self, host: str, base_url: str, urls: list[str]) -> list[bool]:
        """True = allowed — single-host form (unit tests / small callers)."""
        r = self._resolve(host, base_url)
        if r is None:
            return [False] * len(urls)
        return [r.allowed(self.user_agent, u) for u in urls]

    def gate_many(self, hosts: list[str], base_urls: list[str], urls: list[str]) -> list[bool]:
        """Batched gate: one remote call per (shard, admission batch) instead
        of one blocking call per host group (the `_seen_test_batch` routing
        pattern).  Rows may span many hosts; each host resolves once."""
        out = []
        for h, b, u in zip(hosts, base_urls, urls):
            r = self._resolve(h, b)
            out.append(False if r is None else r.allowed(self.user_agent, u))
        return out

    def snapshot(self) -> list[tuple[str, str, int]]:
        """(host, body, ts) rows for the written-back robots table."""
        return [(h, e[0], e[1]) for h, e in self.cache.items() if e is not None]
