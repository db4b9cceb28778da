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
    ):
        self.corpus_dir = corpus_dir
        self.num_buckets = num_buckets
        self.user_agent = user_agent
        self.now_us = now_us
        self.ttl_us = ttl_days * 86_400_000_000
        # host -> (body, ts_us) | None = known-missing (negative cache)
        self.cache: dict[str, tuple[str, int] | None] = dict(initial or {})
        self.rules: dict[str, RobotsRules] = {}

    def _fetch_robots(self, base_url: str) -> tuple[str, int] | None:
        """Point lookup of {base}/robots.txt in the bucketed corpus."""
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

    def gate(self, host: str, base_url: str, urls: list[str]) -> list[bool]:
        """True = allowed.  Resolves (cache -> corpus fetch -> deny) once per
        host, then matches each URL."""
        entry = self.cache.get(host, "MISS")
        if entry == "MISS" or (entry is not None and entry[1] < self.now_us - self.ttl_us):
            entry = self._fetch_robots(base_url)
            self.cache[host] = entry
            self.rules.pop(host, None)
        if entry is None:
            return [False] * len(urls)  # deny-on-error (incl. robots 404)
        if host not in self.rules:
            self.rules[host] = RobotsRules(entry[0])
        r = self.rules[host]
        return [r.allowed(self.user_agent, u) for u in urls]

    def snapshot(self) -> list[tuple[str, str, int]]:
        """(host, body, ts) rows for the written-back robots table."""
        return [(h, e[0], e[1]) for h, e in self.cache.items() if e is not None]
