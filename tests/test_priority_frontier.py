"""frontier_order="priority" (north rule: priority queue): shallowest-path-
first admission within each round, full trace equality vs the serial oracle,
and a behavioral check that priority actually reorders admission vs fifo."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grawler_ray.config import CrawlConfig
from grawler_ray.oracle import run_oracle
from grawler_ray.urlops import xxhash64

HOST = "https://site0.test"
CORPUS = "/tmp/gr_prio_corpus"
NUM_BUCKETS = 4


def _page(links: list[str]) -> bytes:
    anchors = "".join(f'<a href="{h}">x</a>' for h in links)
    return f"<html><head><title>t</title></head><body>{anchors} text</body></html>".encode()


def _pages() -> dict[str, dict]:
    # seed links 6 children of mixed depth; quota 3 => fifo admits the first
    # three by discovery order, priority admits the three depth-1 pages
    pages = {
        f"{HOST}/index": {"html": _page(
            ["/d1/d2", "/d1/d2/d3", "/d1", "/e1/e2", "/e1", "/f1"]
        )},
        f"{HOST}/d1": {"html": _page([])},
        f"{HOST}/d1/d2": {"html": _page([])},
        f"{HOST}/d1/d2/d3": {"html": _page([])},
        f"{HOST}/e1": {"html": _page([])},
        f"{HOST}/e1/e2": {"html": _page([])},
        f"{HOST}/f1": {"html": _page([])},
        f"{HOST}/robots.txt": {
            "html": b"User-agent: *\nAllow: /\n",
            "content_type": "text/plain",
        },
    }
    for p in pages.values():
        p.setdefault("content_type", "text/html")
        p.setdefault("status_code", 200)
    return pages


def _write_corpus(pages: dict[str, dict]) -> None:
    shutil.rmtree(CORPUS, ignore_errors=True)
    buckets: dict[int, list[str]] = {}
    for url in pages:
        buckets.setdefault(xxhash64(url) % NUM_BUCKETS, []).append(url)
    for k, urls in buckets.items():
        urls = sorted(urls)
        t = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([0] * len(urls), pa.timestamp("us")),
                "html": pa.array([pages[u]["html"] for u in urls], pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
                "content_type": pa.array([pages[u]["content_type"] for u in urls], pa.string()),
                "status_code": pa.array([pages[u]["status_code"] for u in urls], pa.int16()),
            }
        )
        d = os.path.join(CORPUS, f"bucket={k}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "part.parquet"))


def _cfg(out_dir: str, order: str) -> CrawlConfig:
    return CrawlConfig(
        per_host_quota=3, max_rounds=5, num_fetch_buckets=NUM_BUCKETS,
        seen_shards=2, out_dir=out_dir, frontier_order=order,
    )


@pytest.fixture(scope="module")
def prio_corpus(ray_session):
    pages = _pages()
    _write_corpus(pages)
    oracle_corpus = {
        u: {"html": p["html"], "content_type": p["content_type"], "status_code": p["status_code"]}
        for u, p in pages.items()
    }
    return oracle_corpus


def _run_and_compare(order: str, oracle_corpus) -> pd.DataFrame:
    from grawler_ray.pipelines.crawl import read_trace, run_crawl

    out = f"/tmp/gr_prio_out_{order}"
    shutil.rmtree(out, ignore_errors=True)
    cfg = _cfg(out, order)
    run_crawl(CORPUS, [f"{HOST}/index"], cfg)
    oracle = run_oracle(oracle_corpus, [f"{HOST}/index"], cfg)
    trace = read_trace(out).to_pandas().sort_values(["round", "seq"]).reset_index(drop=True)
    otrace = pd.DataFrame(oracle.trace).sort_values(["round", "seq"]).reset_index(drop=True)
    cols = ["round", "seq", "url", "parent_url", "action"]
    assert len(trace) == len(otrace), (order, len(trace), len(otrace))
    assert trace[cols].astype({"round": int, "seq": int}).equals(
        otrace[cols].astype({"round": int, "seq": int})
    ), order
    return trace


def test_priority_trace_equals_oracle(prio_corpus):
    trace = _run_and_compare("priority", prio_corpus)
    # behavioral: round 1 fetches the three depth-1 children, defers the deep
    r1 = trace[trace["round"] == 1]
    fetched = set(r1[r1.action == "fetched"].url)
    assert fetched == {f"{HOST}/d1", f"{HOST}/e1", f"{HOST}/f1"}
    deferred = set(r1[r1.action == "deferred"].url)
    assert f"{HOST}/d1/d2/d3" in deferred


def test_fifo_differs_from_priority(prio_corpus):
    trace = _run_and_compare("fifo", prio_corpus)
    # fifo admits the first three DISCOVERED children instead — the deep ones
    r1 = trace[trace["round"] == 1]
    fetched = set(r1[r1.action == "fetched"].url)
    assert fetched == {f"{HOST}/d1/d2", f"{HOST}/d1/d2/d3", f"{HOST}/d1"}


def test_priority_rejects_max_urls(prio_corpus):
    from grawler_ray.pipelines.crawl import run_crawl

    cfg = _cfg("/tmp/gr_prio_reject", "priority")
    cfg.max_urls = 5
    with pytest.raises(ValueError):
        run_crawl(CORPUS, [f"{HOST}/index"], cfg)
