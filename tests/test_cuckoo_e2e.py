"""Cuckoo seen-set mode end-to-end + empty-crawl robustness: at test scale (no false positives in
practice) the crawl output matches exact mode (SURVEY §2.3 T1 scale path)."""

import shutil

import pytest

from grawler_ray.config import CrawlConfig
from grawler_ray.sources.corpus import generate_corpus, generate_robots_cache, seed_urls

CORPUS = "/tmp/gr_cuckoo_corpus"
ROBOTS = f"{CORPUS}/robots_cache.parquet"


@pytest.fixture(scope="module")
def setup(ray_session):
    shutil.rmtree(CORPUS, ignore_errors=True)
    generate_corpus(CORPUS, n_hosts=3, pages_per_host=8, seed=7, num_buckets=8)
    generate_robots_cache(ROBOTS, 7, 3, CrawlConfig().now_us)
    return CORPUS


def _run(mode: str, out: str):
    from grawler_ray.pipelines.crawl import read_documents, run_crawl

    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(
        per_host_quota=3, max_rounds=6, num_fetch_buckets=8, seen_shards=4,
        seen_mode=mode, out_dir=out,
    )
    run_crawl(CORPUS, seed_urls(3, 2), cfg, robots_cache_path=ROBOTS)
    return read_documents(out).to_pandas().sort_values("url").reset_index(drop=True)


def test_cuckoo_mode_matches_exact(setup):
    exact = _run("exact", "/tmp/gr_cuckoo_exact")
    cuckoo = _run("cuckoo", "/tmp/gr_cuckoo_out")
    assert len(exact) > 0
    assert list(exact.url) == list(cuckoo.url)
    assert (exact.content.values == cuckoo.content.values).all()


def test_all_denied_crawl_yields_empty_outputs(setup):
    """Seed 5's hosts 0-1 deny everything => a crawl whose every seed is
    robots-denied must complete cleanly with empty sinks (the no-parsed-dir
    edge this test originally exposed)."""
    from grawler_ray.pipelines.crawl import read_documents, run_crawl

    shutil.rmtree("/tmp/gr_denied_corpus", ignore_errors=True)
    generate_corpus("/tmp/gr_denied_corpus", n_hosts=2, pages_per_host=4, seed=5, num_buckets=4)
    generate_robots_cache("/tmp/gr_denied_robots.parquet", 5, 2, CrawlConfig().now_us)
    cfg = CrawlConfig(per_host_quota=3, max_rounds=3, num_fetch_buckets=4,
                      seen_shards=2, out_dir="/tmp/gr_denied_out")
    shutil.rmtree(cfg.out_dir, ignore_errors=True)
    stats = run_crawl("/tmp/gr_denied_corpus", seed_urls(2, 2), cfg,
                      robots_cache_path="/tmp/gr_denied_robots.parquet")
    assert stats["fetched"] == 0
    assert read_documents(cfg.out_dir).count() == 0
