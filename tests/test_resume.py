"""Checkpoint/resume: kill after round R, resume from manifests, final
tables equal the uninterrupted run (SURVEY §5.4; north rule resumability)."""

import shutil

import pandas as pd
import pytest

from grawler_ray.config import CrawlConfig
from grawler_ray.sources.corpus import generate_corpus, generate_robots_cache, seed_urls

CORPUS = "/tmp/gr_resume_corpus"
ROBOTS = "/tmp/gr_resume_corpus/robots_cache.parquet"
OUT_FULL = "/tmp/gr_resume_full"
OUT_RES = "/tmp/gr_resume_resumed"


@pytest.fixture(scope="module")
def setup(ray_session):
    import os

    if not os.path.isdir(f"{CORPUS}/bucket=0"):
        generate_corpus(CORPUS, n_hosts=4, pages_per_host=8, seed=11, num_buckets=8)
        generate_robots_cache(ROBOTS, 11, 4, CrawlConfig().now_us)
    return CORPUS


def _cfg(out_dir, max_rounds):
    return CrawlConfig(
        per_host_quota=3, max_rounds=max_rounds, num_fetch_buckets=8,
        seen_shards=4, out_dir=out_dir,
    )


def test_resume_equals_uninterrupted(setup):
    from grawler_ray.pipelines.crawl import read_documents, read_words, run_crawl

    seeds = seed_urls(4, 2)
    # uninterrupted reference run
    shutil.rmtree(OUT_FULL, ignore_errors=True)
    run_crawl(CORPUS, seeds, _cfg(OUT_FULL, 7), robots_cache_path=ROBOTS)
    full_docs = read_documents(OUT_FULL).to_pandas().sort_values("url").reset_index(drop=True)
    full_words = (
        read_words(OUT_FULL).to_pandas().sort_values(["parent_url", "word"]).reset_index(drop=True)
    )

    # interrupted: stop after 3 rounds, then resume to completion
    shutil.rmtree(OUT_RES, ignore_errors=True)
    s1 = run_crawl(CORPUS, seeds, _cfg(OUT_RES, 3), robots_cache_path=ROBOTS)
    assert s1["rounds"] == 3
    s2 = run_crawl(CORPUS, seeds, _cfg(OUT_RES, 7), robots_cache_path=ROBOTS, resume=True)
    assert s2.get("resumed_from_round") == 2
    assert s2["rounds"] >= 3

    res_docs = read_documents(OUT_RES).to_pandas().sort_values("url").reset_index(drop=True)
    res_words = (
        read_words(OUT_RES).to_pandas().sort_values(["parent_url", "word"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full_docs, res_docs)
    pd.testing.assert_frame_equal(full_words, res_words)


def test_resume_noop_when_finished(setup):
    from grawler_ray.pipelines.crawl import run_crawl

    seeds = seed_urls(4, 2)
    s3 = run_crawl(CORPUS, seeds, _cfg(OUT_RES, 7), robots_cache_path=ROBOTS, resume=True)
    # crawl already drained: resume finds empty frontier and adds no rounds
    assert s3["fetched"] >= 0
