"""Cross-run upsert semantics: read_documents/read_words(dedup="last") over
a sequence of runs behaves like the reference's couchbase Upsert keyed on
url (db.go:64,73) — the newest run's row/word-list wins per url."""

import shutil

import pytest

from grawler_ray.config import CrawlConfig
from grawler_ray.sources.corpus import generate_corpus, generate_robots_cache, seed_urls

CORP_A = "/tmp/gr_lw_corpus_a"
CORP_B = "/tmp/gr_lw_corpus_b"
OUT_A = "/tmp/gr_lw_out_a"
OUT_B = "/tmp/gr_lw_out_b"


@pytest.fixture(scope="module")
def runs(ray_session):
    from grawler_ray.pipelines.crawl import run_crawl

    import os

    # same url space (hosts x pages), different seeds => different content
    for corp, seed in ((CORP_A, 21), (CORP_B, 22)):
        if not os.path.isdir(f"{corp}/bucket=0"):
            generate_corpus(corp, n_hosts=3, pages_per_host=6, seed=seed, num_buckets=4)
            generate_robots_cache(f"{corp}/robots.parquet", seed, 3, CrawlConfig().now_us)
    cfg_kw = dict(per_host_quota=3, max_rounds=4, num_fetch_buckets=4, seen_shards=2)
    shutil.rmtree(OUT_A, ignore_errors=True)
    shutil.rmtree(OUT_B, ignore_errors=True)
    run_crawl(CORP_A, seed_urls(3, 2), CrawlConfig(out_dir=OUT_A, **cfg_kw),
              robots_cache_path=f"{CORP_A}/robots.parquet")
    run_crawl(CORP_B, seed_urls(3, 2), CrawlConfig(out_dir=OUT_B, **cfg_kw),
              robots_cache_path=f"{CORP_B}/robots.parquet")
    return OUT_A, OUT_B


def test_last_wins_documents(runs):
    from grawler_ray.pipelines.crawl import read_documents

    a, b = runs
    da = read_documents(a).to_pandas().set_index("url")
    db = read_documents(b).to_pandas().set_index("url")
    merged = read_documents([a, b], dedup="last").to_pandas()
    assert merged.url.is_unique
    assert set(merged.url) == set(da.index) | set(db.index)
    m = merged.set_index("url")
    for url in m.index:
        want = db if url in db.index else da  # run B (later) wins
        assert m.at[url, "content"] == want.at[url, "content"], url


def test_last_wins_words(runs):
    from grawler_ray.pipelines.crawl import read_documents, read_words

    a, b = runs
    db = read_documents(b).to_pandas()
    merged = read_words([a, b], dedup="last").to_pandas()
    # one word-list per url: (url, word) unique across the merged view
    assert not merged.duplicated(["parent_url", "word"]).any()
    # for a url present in run B, the word multiset is exactly run B's
    wb = read_words(b).to_pandas()
    url = db.url.iloc[0]
    got = merged[merged.parent_url == url].sort_values("word").reset_index(drop=True)
    want = wb[wb.parent_url == url].sort_values("word").reset_index(drop=True)
    assert got.equals(want)


def test_append_mode_multi_dir(runs):
    from grawler_ray.pipelines.crawl import read_documents

    a, b = runs
    na = read_documents(a).count()
    nb = read_documents(b).count()
    assert read_documents([a, b]).count() == na + nb


def test_unknown_dedup_rejected(runs):
    from grawler_ray.pipelines.crawl import read_documents

    with pytest.raises(ValueError):
        read_documents(runs[0], dedup="first")


def test_compact_runs_roundtrip(ray_session, runs):
    """Compacted output must equal the last-wins read of the run sequence,
    and be bucket-partitioned on disk."""
    import glob

    import ray.data

    from grawler_ray.pipelines.crawl import compact_runs, read_documents

    run_a, run_b = runs
    dest = "/tmp/gr_compact_dest"
    info = compact_runs([run_a, run_b], dest, num_buckets=8)
    assert info["rows"] > 0
    assert len(glob.glob(f"{dest}/bucket=*")) >= 1
    got = (
        ray.data.read_parquet(dest)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        read_documents([run_a, run_b], dedup="last")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in want.columns:
        assert (got[col].values == want[col].values).all(), col


def test_compact_runs_refuses_unrelated_dest(ray_session, runs):
    """compact_runs overwrites dest — but must refuse when dest exists and
    is not a prior compaction output (only bucket=*/ dirs), instead of
    recursively deleting an unrelated directory (ADVICE r3)."""
    import os

    import pytest

    from grawler_ray.pipelines.crawl import compact_runs

    run_a, run_b = runs
    dest = "/tmp/gr_compact_guard"
    os.makedirs(dest, exist_ok=True)
    with open(os.path.join(dest, "precious.txt"), "w") as f:
        f.write("do not delete")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        compact_runs([run_a, run_b], dest, num_buckets=4)
    assert os.path.exists(os.path.join(dest, "precious.txt"))
    # a prior compaction output (bucket=* dirs only) IS overwritable
    os.remove(os.path.join(dest, "precious.txt"))
    os.makedirs(os.path.join(dest, "bucket=0"), exist_ok=True)
    info = compact_runs([run_a, run_b], dest, num_buckets=4)
    assert info["rows"] > 0
