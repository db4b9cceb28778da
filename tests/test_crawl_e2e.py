"""End-to-end conformance: Ray pipeline vs serial reference-semantics oracle.

Golden invariants (BASELINE.md): byte-identical extracted text per url,
equal URL-seen set, equal crawl order (full trace equality — stronger than
the fetched-subsequence requirement) under the same seed list + politeness
budget.
"""

import glob
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grawler_ray.config import CrawlConfig
from grawler_ray.oracle import corpus_table_to_dict, run_oracle
from grawler_ray.sources.corpus import (
    generate_corpus,
    generate_robots_cache,
    seed_urls,
)

N_HOSTS, PAGES, SEED = 4, 10, 42
CORPUS = "/tmp/gr_test_corpus"
ROBOTS = "/tmp/gr_test_corpus_robots/robots.parquet"
OUT = "/tmp/gr_test_crawl_out"


@pytest.fixture(scope="module")
def cfg():
    return CrawlConfig(
        per_host_quota=3,
        max_rounds=8,
        num_fetch_buckets=8,
        seen_shards=4,
        out_dir=OUT,
    )


@pytest.fixture(scope="module")
def corpus_fixture(cfg):
    shutil.rmtree(CORPUS, ignore_errors=True)
    generate_corpus(CORPUS, n_hosts=N_HOSTS, pages_per_host=PAGES, seed=SEED, num_buckets=8)
    generate_robots_cache(ROBOTS, SEED, N_HOSTS, cfg.now_us)
    full = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{CORPUS}/bucket=*/part.parquet"))]
    )
    rc = pq.read_table(ROBOTS)
    robots_cache = {
        h: (b, t)
        for h, b, t in zip(
            rc["host"].to_pylist(),
            rc["robots"].to_pylist(),
            rc["ts"].cast(pa.int64()).to_pylist(),
        )
    }
    return full, robots_cache


@pytest.fixture(scope="module")
def oracle_result(cfg, corpus_fixture):
    full, robots_cache = corpus_fixture
    return run_oracle(corpus_table_to_dict(full), seed_urls(N_HOSTS, 3), cfg, robots_cache)


@pytest.fixture(scope="module")
def pipeline_out(ray_session, cfg, corpus_fixture):
    from grawler_ray.pipelines.crawl import run_crawl

    shutil.rmtree(OUT, ignore_errors=True)
    stats = run_crawl(CORPUS, seed_urls(N_HOSTS, 3), cfg, robots_cache_path=ROBOTS)
    return stats


def test_corpus_deterministic():
    import pyarrow.parquet as pq

    generate_corpus("/tmp/gr_det_a", n_hosts=2, pages_per_host=4, seed=7, num_buckets=4)
    generate_corpus("/tmp/gr_det_b", n_hosts=2, pages_per_host=4, seed=7, num_buckets=4)
    for f in glob.glob("/tmp/gr_det_a/bucket=*/part.parquet"):
        a = pq.read_table(f)
        b = pq.read_table(f.replace("gr_det_a", "gr_det_b"))
        assert a.equals(b)


def test_oracle_covers_every_drop_action(oracle_result):
    actions = {t["action"] for t in oracle_result.trace}
    assert {"fetched", "dup-drop", "deferred", "fetch-miss", "robots-drop"} <= actions


def test_documents_byte_identical(ray_session, cfg, pipeline_out, oracle_result):
    from grawler_ray.pipelines.crawl import read_documents

    docs = read_documents(OUT).to_pandas().sort_values("url").reset_index(drop=True)
    odocs = pd.DataFrame(oracle_result.documents).sort_values("url").reset_index(drop=True)
    assert list(docs.columns) == list(odocs.columns)
    assert len(docs) == len(odocs) > 0
    for col in docs.columns:
        assert (docs[col].values == odocs[col].astype(docs[col].dtype).values).all(), col


def test_extracted_text_matches_corpus_golden_column(
    ray_session, cfg, pipeline_out, corpus_fixture
):
    # byte-identical per-url extracted text vs the corpus' golden text column
    from grawler_ray.pipelines.crawl import read_documents

    full, _ = corpus_fixture
    golden = dict(zip(full["url"].to_pylist(), full["text"].to_pylist()))
    docs = read_documents(OUT).to_pandas()
    assert len(docs) > 0
    for url, content in zip(docs.url, docs.content):
        assert content == golden[url], url


def test_words_equal(ray_session, cfg, pipeline_out, oracle_result):
    from grawler_ray.pipelines.crawl import read_words

    words = (
        read_words(OUT).to_pandas().sort_values(["parent_url", "word"]).reset_index(drop=True)
    )
    owords = (
        pd.DataFrame(oracle_result.words)
        .sort_values(["parent_url", "word"])
        .reset_index(drop=True)
    )
    assert words.equals(owords.astype(words.dtypes.to_dict()))


def test_seen_set_equal(ray_session, cfg, pipeline_out, oracle_result):
    from grawler_ray.pipelines.crawl import read_documents

    docs = read_documents(OUT).to_pandas()
    assert set(docs.url) == oracle_result.seen


def test_full_trace_equal(ray_session, cfg, pipeline_out, oracle_result):
    # stronger than required: EVERY (round, seq, url, parent, action) matches
    from grawler_ray.pipelines.crawl import read_trace

    trace = read_trace(OUT).to_pandas().sort_values(["round", "seq"]).reset_index(drop=True)
    otrace = (
        pd.DataFrame(oracle_result.trace).sort_values(["round", "seq"]).reset_index(drop=True)
    )
    assert len(trace) == len(otrace)
    cols = ["round", "seq", "url", "parent_url", "action"]
    t = trace[cols].astype({"round": int, "seq": int})
    o = otrace[cols].astype({"round": int, "seq": int})
    assert t.equals(o)


def test_crawl_order_fetched_subsequence(ray_session, cfg, pipeline_out, oracle_result):
    from grawler_ray.pipelines.crawl import read_trace

    trace = read_trace(OUT).to_pandas().sort_values(["round", "seq"])
    fetched = trace[trace.action == "fetched"].url.tolist()
    ofetched = [t["url"] for t in sorted(oracle_result.trace, key=lambda t: (t["round"], t["seq"])) if t["action"] == "fetched"]
    assert fetched == ofetched


def test_robots_snapshot_written(ray_session, cfg, pipeline_out):
    import os

    assert os.path.exists(f"{OUT}/robots_final.parquet")
    t = pq.read_table(f"{OUT}/robots_final.parquet")
    assert t.num_rows > 0
    assert t.column_names == ["host", "robots", "ts"]


def test_host_graph_matches_oracle_trace(ray_session, cfg, pipeline_out, oracle_result):
    """host_graph = (src_host, dst_host, n_links) over every traced row
    with a parent; must equal the same aggregation of the oracle trace
    (which test_trace_equal pins row-for-row)."""
    from grawler_ray.pipelines.crawl import host_graph
    from grawler_ray.urlops import extract_url_components

    got = (
        host_graph(OUT)
        .to_pandas()
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    agg = {}
    for t in oracle_result.trace:
        if not t["parent_url"]:
            continue
        key = (
            extract_url_components(t["parent_url"])[1],
            extract_url_components(t["url"])[1],
        )
        agg[key] = agg.get(key, 0) + 1
    want = (
        pd.DataFrame(
            [
                {"src_host": s, "dst_host": d, "n_links": n}
                for (s, d), n in agg.items()
            ]
        )
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    assert got.astype({"n_links": "int64"}).equals(want)


def test_host_components_matches_serial_union_find(
    ray_session, cfg, pipeline_out, oracle_result
):
    from grawler_ray.pipelines.crawl import host_components
    from grawler_ray.urlops import extract_url_components, xxhash64

    got = host_components(OUT).to_pandas().sort_values("host").reset_index(drop=True)

    # serial union-find over the oracle trace's host edges
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    hosts = set()
    for t in oracle_result.trace:
        if not t["parent_url"]:
            continue
        s = extract_url_components(t["parent_url"])[1]
        d = extract_url_components(t["url"])[1]
        hosts |= {s, d}
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rd] = rs
    comp_of = {}
    for h in hosts:
        root = find(h)
        comp_of.setdefault(root, []).append(h)
    want = {}
    for members in comp_of.values():
        label = min(xxhash64(m) >> 1 for m in members)
        for m in members:
            want[m] = label
    assert len(got) == len(want) > 0
    assert dict(zip(got.host, got.component)) == want


def test_host_rank_matches_serial_recurrence(
    ray_session, cfg, pipeline_out, oracle_result
):
    """host_rank must equal a serial replay of the pinned integer PageRank
    recurrence (graph.pagerank semantics: symmetrized distinct edges,
    floor-division rank flow) over the oracle trace's host graph."""
    from grawler_ray.pipelines.crawl import host_rank
    from grawler_ray.urlops import extract_url_components, xxhash64

    got = host_rank(OUT, iters=5).to_pandas()
    got_map = dict(zip(got.host, got["rank"]))

    edges = set()
    hosts = set()
    for t in oracle_result.trace:
        if not t["parent_url"]:
            continue
        s = extract_url_components(t["parent_url"])[1]
        d = extract_url_components(t["url"])[1]
        hosts |= {s, d}
        edges.add((s, d))
    hid = {h: xxhash64(h) >> 1 for h in hosts}
    sym = [(hid[a], hid[b]) for a, b in edges] + [(hid[b], hid[a]) for a, b in edges]
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    n = len(hosts)
    scale, d_pct = 10**9, 85
    base = scale // n
    tele = ((100 - d_pct) * base) // 100
    r = {hid[h]: base for h in hosts}
    for _ in range(5):
        inflow = {v: 0 for v in r}
        for s, t_ in sym:
            inflow[t_] += r[s] // deg[s]
        r = {v: tele + (d_pct * inflow[v]) // 100 for v in r}
    want = {h: r[hid[h]] for h in hosts}
    assert len(got_map) == len(want) > 0
    assert got_map == want
