"""Export sinks (parquet/JSONL/CSV roundtrip) and deterministic sampling."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_items(
        [
            {"doc_id": i, "lang": ["en", "de", "fr"][i % 3], "text": f'doc {i}, "quoted" text'}
            for i in range(200)
        ]
    )


def test_sample_fraction_deterministic(docs_ds):
    from grawler_ray.functions.sampling import sample_fraction

    a = sorted(sample_fraction(docs_ds, permille=100).to_pandas().doc_id)
    b = sorted(sample_fraction(docs_ds, permille=100).to_pandas().doc_id)
    assert a == b and 0 < len(a) < 200
    # monotone: a larger rate is a superset
    big = set(sample_fraction(docs_ds, permille=500).to_pandas().doc_id)
    assert set(a) <= big


def test_stratified_sample_rates(docs_ds):
    from grawler_ray.functions.sampling import stratified_sample

    out = stratified_sample(docs_ds, permille={"en": 1000, "de": 0}).to_pandas()
    assert set(out.lang) == {"en"}  # de rate 0, fr missing -> dropped
    assert len(out) == 67  # every en row kept


def test_split_train_holdout_partition(docs_ds):
    from grawler_ray.functions.sampling import split_train_holdout

    out = split_train_holdout(docs_ds, holdout_permille=200).to_pandas()
    assert len(out) == 200
    assert set(out.split) == {"train", "holdout"}
    # re-tagging is identical (leak-free reproducibility)
    again = split_train_holdout(docs_ds, holdout_permille=200).to_pandas()
    assert dict(zip(out.doc_id, out.split)) == dict(zip(again.doc_id, again.split))


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_export_roundtrip(docs_ds, fmt, tmp_path):
    from grawler_ray.sources.export import export_dataset, read_export

    dest = str(tmp_path / fmt)
    export_dataset(docs_ds, dest, format=fmt)
    back = read_export(dest, format=fmt).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = docs_ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(back) == len(orig)
    assert (back.doc_id.to_numpy() == orig.doc_id.to_numpy()).all()
    assert list(back.text) == list(orig.text)  # quotes/commas survive CSV


def test_export_documents_from_crawl(ray_session, tmp_path):
    import os

    from grawler_ray.config import CrawlConfig
    from grawler_ray.pipelines.crawl import read_documents, run_crawl
    from grawler_ray.sources.corpus import generate_corpus, generate_robots_cache, seed_urls
    from grawler_ray.sources.export import export_documents, read_export

    corp = "/tmp/gr_export_corpus"
    if not os.path.isdir(f"{corp}/bucket=0"):
        generate_corpus(corp, n_hosts=2, pages_per_host=5, seed=3, num_buckets=4)
        generate_robots_cache(f"{corp}/robots.parquet", 3, 2, CrawlConfig().now_us)
    out = str(tmp_path / "out")
    cfg = CrawlConfig(per_host_quota=3, max_rounds=3, num_fetch_buckets=4, seen_shards=2, out_dir=out)
    run_crawl(corp, seed_urls(2, 2), cfg, robots_cache_path=f"{corp}/robots.parquet")
    dest = str(tmp_path / "docs_jsonl")
    export_documents(out, dest, format="json")
    back = read_export(dest, format="json").to_pandas()
    docs = read_documents(out).to_pandas()
    assert sorted(back.url) == sorted(docs.url) and len(docs) > 0


def test_cap_per_group_rank_and_cap(ray_session):
    import ray.data

    from grawler_ray.functions.sampling import cap_per_group

    rows = [
        {"doc_id": i, "source": f"src{i % 3}"} for i in range(30)
    ]
    out = cap_per_group(
        ray.data.from_items(rows), group_col="source", order_col="doc_id", cap=4
    ).to_pandas()
    # 3 groups x cap 4
    assert len(out) == 12
    for src, grp in out.groupby("source"):
        got = grp.sort_values("rank")
        # ranks are 1..4 over the 4 smallest doc_ids of the group
        assert list(got["rank"]) == [1, 2, 3, 4]
        want_ids = sorted(d for d in range(30) if f"src{d % 3}" == src)[:4]
        assert list(got["doc_id"]) == want_ids


def test_mixture_sample_rates_and_caps(ray_session):
    """src 'a' is scarce (rate caps at 1000 -> all kept); 'b' is abundant
    (proportional rate); 'c' is outside the target (dropped entirely)."""
    import ray.data

    from grawler_ray.functions.sampling import mixture_sample

    rows = (
        [{"doc_id": i, "source": "a"} for i in range(10)]
        + [{"doc_id": 100 + i, "source": "b"} for i in range(500)]
        + [{"doc_id": 1000 + i, "source": "c"} for i in range(50)]
    )
    ds = ray.data.from_items(rows).repartition(4)
    out = mixture_sample(
        ds, target_permille={"a": 500, "b": 500}, budget_rows=100
    ).to_pandas()
    assert set(out.source) <= {"a", "b"}
    # a: rate = min(1000, 100*500//10 = 5000) = 1000 -> all 10 kept
    assert (out.source == "a").sum() == 10
    # b: rate = 100*500//500 = 100 permille of 500 rows ~ 50 +- hash noise
    nb = (out.source == "b").sum()
    assert 25 <= nb <= 85
    # deterministic across runs/partitionings
    out2 = mixture_sample(
        ds.repartition(7), target_permille={"a": 500, "b": 500}, budget_rows=100
    ).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_group_sample_k_uniform(ray_session):
    """Hash-ranked per-group sample: deterministic across partitionings,
    exactly k per group when the group has >= k rows, matches the serial
    (knuth_hash, id) rank rule."""
    import numpy as np
    import ray.data

    from grawler_ray.functions.sampling import group_sample_k

    rows = [{"doc_id": i, "source": f"s{i % 3}"} for i in range(90)]
    ds = ray.data.from_items(rows).repartition(5)
    out = group_sample_k(ds, k=4).to_pandas()
    assert (out.groupby("source").size() == 4).all()
    # serial oracle: rank by ((id * K) % 2^32, id) within each source
    ids = np.arange(90, dtype=np.uint64)
    hkey = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
    expect = set()
    for s in range(3):
        members = [(int(hkey[i]), i) for i in range(90) if i % 3 == s]
        expect |= {i for _h, i in sorted(members)[:4]}
    assert set(out.doc_id) == expect
    out2 = group_sample_k(ds.repartition(11), k=4).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_weighted_sample_k_vs_serial_and_duckdb(ray_session):
    import duckdb
    import numpy as np

    from grawler_ray.functions.sampling import weighted_sample_k

    sf = "/root/testdata/sf0.001"
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    got = (
        weighted_sample_k(ds, id_col="doc_id", weight_col="n_chars", k=20)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            f"""SELECT doc_id, n_chars AS w FROM '{sf}/documents.parquet'
            ORDER BY CAST(((doc_id::HUGEINT*2654435761) % 4294967296) + 1
                          AS DOUBLE) / n_chars, doc_id LIMIT 20"""
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["w"].tolist() == exp["w"].tolist()
    # serial numpy oracle: same k-smallest u/w set
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    w = t.column("n_chars").to_numpy().astype(np.int64)
    key = (((ids.astype(np.uint64) * 2654435761) % (1 << 32)) + 1).astype(
        np.float64
    ) / w
    order = np.lexsort((ids, key))[:20]
    assert sorted(ids[order].tolist()) == got["doc_id"].tolist()


def test_weighted_sample_k_weight_bias(ray_session):
    """Heavier rows win more often: with weights 1 vs 1000 over many ids,
    nearly all winners come from the heavy stratum."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.sampling import weighted_sample_k

    n = 4000
    ids = list(range(n))
    w = [1000 if i % 2 == 0 else 1 for i in ids]
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "n_chars": w}))
    got = weighted_sample_k(ds, k=100).to_pandas()
    heavy = (got["w"] == 1000).sum()
    assert heavy >= 95


def test_weighted_sample_k_nonpositive_weight_raises(ray_session):
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.sampling import weighted_sample_k

    ds = ray.data.from_arrow(pa.table({"doc_id": [1, 2], "n_chars": [5, 0]}))
    with pytest.raises(Exception, match="weights must be positive"):
        weighted_sample_k(ds, k=2).take_all()


def test_source_budget_hamilton(ray_session):
    """Largest-remainder apportionment: sum always equals the budget and
    leftover slots go by (remainder DESC, group ASC)."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.sampling import source_budget

    # counts 3/3/4 with budget 10: quotas 3.0/3.0/4.0 exact -> no leftover
    # counts 1/1/1 with budget 10: base 3 each, leftover 1 -> 'a' wins tie
    t = pa.table(
        {"source": ["a"] * 1 + ["b"] * 1 + ["c"] * 1}
    )
    out = (
        source_budget(ray.data.from_arrow(t), budget=10)
        .to_pandas()
        .set_index("source")["budget"]
    )
    assert out.sum() == 10
    assert out.tolist() == [4, 3, 3]

    t2 = pa.table({"source": ["a"] * 2 + ["b"] * 5 + ["c"] * 3})
    out2 = (
        source_budget(ray.data.from_arrow(t2), budget=7)
        .to_pandas()
        .set_index("source")["budget"]
    )
    # quotas 1.4 / 3.5 / 2.1 -> base 1/3/2, leftover 1 -> largest rem = b
    assert out2.sum() == 7
    assert out2.tolist() == [1, 4, 2]


def test_shuffle_shards_serial_oracle_and_partition_invariance(ray_session):
    """shuffle_shards must equal the serial numpy recurrence (shard = Knuth
    bucket % S, pos = rank of (hash, id) within shard) and be invariant to
    the input partitioning; positions are a 0..n_s-1 permutation per shard."""
    import ray.data

    from grawler_ray.functions.sampling import shuffle_shards

    ids = np.arange(157, dtype=np.int64)
    hk = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    shard = (hk % np.uint64(8)).astype(np.int64)
    expect = {}
    for s in np.unique(shard):
        m = shard == s
        order = np.lexsort((ids[m], hk[m]))
        for pos, i in enumerate(ids[m][order]):
            expect[int(i)] = (int(s), pos)

    rows = [{"doc_id": int(i), "text": f"t{i}"} for i in ids]
    for parts in (1, 7):
        ds = ray.data.from_items(rows).repartition(parts)
        got = shuffle_shards(ds, num_shards=8).to_pandas()
        assert len(got) == len(ids)
        assert {
            int(r.doc_id): (int(r.shard), int(r.pos)) for r in got.itertuples()
        } == expect
    # per-shard positions are exactly 0..n_s-1
    for s, grp in got.groupby("shard"):
        assert sorted(grp.pos) == list(range(len(grp)))


def test_shuffle_shards_rejects_negative_ids(ray_session):
    import ray.data

    from grawler_ray.functions.sampling import shuffle_shards

    ds = ray.data.from_items([{"doc_id": -1}])
    with pytest.raises(Exception, match="non-negative"):
        shuffle_shards(ds).to_pandas()


def test_normalized_dedup_nfc_and_whitespace_planted(ray_session):
    """Docs that differ only by NFC composition or ASCII-whitespace runs
    must land in one group (first-wins min id, correct count); genuinely
    different docs must not; NBSP is NOT ASCII whitespace and survives."""
    import ray.data

    from grawler_ray.functions.dedup import normalized_dedup

    rows = [
        {"doc_id": 0, "text": "café au lait"},        # composed é
        {"doc_id": 1, "text": "café au lait"},       # decomposed e+́
        {"doc_id": 2, "text": "  café\t\tau\nlait "}, # ws runs + trim
        {"doc_id": 3, "text": "café au lait!"},        # different
        {"doc_id": 4, "text": "café au lait"},    # NBSP: distinct
        {"doc_id": 5, "text": ""},
        {"doc_id": 6, "text": "   "},                        # trims to ""
    ]
    got = normalized_dedup(ray.data.from_items(rows)).to_pandas()
    by_keep = {int(r.keep_doc_id): int(r.n_dups) for r in got.itertuples()}
    assert by_keep == {0: 3, 3: 1, 4: 1, 5: 2}
    assert len(got) == got.norm_md5.nunique()


def test_token_budget_cap_vs_serial(ray_session):
    """Grouped running-weight cap must equal the serial window rule,
    including a first row bigger than the whole budget (dropped) and a
    zero-weight row (kept for free)."""
    import pandas as pd
    import ray.data

    from grawler_ray.functions.sampling import token_budget_cap

    rows = [
        {"doc_id": 0, "source": "a", "n_chars": 40},
        {"doc_id": 1, "source": "a", "n_chars": 50},   # cum 90 <= 100
        {"doc_id": 2, "source": "a", "n_chars": 11},   # cum 101 > 100
        {"doc_id": 3, "source": "a", "n_chars": 5},    # cum 106 > 100
        {"doc_id": 4, "source": "b", "n_chars": 500},  # first row too big
        {"doc_id": 5, "source": "b", "n_chars": 1},    # cum 501: dropped too
        {"doc_id": 6, "source": "c", "n_chars": 0},    # zero weight kept
        {"doc_id": 7, "source": "c", "n_chars": 100},  # cum 100 == budget
    ]
    ds = ray.data.from_items(rows).repartition(3)
    got = (
        token_budget_cap(ds, budget=100)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == [0, 1, 6, 7]
    assert got.cum.tolist() == [40, 90, 0, 100]
    # serial window equality on the full fixture
    df = pd.DataFrame(rows)
    df["cum"] = df.sort_values("doc_id").groupby("source")["n_chars"].cumsum()
    exp = df[df.cum <= 100].sort_values("doc_id")
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.cum.tolist() == exp.cum.tolist()
