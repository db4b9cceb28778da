"""Round-4 sixth batch: semi-join, true-NTILE per-group buckets, and DSIR
importance weights — planted fixtures, pandas/DuckDB cross-checks, and an
independent serial-numpy oracle for the DSIR log-ratio semantics."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hash_semi_join_membership(ray_session):
    """left WHERE key IN right: kept at most once regardless of right-side
    multiplicity; complement of the anti-join on the same input."""
    import ray.data

    from grawler_ray.functions.joins import hash_anti_join, hash_semi_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 40, 300).astype(np.int64),
            "payload": [f"p{i}" for i in range(300)],
        }
    )
    # right keys with heavy multiplicity (each key ~5x) and half disjoint
    right = pd.DataFrame(
        {"rk": np.repeat(rng.randint(20, 60, 30).astype(np.int64), 5)}
    )
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(3)
    semi = hash_semi_join(lds, rds, on_left="k", on_right="rk").to_pandas()
    anti = hash_anti_join(lds, rds, on_left="k", on_right="rk").to_pandas()

    exp = left[left.k.isin(set(right.rk))]
    assert sorted(semi.payload) == sorted(exp.payload)
    # multiplicity on the right never duplicates left rows
    assert semi.payload.is_unique
    # semi + anti partition the left side exactly
    assert sorted(list(semi.payload) + list(anti.payload)) == sorted(left.payload)


def test_group_ntile_sql_semantics(ray_session):
    """NTILE gives the FIRST cnt%n buckets the extra rows (10 rows, 4
    tiles -> sizes 3,3,2,2 — NOT the equal-width 3,2,3,2); checked
    directly against DuckDB's NTILE window on a planted frame."""
    import ray.data

    from grawler_ray.functions.sampling import group_ntile

    df = pd.DataFrame(
        {
            "g": np.int64(1),
            "id": np.arange(10, dtype=np.int64),
            "v": np.arange(10, 0, -1, dtype=np.int64),  # strictly ordered
        }
    )
    out = (
        group_ntile(ray.data.from_pandas(df).repartition(3), "g", "id", "v", n_tiles=4)
        .to_pandas()
        .sort_values("id")
    )
    assert list(out.tile) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]

    exp = duckdb.sql(
        """SELECT g, id, v,
                  CAST(NTILE(4) OVER (PARTITION BY g ORDER BY v DESC, id) AS BIGINT) t
           FROM df ORDER BY id"""
    ).df()
    assert list(out.tile) == list(exp.t)


def test_group_ntile_random_vs_duckdb(ray_session):
    """Random multi-group frame with value ties == DuckDB's NTILE(3)
    window row-for-row (string group keys, sparse empty partitions)."""
    import ray.data

    from grawler_ray.functions.sampling import group_ntile

    rng = np.random.RandomState(17)
    n = 400
    df = pd.DataFrame(
        {
            "g": [f"lang{x}" for x in rng.randint(0, 7, n)],
            "id": np.arange(n, dtype=np.int64),
            "v": rng.randint(0, 12, n).astype(np.int64),  # ties
        }
    )
    out = (
        group_ntile(ray.data.from_pandas(df).repartition(5), "g", "id", "v", n_tiles=3)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """SELECT g, id, v,
                  CAST(NTILE(3) OVER (PARTITION BY g ORDER BY v DESC, id) AS BIGINT) tile
           FROM df ORDER BY id"""
    ).df()
    pd.testing.assert_frame_equal(
        out[["g", "id", "v", "tile"]], exp[["g", "id", "v", "tile"]]
    )


def _serial_dsir(texts, is_target, num_buckets, scale, alpha):
    """Independent serial reimplementation of the pinned DSIR semantics:
    hashed-unigram (xxhash64 % B) counts with add-alpha smoothing, integer
    micro-unit log-ratio table, per-doc occurrence sums."""
    import re

    from grawler_ray.urlops import xxhash64

    word = re.compile(r"\b\w+\b")

    def feats(text):
        return [xxhash64(w) % num_buckets for w in word.findall((text or "").lower())]

    t_cnt = np.zeros(num_buckets, np.int64)
    r_cnt = np.zeros(num_buckets, np.int64)
    per_doc = []
    for text, is_t in zip(texts, is_target):
        f = feats(text)
        per_doc.append(f)
        for b in f:
            r_cnt[b] += 1
            if is_t:
                t_cnt[b] += 1
    log_pt = np.log((t_cnt + alpha) / (t_cnt.sum() + alpha * num_buckets))
    log_pr = np.log((r_cnt + alpha) / (r_cnt.sum() + alpha * num_buckets))
    lam = np.floor(scale * (log_pt - log_pr)).astype(np.int64)
    weights = [int(sum(int(lam[b]) for b in f)) for f in per_doc]
    n_tok = [len(f) for f in per_doc]
    return weights, n_tok


def test_dsir_weights_vs_serial_oracle(ray_session):
    """Distributed DSIR == the serial oracle, exactly (integer lambda
    sums are order-independent), on sf0.001 documents with lang='en' as
    the target set."""
    import pyarrow.compute as pc
    import ray.data

    from grawler_ray.functions.quality import dsir_weights

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    target = docs.map_batches(
        lambda t: t.filter(pc.equal(t.column("lang"), "en")),
        batch_format="pyarrow",
    )
    out = (
        dsir_weights(docs, target, num_buckets=4096)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    df = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    weights, n_tok = _serial_dsir(
        df.text, (df.lang == "en").to_numpy(), 4096, 1_000_000, 1.0
    )
    assert list(out.doc_id) == list(df.doc_id)
    assert list(out.weight) == weights
    assert list(out.n_tokens) == n_tok
    # target-like docs should score higher on average than the rest
    m = df.lang.to_numpy() == "en"
    w = np.asarray(weights, np.float64) / np.maximum(np.asarray(n_tok), 1)
    assert w[m].mean() > w[~m].mean()


def test_dsir_weights_empty_and_tokenless_docs(ray_session):
    """Docs with no tokens (empty/punct-only) get weight 0 / n_tokens 0;
    schema stays int64 with no nulls."""
    import ray.data

    from grawler_ray.functions.quality import dsir_weights

    rows = [
        {"doc_id": 1, "text": "the quick brown fox"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "!!! ..."},
        {"doc_id": 4, "text": "the the the"},
    ]
    ds = ray.data.from_items(rows)
    out = (
        dsir_weights(ds, ds.limit(1), num_buckets=64)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "weight"] == 0
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "weight"] == 0
    assert out.loc[4, "n_tokens"] == 3
    assert out.weight.dtype.kind == "i" and not out.weight.isna().any()


def test_rollup_sum_vs_duckdb(ray_session):
    """One-exchange ROLLUP == SQL GROUP BY ROLLUP row set (finest rows,
    per-k1 subtotals with NULL k2, one grand total) on a random frame."""
    import ray.data

    from grawler_ray.functions.olap import rollup_sum

    rng = np.random.RandomState(23)
    n = 600
    df = pd.DataFrame(
        {
            "s": [f"src{x}" for x in rng.randint(0, 9, n)],
            "l": [f"l{x}" for x in rng.randint(0, 4, n)],
            "v": rng.randint(0, 1000, n).astype(np.int64),
        }
    )
    out = (
        rollup_sum(ray.data.from_pandas(df).repartition(5), "s", "l", "v")
        .to_pandas()
        .sort_values(["s", "l"], na_position="first")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """SELECT s, l, count(*) AS n_rows, CAST(sum(v) AS BIGINT) AS sum_value
           FROM df GROUP BY ROLLUP(s, l)
           ORDER BY s NULLS FIRST, l NULLS FIRST"""
    ).df()
    pd.testing.assert_frame_equal(out, exp)
    # exactly one grand total; its count is n
    grand = out[out.s.isna()]
    assert len(grand) == 1 and grand.n_rows.iloc[0] == n


def test_melt_reshape(ray_session):
    """melt == pandas.melt (same rows, bit-exact float values, no
    shuffle reshape)."""
    import ray.data

    from grawler_ray.functions.olap import melt

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "id": np.arange(50, dtype=np.int64),
            "m1": rng.rand(50),
            "m2": rng.rand(50) * 1000,
        }
    )
    out = (
        melt(ray.data.from_pandas(df).repartition(3), ["id"], ["m1", "m2"])
        .to_pandas()
        .sort_values(["id", "metric"])
        .reset_index(drop=True)
    )
    exp = (
        df.melt(id_vars=["id"], value_vars=["m1", "m2"], var_name="metric",
                value_name="value")
        .sort_values(["id", "metric"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)


def test_cube_vs_duckdb(ray_session):
    """cube=True adds the per-k2 subtotals == SQL GROUP BY CUBE exactly."""
    import ray.data

    from grawler_ray.functions.olap import rollup_sum

    rng = np.random.RandomState(29)
    n = 500
    df = pd.DataFrame(
        {
            "s": [f"src{x}" for x in rng.randint(0, 6, n)],
            "l": [f"l{x}" for x in rng.randint(0, 5, n)],
            "v": rng.randint(0, 100, n).astype(np.int64),
        }
    )
    out = (
        rollup_sum(ray.data.from_pandas(df).repartition(4), "s", "l", "v", cube=True)
        .to_pandas()
        .sort_values(["s", "l"], na_position="first")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """SELECT s, l, count(*) AS n_rows, CAST(sum(v) AS BIGINT) AS sum_value
           FROM df GROUP BY CUBE(s, l)
           ORDER BY s NULLS FIRST, l NULLS FIRST"""
    ).df()
    pd.testing.assert_frame_equal(out, exp)
