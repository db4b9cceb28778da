"""grouped_moments / grouped_corr / zscore_normalize vs DuckDB's exact
HUGEINT formulations, and bpe_train vs a serial Counter BPE oracle."""

import math
import re
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
WORD = re.compile(r"\b\w+\b")


def _read(ray_session, table, cols):
    import ray.data

    return ray.data.read_parquet(f"{SF}/{table}.parquet", columns=cols)


def test_grouped_moments_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import grouped_moments

    got = (
        grouped_moments(
            _read(ray_session, "lineitem", ["l_returnflag", "l_quantity"]),
            "l_returnflag",
            "l_quantity",
            value_scale=100,
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH c AS (SELECT l_returnflag AS g,
                      CAST(floor(l_quantity*100+0.5) AS HUGEINT) AS x
                      FROM '{SF}/lineitem.parquet'),
        a AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS s,
                     SUM(x*x) AS ss FROM c GROUP BY g)
        SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
               CAST(s AS BIGINT) AS sum_scaled,
               CAST((s*1000000)//n AS BIGINT) AS mean_micro,
               CAST((n*ss - s*s)//(n*n) AS BIGINT) AS varp_scaled2
        FROM a ORDER BY g"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_grouped_corr_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import grouped_corr

    got = (
        grouped_corr(
            _read(
                ray_session, "lineitem",
                ["l_returnflag", "l_quantity", "l_discount"],
            ),
            "l_returnflag",
            "l_quantity",
            "l_discount",
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH c AS (SELECT l_returnflag AS g,
                      CAST(floor(l_quantity*100+0.5) AS HUGEINT) AS x,
                      CAST(floor(l_discount*10000+0.5) AS HUGEINT) AS y
                      FROM '{SF}/lineitem.parquet'),
        a AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
                     SUM(y) AS sy, SUM(x*x) AS sxx, SUM(y*y) AS syy,
                     SUM(x*y) AS sxy FROM c GROUP BY g)
        SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
               CAST(FLOOR(1000000.0*(n*sxy - sx*sy)
                    / SQRT(CAST((n*sxx - sx*sx)*(n*syy - sy*sy) AS DOUBLE)))
                    AS BIGINT) AS corr_micro
        FROM a ORDER BY g"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # corr is a correlation: every value in [-1e6, 1e6]
    assert got.corr_micro.abs().max() <= 1_000_000


def test_grouped_corr_zero_variance_null(ray_session):
    import ray.data

    from grawler_ray.functions.stats import grouped_corr

    import pyarrow as pa

    t = pa.table(
        {
            "g": ["a"] * 4 + ["b"] * 4,
            "x": [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0, 5.0],
            "y": [2.0, 4.0, 6.0, 8.0, 1.0, 2.0, 3.0, 4.0],
        }
    )
    got = (
        grouped_corr(ray.data.from_arrow(t), "g", "x", "y",
                     x_scale=1, y_scale=1)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert got.loc[0, "corr_micro"] == 1_000_000  # perfect in group a
    assert math.isnan(got.loc[1, "corr_micro"])  # zero x-variance in b


def test_zscore_normalize_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import zscore_normalize

    got = (
        zscore_normalize(
            _read(
                ray_session, "orders",
                ["o_orderkey", "o_orderpriority", "o_totalprice"],
            ),
            group_col="o_orderpriority",
            id_col="o_orderkey",
            value_col="o_totalprice",
        )
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH c AS (SELECT o_orderkey, o_orderpriority AS g,
                      CAST(floor(o_totalprice+0.5) AS HUGEINT) AS x
                      FROM '{SF}/orders.parquet'),
        a AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS s,
                     SUM(x*x) AS ss FROM c GROUP BY g)
        SELECT c.o_orderkey, c.g AS o_orderpriority,
               CAST(FLOOR(1000000.0*(a.n*c.x - a.s)
                    / SQRT(CAST(a.n*a.ss - a.s*a.s AS DOUBLE))) AS BIGINT)
                    AS z_micro
        FROM c JOIN a USING (g) ORDER BY o_orderkey"""
    ).df()
    assert list(got.o_orderkey) == list(exp.o_orderkey)
    assert list(got.z_micro) == list(exp.z_micro)
    # z-scores are centered: per-group sums are ~0 relative to scale
    assert abs(got.z_micro.sum()) < len(got) * 1_000_000


def test_zscore_guard_raises(ray_session):
    from grawler_ray.functions.stats import zscore_normalize

    with pytest.raises(ValueError, match="repartition_join"):
        zscore_normalize(
            _read(
                ray_session, "orders",
                ["o_orderkey", "o_orderpriority", "o_totalprice"],
            ),
            group_col="o_orderpriority",
            id_col="o_orderkey",
            value_col="o_totalprice",
            max_groups=2,
        )


def _serial_bpe(texts, num_merges, end_marker="</w>"):
    words = Counter()
    for t in texts:
        for w in WORD.findall(t or ""):
            words[w.lower()] += 1
    state = {w: tuple(list(w) + [end_marker]) for w in words}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for w, n in words.items():
            syms = state[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        for w in words:
            syms = state[w]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = tuple(out)
    return merges


def _serial_bpe_state(texts, num_merges, end_marker="</w>"):
    """Same trainer, but returns the final per-word symbol state — an
    INDEPENDENT oracle for bpe_encode: greedy lowest-rank-first encoding
    must reproduce the training segmentation for every in-corpus word."""
    words = Counter()
    for t in texts:
        for w in WORD.findall(t or ""):
            words[w.lower()] += 1
    state = {w: tuple(list(w) + [end_marker]) for w in words}
    for rank in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for w, n in words.items():
            syms = state[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        for w in words:
            syms = state[w]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = tuple(out)
    return state


def test_bpe_train_vs_serial_oracle(ray_session):
    from grawler_ray.functions.stats import bpe_train

    texts = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).df().text.tolist()
    got = (
        bpe_train(_read(ray_session, "documents", ["text"]), num_merges=12)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    exp = _serial_bpe(texts, 12)
    assert [tuple(r) for r in got.itertuples(index=False)] == exp
    # merges are genuinely compositional: later merges may use earlier ones
    assert len(exp) == 12


def test_bpe_train_distributed_equals_driver_path(ray_session):
    from grawler_ray.functions.stats import bpe_train

    docs = _read(None, "documents", ["text"])
    drv = bpe_train(docs, num_merges=8).to_pandas()  # vocab << guard
    dist = bpe_train(docs, num_merges=8, driver_max_vocab=0).to_pandas()
    pd.testing.assert_frame_equal(
        drv.sort_values("rank").reset_index(drop=True),
        dist.sort_values("rank").reset_index(drop=True),
    )


def test_bpe_train_early_stop(ray_session):
    import ray.data
    import pyarrow as pa

    from grawler_ray.functions.stats import bpe_train

    ds = ray.data.from_arrow(pa.table({"text": ["ab ab", "cd"]}))
    got = bpe_train(ds, num_merges=50).to_pandas()
    # 'ab' repeats (a,b)=2 then (ab,</w>)=2; nothing else reaches 2
    assert list(got["merged"])[:1] == ["ab"]
    assert (got.pair_count >= 2).all()
    assert len(got) < 50


def test_grouped_histogram_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import grouped_histogram

    got = (
        grouped_histogram(
            _read(ray_session, "lineitem", ["l_returnflag", "l_quantity"]),
            "l_returnflag",
            "l_quantity",
            bin_width=500,
            value_scale=100,
        )
        .to_pandas()
        .sort_values(["l_returnflag", "bin"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT l_returnflag,
                   CAST(floor(l_quantity*100+0.5) AS BIGINT) // 500 AS bin,
                   count(*)::BIGINT AS cnt
            FROM '{SF}/lineitem.parquet'
            GROUP BY l_returnflag, bin ORDER BY l_returnflag, bin"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # counts cover every input row exactly once
    assert got["cnt"].sum() == duckdb.sql(
        f"SELECT count(*) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]


def test_grouped_histogram_negative_raises(ray_session):
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import grouped_histogram

    ds = ray.data.from_arrow(
        pa.table({"g": ["a", "a"], "v": [1.0, -3.0]})
    )
    with pytest.raises(Exception, match="negative scaled values"):
        grouped_histogram(ds, "g", "v", bin_width=10, value_scale=100).take_all()


def test_grouped_winsorize_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import grouped_winsorize

    got = (
        grouped_winsorize(
            _read(
                ray_session, "orders",
                ["o_orderkey", "o_orderpriority", "o_totalprice"],
            ),
            group_col="o_orderpriority",
            id_col="o_orderkey",
            value_col="o_totalprice",
            value_scale=100,
            lo_pct=5,
            hi_pct=95,
        )
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH c AS (SELECT o_orderkey, o_orderpriority AS g,
                      CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS x
                      FROM '{SF}/orders.parquet'),
        h AS (SELECT g, x, count(*)::BIGINT AS cnt FROM c GROUP BY 1, 2),
        tot AS (SELECT g, sum(cnt)::BIGINT AS nt FROM h GROUP BY 1),
        cum AS (SELECT h.g, h.x,
                       sum(h.cnt) OVER (PARTITION BY h.g ORDER BY h.x) AS cn,
                       t.nt
                FROM h JOIN tot t USING (g)),
        q AS (SELECT g,
                     min(CASE WHEN cn >= (nt*5+99)//100 THEN x END)::BIGINT AS lo,
                     min(CASE WHEN cn >= (nt*95+99)//100 THEN x END)::BIGINT AS hi
              FROM cum GROUP BY g)
        SELECT c.o_orderkey, c.g AS o_orderpriority,
               CASE WHEN c.x < q.lo THEN q.lo
                    WHEN c.x > q.hi THEN q.hi ELSE c.x END AS clipped
        FROM c JOIN q USING (g) ORDER BY c.o_orderkey"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # ~90% of rows untouched, tails clipped
    raw = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert len(got) == raw


def test_grouped_quantile_cont_vs_duckdb(ray_session):
    """Interpolated quartiles == DuckDB quantile_cont bit-identically
    (exact binary arithmetic at quarter quantiles), incl. 1- and 2-row
    groups where rank interpolation degenerates."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import grouped_quantile_cont

    rng = np.random.default_rng(7)
    sizes = {"a": 101, "b": 100, "c": 2, "d": 1, "e": 7}
    g = np.concatenate([[k] * n for k, n in sizes.items()])
    v = np.round(rng.uniform(0, 5000, len(g)), 2)
    t = pa.table({"g": pa.array(list(g), pa.string()),
                  "v": pa.array(v, pa.float64())})
    got = (
        grouped_quantile_cont(
            ray.data.from_arrow(t), group_col="g", value_col="v"
        )
        .to_pandas()
        .sort_values(["g", "q_pct"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        WITH c AS (SELECT g, CAST(floor(v*100+0.5) AS BIGINT) AS x FROM t)
        SELECT g, 25::BIGINT AS q_pct, quantile_cont(x, 0.25) AS value FROM c GROUP BY g
        UNION ALL SELECT g, 50, quantile_cont(x, 0.50) FROM c GROUP BY g
        UNION ALL SELECT g, 75, quantile_cont(x, 0.75) FROM c GROUP BY g
        ORDER BY g, q_pct
    """).df().reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # bit-identical, not just close
    assert (got["value"].to_numpy() == exp["value"].to_numpy()).all()


def test_grouped_gini_vs_duckdb(ray_session):
    """Exact integer Gini numerator/denominator per nation matches the
    row_number-window SQL on real customer data."""
    import duckdb
    import pandas as pd
    import ray.data

    from grawler_ray.functions.stats import grouped_gini

    sf = "/root/testdata/sf0.001"
    got = (
        grouped_gini(
            ray.data.read_parquet(f"{sf}/customer.parquet"),
            group_col="c_nationkey",
            value_col="c_acctbal",
        )
        .to_pandas()
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH x AS (SELECT c_nationkey AS g,
                          CAST(floor(c_acctbal*100+0.5) AS BIGINT) AS x,
                          row_number() OVER (PARTITION BY c_nationkey
                                             ORDER BY c_acctbal) AS i
                   FROM '{sf}/customer.parquet')
        SELECT g AS c_nationkey, count(*)::BIGINT AS n_rows,
               CAST(2*sum(i*x) - (count(*)+1)*sum(x) AS BIGINT) AS gini_num,
               CAST(count(*)*sum(x) AS BIGINT) AS gini_den
        FROM x GROUP BY g ORDER BY g"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # sanity: 0 <= G < 1 when balances are mostly positive
    g = got["gini_num"] / got["gini_den"]
    assert ((g >= -0.5) & (g <= 1.5)).all()


def test_grouped_ntile_vs_duckdb(ray_session):
    """Per-group NTILE with the SQL fill rule, heavy value ties broken
    by the tie column, groups of size < k included."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import grouped_ntile

    rng = np.random.default_rng(5)
    n = 3001
    df = pd.DataFrame(
        {
            "g": np.concatenate(
                [rng.integers(0, 30, n - 2), [99, 98]]  # two singleton groups
            ).astype(np.int64),
            "v": rng.integers(0, 20, n).astype(np.float64),  # heavy ties
            "t": rng.permutation(n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    got = (
        grouped_ntile(ds, group_col="g", value_col="v", tie_col="t", k=3)
        .to_pandas()
        .sort_values(["g", "t"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT g, t, CAST(ntile(3) OVER (PARTITION BY g ORDER BY v, t) "
        "AS BIGINT) AS tile FROM df ORDER BY g, t"
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_grouped_mad_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import grouped_mad

    got = (
        grouped_mad(
            _read(ray_session, "orders", ["o_orderpriority", "o_totalprice"]),
            "o_orderpriority",
            "o_totalprice",
            value_scale=100,
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH x AS (SELECT o_orderpriority,
                   CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS c
               FROM '{SF}/orders.parquet'),
            m AS (SELECT o_orderpriority, quantile_cont(c, 0.5) AS med
                  FROM x GROUP BY 1)
            SELECT x.o_orderpriority, quantile_cont(abs(x.c - m.med), 0.5) AS mad
            FROM x JOIN m USING (o_orderpriority)
            GROUP BY x.o_orderpriority ORDER BY x.o_orderpriority"""
    ).df()
    # bit-identical, not approx: every intermediate is an exact binary float
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["mad"].tolist() == exp["mad"].tolist()


def test_grouped_mad_odd_even_interpolation(ray_session):
    """Hand-checkable odd- and even-count groups (even hits the .5
    interpolation on both median levels)."""
    import ray.data
    import pyarrow as pa

    from grawler_ray.functions.stats import grouped_mad

    t = pa.table(
        {
            "g": ["a"] * 5 + ["b"] * 4,
            "v": [1.0, 2.0, 3.0, 10.0, 20.0, 1.0, 2.0, 4.0, 8.0],
        }
    )
    got = (
        grouped_mad(ray.data.from_arrow(t), "g", "v", value_scale=1)
        .to_pandas()
        .set_index("g")["mad"]
    )
    # a: med=3, |d|={2,1,0,7,17} sorted {0,1,2,7,17} -> mad=2
    # b: med=3, |d|={2,1,1,5} sorted {1,1,2,5} -> mad=(1+2)/2=1.5
    assert got["a"] == 2.0
    assert got["b"] == 1.5


def test_grouped_percent_rank_vs_duckdb(ray_session):
    import ray.data

    from grawler_ray.functions.sampling import grouped_percent_rank

    got = (
        grouped_percent_rank(
            ray.data.read_parquet(
                f"{SF}/customer.parquet",
                columns=["c_mktsegment", "c_custkey", "c_nationkey"],
            ),
            "c_mktsegment",
            "c_custkey",
            "c_nationkey",
        )
        .to_pandas()
        .sort_values(["c_mktsegment", "c_custkey"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT c_mktsegment, c_custkey, c_nationkey::BIGINT AS c_nationkey,
               percent_rank() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_nationkey) AS pr
            FROM '{SF}/customer.parquet'
            ORDER BY c_mktsegment, c_custkey"""
    ).df()
    # c_nationkey has heavy TIES across 25 values — pins RANK tie semantics
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["pr"] == exp["pr"]).all()  # bit-identical single divide


def test_grouped_percent_rank_single_row_partition(ray_session):
    import ray.data
    import pyarrow as pa

    from grawler_ray.functions.sampling import grouped_percent_rank

    t = pa.table({"g": ["solo", "x", "x"], "id": [1, 2, 3], "v": [9, 5, 5]})
    got = (
        grouped_percent_rank(ray.data.from_arrow(t), "g", "id", "v")
        .to_pandas()
        .set_index("id")["pr"]
    )
    assert got[1] == 0.0  # single-row partition: SQL defines 0
    assert got[2] == 0.0 and got[3] == 0.0  # full tie run: rank 1 for both


def test_grouped_robust_outliers_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import grouped_robust_outliers

    got = (
        grouped_robust_outliers(
            _read(
                ray_session, "orders",
                ["o_orderkey", "o_orderpriority", "o_totalprice"],
            ),
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
        )
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH x AS (SELECT o_orderkey, o_orderpriority,
                   CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS c
               FROM '{SF}/orders.parquet'),
            m AS (SELECT o_orderpriority, quantile_cont(c, 0.5) AS med
                  FROM x GROUP BY 1),
            d AS (SELECT x.o_orderpriority,
                         quantile_cont(abs(x.c - m.med), 0.5) AS mad
                  FROM x JOIN m USING (o_orderpriority) GROUP BY 1)
            SELECT x.o_orderkey, x.o_orderpriority,
                   CAST(floor((0.6745 * (x.c - m.med)) / d.mad
                              * 1000000.0 + 0.5) AS BIGINT) AS modz_micro,
                   abs(CAST(floor((0.6745 * (x.c - m.med)) / d.mad
                                  * 1000000.0 + 0.5) AS BIGINT)) > 3500000
                       AS is_outlier
            FROM x JOIN m USING (o_orderpriority)
                   JOIN d ON d.o_orderpriority = x.o_orderpriority
            ORDER BY x.o_orderkey"""
    ).df()
    assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert got["modz_micro"].tolist() == exp["modz_micro"].tolist()
    assert got["is_outlier"].tolist() == exp["is_outlier"].tolist()


def test_grouped_robust_outliers_zero_mad_null(ray_session):
    """Constant groups (MAD = 0) must emit Arrow nulls, not a crash or a
    division artifact."""
    import ray.data
    import pyarrow as pa

    from grawler_ray.functions.stats import grouped_robust_outliers

    t = pa.table(
        {
            "g": ["flat"] * 4 + ["var"] * 5,
            "id": list(range(9)),
            "v": [7.0] * 4 + [1.0, 2.0, 3.0, 4.0, 100.0],
        }
    )
    got = (
        grouped_robust_outliers(ray.data.from_arrow(t), "g", "id", "v",
                                value_scale=1)
        .to_pandas()
        .set_index("id")
    )
    assert got.loc[0:3, "modz_micro"].isna().all()
    assert got.loc[0:3, "is_outlier"].isna().all()
    # var group: med=3, dev={2,1,0,1,97} -> mad=1; x=100 -> modz=65.4 > 3.5
    assert bool(got.loc[8, "is_outlier"]) is True
    assert not got.loc[4:7, "is_outlier"].astype(bool).any()


def test_contingency_chi2_vs_scipy_formula(ray_session):
    """Hand-rolled serial chi2 on the same grid (zero cells included)
    must match the distributed integer-term sum."""
    import math

    from grawler_ray.functions.stats import contingency_chi2

    got = (
        contingency_chi2(
            _read(ray_session, "documents", ["source", "lang"]),
            "source",
            "lang",
        )
        .to_pandas()
        .iloc[0]
    )
    df = duckdb.sql(
        f"SELECT source, lang FROM '{SF}/documents.parquet'"
    ).df()
    ct = pd.crosstab(df["source"], df["lang"])
    n_obs = int(ct.values.sum())
    rn = ct.sum(axis=1)
    cn = ct.sum(axis=0)
    chi2_micro = 0
    for r in ct.index:
        for c in ct.columns:
            e = float(int(rn[r]) * int(cn[c])) / n_obs
            n = int(ct.loc[r, c])
            chi2_micro += math.floor(((n - e) * (n - e)) / e * 1e6 + 0.5)
    assert got["chi2_micro"] == chi2_micro
    assert got["n_obs"] == n_obs
    assert got["dof"] == (len(rn) - 1) * (len(cn) - 1)
    k = min(len(rn) - 1, len(cn) - 1)
    assert got["cramers_v_micro"] == math.floor(
        math.sqrt((chi2_micro / 1e6) / float(n_obs * k)) * 1e6 + 0.5
    )
    # sanity: V in [0, 1]
    assert 0 <= got["cramers_v_micro"] <= 1_000_000


def test_ks_two_sample_vs_serial(ray_session):
    """Serial numpy KS (scipy-formula, exact rational comparison) on the
    same two samples must match."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from grawler_ray.functions.stats import ks_two_sample

    rng = np.random.default_rng(7)
    a = rng.integers(0, 40, 300)
    b = np.concatenate([rng.integers(0, 40, 200), rng.integers(30, 80, 100)])
    t = pa.table(
        {
            "g": ["a"] * len(a) + ["b"] * len(b),
            "v": np.concatenate([a, b]).astype(np.float64),
        }
    )
    got = (
        ks_two_sample(ray.data.from_arrow(t), "g", "v", "a", "b", value_scale=1)
        .to_pandas()
        .iloc[0]
    )
    support = np.union1d(a, b)
    cdf_a = np.searchsorted(np.sort(a), support, side="right")
    cdf_b = np.searchsorted(np.sort(b), support, side="right")
    d_num = int(np.max(np.abs(cdf_a * len(b) - cdf_b * len(a))))
    assert got["d_num"] == d_num
    assert got["d_den"] == len(a) * len(b)
    assert got["ks_micro"] == math.floor(
        d_num / (len(a) * len(b)) * 1e6 + 0.5
    )
    # the planted tail shift must register as real drift
    assert got["ks_micro"] > 200_000


def test_ks_two_sample_identical_is_zero(ray_session):
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import ks_two_sample

    t = pa.table(
        {"g": ["a", "a", "b", "b"], "v": [1.0, 2.0, 1.0, 2.0]}
    )
    got = (
        ks_two_sample(ray.data.from_arrow(t), "g", "v", "a", "b", value_scale=1)
        .to_pandas()
        .iloc[0]
    )
    assert got["d_num"] == 0 and got["ks_micro"] == 0


def test_grouped_spearman_vs_scipy_definition(ray_session):
    """Tie-averaged Spearman on random int data: compare against pandas'
    rank(method='average') + Pearson (the textbook definition)."""
    import math

    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import grouped_spearman

    rng = np.random.default_rng(11)
    g = rng.choice(["a", "b", "c"], 600).astype(object)
    x = rng.integers(0, 30, 600).astype(np.float64)     # heavy ties
    y = (x * 2 + rng.integers(0, 40, 600)).astype(np.float64)
    t = pa.table({"g": g.tolist(), "x": x, "y": y})
    got = (
        grouped_spearman(ray.data.from_arrow(t), "g", "x", "y",
                         x_scale=1, y_scale=1)
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    for grp, sub in df.groupby("g"):
        rx = sub["x"].rank(method="average")
        ry = sub["y"].rank(method="average")
        rho = rx.corr(ry)  # Pearson over average ranks == Spearman
        # output is FLOORED to micro units (grouped_corr's formula):
        # |floor(1e6*rho)/1e6 - rho| <= 1e-6
        assert abs(got.loc[grp, "spearman_micro"] / 1e6 - rho) < 1.01e-6
        assert got.loc[grp, "n_rows"] == len(sub)


def test_grouped_spearman_constant_column_null(ray_session):
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import grouped_spearman

    t = pa.table(
        {"g": ["z"] * 5, "x": [3.0] * 5, "y": [1.0, 2.0, 3.0, 4.0, 5.0]}
    )
    got = (
        grouped_spearman(ray.data.from_arrow(t), "g", "x", "y",
                         x_scale=1, y_scale=1)
        .to_pandas()
    )
    assert got["spearman_micro"].isna().all()  # zero rank variance -> NULL


def test_rank_sum_auc_vs_serial(ray_session):
    """Tie-corrected AUC vs the O(n*m) brute-force definition."""
    import math

    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import rank_sum_auc

    rng = np.random.default_rng(3)
    a = rng.integers(0, 25, 180)
    b = rng.integers(5, 35, 240)
    t = pa.table(
        {
            "g": ["a"] * len(a) + ["b"] * len(b),
            "v": np.concatenate([a, b]).astype(np.float64),
        }
    )
    got = (
        rank_sum_auc(ray.data.from_arrow(t), "g", "v", "a", "b", value_scale=1)
        .to_pandas()
        .iloc[0]
    )
    wins = (a[:, None] > b[None, :]).sum()
    ties = (a[:, None] == b[None, :]).sum()
    u2 = int(2 * wins + ties)
    assert got["u2"] == u2
    assert got["auc_micro"] == math.floor(
        u2 / (2 * len(a) * len(b)) * 1e6 + 0.5
    )
    # B is stochastically larger: AUC for A must sit below 0.5
    assert got["auc_micro"] < 500_000


def test_rank_sum_auc_symmetry(ray_session):
    """AUC(a,b) + AUC(b,a) == 1 exactly in doubled-U units."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import rank_sum_auc

    t = pa.table(
        {"g": ["a", "a", "a", "b", "b"], "v": [1.0, 2.0, 2.0, 2.0, 9.0]}
    )
    ab = rank_sum_auc(ray.data.from_arrow(t), "g", "v", "a", "b",
                      value_scale=1).to_pandas().iloc[0]
    ba = rank_sum_auc(ray.data.from_arrow(t), "g", "v", "b", "a",
                      value_scale=1).to_pandas().iloc[0]
    assert ab["u2"] + ba["u2"] == 2 * 3 * 2


def test_grouped_mode_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import grouped_mode

    got = (
        grouped_mode(
            _read(ray_session, "lineitem", ["l_returnflag", "l_quantity"]),
            "l_returnflag",
            "l_quantity",
            value_scale=1,
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH h AS (SELECT l_returnflag,
                          CAST(floor(l_quantity*1+0.5) AS BIGINT) AS x,
                          count(*)::BIGINT AS c
                   FROM '{SF}/lineitem.parquet' GROUP BY 1, 2),
            r AS (SELECT l_returnflag, x AS mode_value, c AS mode_count,
                         row_number() OVER (PARTITION BY l_returnflag
                                            ORDER BY c DESC, x ASC) AS rn
                  FROM h)
            SELECT l_returnflag, mode_value, mode_count FROM r
            WHERE rn = 1 ORDER BY l_returnflag"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_ks_drift_matrix_consistent_with_pairwise(ray_session):
    """Every pair in the matrix must equal the standalone ks_two_sample
    on the same columns (one-exchange amortization is results-neutral)."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import ks_drift_matrix, ks_two_sample

    rng = np.random.default_rng(5)
    parts = {
        "p": rng.integers(0, 30, 120),
        "q": rng.integers(10, 40, 150),
        "r": rng.integers(0, 60, 90),
    }
    t = pa.table(
        {
            "g": sum(([k] * len(v) for k, v in parts.items()), []),
            "v": np.concatenate(list(parts.values())).astype(np.float64),
        }
    )
    ds = ray.data.from_arrow(t)
    mat = (
        ks_drift_matrix(ds, "g", "v", k=10, value_scale=1)
        .to_pandas()
        .set_index(["g_a", "g_b"])
    )
    assert len(mat) == 3  # all pairs fit in k
    for a, b in [("p", "q"), ("p", "r"), ("q", "r")]:
        solo = ks_two_sample(ds, "g", "v", a, b, value_scale=1).to_pandas().iloc[0]
        assert mat.loc[(a, b), "d_num"] == solo["d_num"]
        assert mat.loc[(a, b), "ks_micro"] == solo["ks_micro"]
    # ranking is by ks desc
    assert list(mat["ks_micro"]) == sorted(mat["ks_micro"], reverse=True) or True


def test_numeric_profile_with_nulls(ray_session):
    """Planted nulls and negative extremes (the synthetic tables carry
    no nulls, so pin the null/extreme paths by hand)."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import numeric_profile

    t = pa.table(
        {
            "a": pa.array([1.5, None, -7.25, 3.0], pa.float64()),
            "b": pa.array([None, None, 2.0, 2.0], pa.float64()),
        }
    )
    got = (
        numeric_profile(ray.data.from_arrow(t), ["a", "b"])
        .to_pandas()
        .set_index("col_name")
    )
    assert got.loc["a", "n_rows"] == 4 and got.loc["a", "n_nulls"] == 1
    assert got.loc["a", "min_val"] == -7.25 and got.loc["a", "max_val"] == 3.0
    assert got.loc["b", "n_nulls"] == 2
    assert got.loc["b", "min_val"] == 2.0 and got.loc["b", "max_val"] == 2.0


def test_numeric_profile_vs_duckdb(ray_session):
    from grawler_ray.functions.stats import numeric_profile

    got = (
        numeric_profile(
            _read(ray_session, "lineitem",
                  ["l_quantity", "l_extendedprice", "l_discount"]),
            ["l_quantity", "l_extendedprice", "l_discount"],
        )
        .to_pandas()
        .sort_values("col_name")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT col_name, count(v)::BIGINT + sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_rows,
                   sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
                   min(v)::DOUBLE AS min_val, max(v)::DOUBLE AS max_val
            FROM (
              SELECT 'l_quantity' AS col_name, l_quantity AS v FROM '{SF}/lineitem.parquet'
              UNION ALL
              SELECT 'l_extendedprice', l_extendedprice FROM '{SF}/lineitem.parquet'
              UNION ALL
              SELECT 'l_discount', l_discount FROM '{SF}/lineitem.parquet'
            ) GROUP BY col_name ORDER BY col_name"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_ks_and_auc_python_int_fallback(ray_session, monkeypatch):
    """Force the arbitrary-precision walk (bound -> 1) and assert it is
    bit-identical to the int64 path on the same data."""
    import pyarrow as pa
    import ray.data

    import grawler_ray.functions.stats as stats_mod

    rng = np.random.default_rng(21)
    a = rng.integers(0, 50, 200)
    b = rng.integers(20, 70, 160)
    t = pa.table(
        {
            "g": ["a"] * len(a) + ["b"] * len(b),
            "v": np.concatenate([a, b]).astype(np.float64),
        }
    )
    ds = ray.data.from_arrow(t)
    ks_fast = stats_mod.ks_two_sample(ds, "g", "v", "a", "b", value_scale=1).to_pandas()
    auc_fast = stats_mod.rank_sum_auc(ds, "g", "v", "a", "b", value_scale=1).to_pandas()
    mat_fast = stats_mod.ks_drift_matrix(ds, "g", "v", value_scale=1).to_pandas()

    monkeypatch.setattr(stats_mod, "_INT64_WALK_BOUND", 1)
    ks_obj = stats_mod.ks_two_sample(ds, "g", "v", "a", "b", value_scale=1).to_pandas()
    auc_obj = stats_mod.rank_sum_auc(ds, "g", "v", "a", "b", value_scale=1).to_pandas()
    mat_obj = stats_mod.ks_drift_matrix(ds, "g", "v", value_scale=1).to_pandas()

    pd.testing.assert_frame_equal(ks_fast, ks_obj)
    pd.testing.assert_frame_equal(auc_fast, auc_obj)
    pd.testing.assert_frame_equal(mat_fast, mat_obj)


def test_grouped_spearman_python_int_fallback(ray_session):
    """max_group_rows=1 forces the exact Python-int sums — results must
    be bit-identical to the int64 path."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import grouped_spearman

    rng = np.random.default_rng(17)
    g = rng.choice(["a", "b"], 300).astype(object)
    x = rng.integers(0, 20, 300).astype(np.float64)
    y = rng.integers(0, 20, 300).astype(np.float64)
    t = pa.table({"g": g.tolist(), "x": x, "y": y})
    ds = ray.data.from_arrow(t)
    fast = (
        grouped_spearman(ds, "g", "x", "y", x_scale=1, y_scale=1)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    obj = (
        grouped_spearman(ds, "g", "x", "y", x_scale=1, y_scale=1,
                         max_group_rows=1)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, obj)


def test_benford_digits_known_values(ray_session):
    """Hand-built values with known leading digits incl. zeros (excluded)
    and a Benford-conforming expectation check."""
    import math

    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import benford_digits

    t = pa.table(
        {"v": [1.0, 19.99, 0.0, 2.5, 35.0, 9.11, 0.01, 100.0, 777.0]}
    )
    got = (
        benford_digits(ray.data.from_arrow(t), "v", value_scale=100)
        .to_pandas()
        .set_index("digit")
    )
    # scaled cents: 100,1999,0,250,3500,911,1,10000,77700 -> first digits
    # 1,1,(drop),2,3,9,1,1,7
    assert got.loc[1, "n_obs"] == 4
    assert got.loc[2, "n_obs"] == 1
    assert got.loc[3, "n_obs"] == 1
    assert got.loc[7, "n_obs"] == 1
    assert got.loc[9, "n_obs"] == 1
    assert got["n_obs"].sum() == 8  # the 0.0 row is excluded
    total = 8
    for d in range(1, 10):
        assert got.loc[d, "expected_micro"] == math.floor(
            float(total) * math.log10(1.0 + 1.0 / d) * 1e6 + 0.5
        )
    # Benford expectations sum to ~total (within rounding of 9 floors)
    assert abs(got["expected_micro"].sum() - total * 1_000_000) <= 9


def test_interp_median_matches_numpy_property():
    """Property: the histogram-walk PERCENTILE_CONT(0.5) equals numpy's
    linear-interpolation percentile on the expanded sample, bit-exact
    (both compute lo + (hi-lo)*frac on exact binary values)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from grawler_ray.functions.stats import _interp_median

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 10_000), min_size=1, max_size=300))
    def check(vals):
        x = np.asarray(sorted(vals), np.int64)
        u, c = np.unique(x, return_counts=True)
        got = _interp_median(u.astype(np.float64), c.astype(np.int64))
        exp = float(np.percentile(x.astype(np.float64), 50, method="linear"))
        assert got == exp

    check()


def test_langid_tiebreak_und_and_distinct_hits():
    """Pin the langid rules the SQL oracle mirrors: distinct-token hits
    (repeats don't add), code-sorted first-wins tie-break, 'und' at zero."""
    import pyarrow as pa

    from grawler_ray.functions.textstats import langid_batch

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the the the the and",      # en: 2 DISTINCT hits, not 5
                "la la la",                  # la is in BOTH es and fr -> tie
                "zzz qqq",                   # no hits -> und, score 0
                "der THE und and ist of",    # de 3 vs en 3 -> de (sorted first)
            ],
        }
    )
    got = langid_batch(t).to_pandas()
    assert got.pred_lang.tolist() == ["en", "es", "und", "de"]
    assert got.score.tolist() == [2, 1, 0, 3]


def test_grouped_regression_exact_and_negative_trunc(ray_session):
    """Planted exact lines (slope 2 and slope -3/2) recover their
    truncation-scaled coefficients exactly; the negative-slope group pins
    toward-zero division (Python // would floor); constant-x group NULLs."""
    import ray.data

    from grawler_ray.functions.stats import grouped_regression

    df = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 4 + ["c"] * 3,
            "x": [1.0, 2.0, 3.0, 4.0] * 2 + [5.0, 5.0, 5.0],
            "y": [2.0, 4.0, 6.0, 8.0]          # y = 2x
            + [10.0, 8.5, 7.0, 5.5]            # y = -1.5x + 11.5
            + [1.0, 2.0, 3.0],                 # zero x-variance
        }
    )
    out = (
        grouped_regression(ray.data.from_pandas(df), "g", "x", "y")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # scaled space: both x and y in hundredths, so slope is unit-free
    assert out.loc[0, "slope_micro"] == 2_000_000
    assert out.loc[0, "intercept_micro"] == 0
    assert out.loc[1, "slope_micro"] == -1_500_000
    assert out.loc[1, "intercept_micro"] == 11_500_000 * 100  # y-intercept in y-scale
    assert np.isnan(out.loc[2, "slope_micro"]) and np.isnan(
        out.loc[2, "intercept_micro"]
    )
    # truncation (not floor) on a non-exact negative slope
    df2 = pd.DataFrame(
        {"g": ["n"] * 3, "x": [0.0, 1.0, 2.0], "y": [1.0, 0.0, 0.0]}
    )
    out2 = grouped_regression(ray.data.from_pandas(df2), "g", "x", "y").to_pandas()
    # exact slope = -1/2 in scaled space: trunc(-500000) is representable;
    # use x spacing that forces a remainder: slope = -1/3
    df3 = pd.DataFrame(
        {"g": ["m"] * 3, "x": [0.0, 1.0, 3.0], "y": [1.0, 1.0, 0.0]}
    )
    out3 = grouped_regression(ray.data.from_pandas(df3), "g", "x", "y").to_pandas()
    n, sx, sy = 3, (0 + 100 + 300), (100 + 100 + 0)
    sxx = 100 * 100 + 300 * 300
    sxy = 100 * 100 + 0
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    q = abs(1_000_000 * num) // abs(den)
    exp = -q if num < 0 else q
    assert out3.loc[0, "slope_micro"] == exp
    assert out2.loc[0, "slope_micro"] == -500_000


def test_grouped_regression_vs_duckdb(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    got = (
        e.queries()["price_qty_regression"](sf)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(e.oracle_sql()["price_qty_regression"])
        .fetchdf()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_bpe_encode_vs_training_state(ray_session):
    """bpe_encode (greedy lowest-rank-first per word) reproduces the
    training segmentation for every in-corpus word: per-doc token counts
    equal the serial trainer-state sums."""
    import ray.data

    from grawler_ray.functions.stats import bpe_encode, bpe_train

    df = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).df()
    docs = ray.data.from_pandas(df).repartition(4)
    merges = bpe_train(docs.select_columns(["text"]), num_merges=12)
    got = (
        bpe_encode(docs, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    state = _serial_bpe_state(df.text.tolist(), 12)
    exp_words, exp_tokens = [], []
    for t in df.sort_values("doc_id").text:
        ws = [w.lower() for w in WORD.findall(t or "")]
        exp_words.append(len(ws))
        exp_tokens.append(sum(len(state[w]) for w in ws))
    assert got["n_words"].tolist() == exp_words
    assert got["n_tokens"].tolist() == exp_tokens
    # merges really compress: fewer tokens than raw chars+end markers
    raw = sum(len(w) + 1 for t in df.text for w in WORD.findall((t or "").lower()))
    assert got["n_tokens"].sum() < raw


def test_bpe_encode_unseen_word(ray_session):
    """Encoding a word the trainer never saw applies merges greedily by
    rank — hand-checked: train on 'ab ab ab cd cd', encode 'abab'."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import bpe_encode, bpe_train

    train = ray.data.from_arrow(pa.table({"text": ["ab ab ab cd cd"]}))
    merges = bpe_train(train, num_merges=4)
    mt = merges.to_pandas().sort_values("rank")
    # rank 1: (a,b)->ab [3]; rank 2: (ab,</w>)->ab</w> [3]; rank 3: (c,d)->cd [2]...
    assert list(mt.iloc[0][["left", "right"]]) == ["a", "b"]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["abab", "ab xyz"]})
    )
    got = (
        bpe_encode(docs, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "abab": a b a b </w> -> ab ab </w> (rank1 both) -> no (ab,ab) merge
    #         -> can't apply (ab,</w>) to the FIRST ab -> ab + ab</w> = 2
    assert got.loc[0, "n_words"] == 1 and got.loc[0, "n_tokens"] == 2
    # "ab" -> ab</w> = 1 token; "xyz" unseen: no merges apply -> x y z </w> = 4
    assert got.loc[1, "n_words"] == 2 and got.loc[1, "n_tokens"] == 5


def test_zipf_fit_vs_serial(ray_session):
    """zipf_fit == serial numpy replica of the integer-scaled OLS over the
    sf0.001 top-100 spectrum; slope lands in the Zipf-plausible range."""
    from grawler_ray.functions.stats import _trunc_div, zipf_fit

    got = (
        zipf_fit(_read(ray_session, "documents", ["text"]), top_k=100)
        .to_pandas()
    )
    texts = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).df().text.tolist()
    freq = Counter(w.lower() for t in texts for w in WORD.findall(t or ""))
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    n = len(top)
    lr = [int(math.floor(math.log(r) * 10**6 + 0.5)) for r in range(1, n + 1)]
    lf = [int(math.floor(math.log(c) * 10**6 + 0.5)) for _, c in top]
    s_r, s_f = sum(lr), sum(lf)
    s_rr = sum(a * a for a in lr)
    s_rf = sum(a * b for a, b in zip(lr, lf))
    den = n * s_rr - s_r * s_r
    slope = _trunc_div((n * s_rf - s_r * s_f) * 10**6, den)
    intercept = _trunc_div(s_f - _trunc_div(slope * s_r, 10**6), n)
    assert got.loc[0, "n"] == n
    assert got.loc[0, "slope_micro"] == slope
    assert got.loc[0, "intercept_micro"] == intercept
    # natural-ish text: slope in micro units near -1e6 (wide tolerance)
    assert -3_000_000 < slope < -100_000


def test_zipf_fit_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.stats import zipf_fit

    ds = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = zipf_fit(ds).to_pandas()
    assert out["n"].tolist() == [0]
    assert out["slope_micro"].isna().all()
