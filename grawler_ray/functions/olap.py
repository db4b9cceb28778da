"""OLAP-shape report operators: ROLLUP aggregates and wide→long unpivot.

Not in the 931-LoC reference (it has no reporting surface); these are the
multi-granularity corpus-composition reports a pipeline operator reads
daily (docs per (source, lang) WITH subtotals per source and a grand
total — SQL's ``GROUP BY ROLLUP``), and the melt/unpivot reshape that
feeds per-metric tooling.

Scale shapes:
- ``rollup_sum``: each batch pre-aggregates ALL rollup levels locally
  (finest (k1,k2) plus (k1, ALL) plus (ALL, ALL) — at most 3× the finest
  in-batch key cardinality, which is already tiny after pre-aggregation),
  tags rolled-up columns with a sentinel so the exchange sees plain
  string keys, and ONE groupby finishes.  One exchange total, shuffle
  rows ∝ blocks × distinct keys, payload never moves, nothing on the
  driver.  Sentinels become Arrow nulls (never pandas ``<NA>``) on the
  way out — the CLAUDE.md null-representation rule.
- ``melt``: a stateless per-batch reshape (one ``pa.concat_tables`` of
  per-column slices); no shuffle at all, output rows = input × n_cols.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# \x00 prefix: cannot appear in real column values of any sane corpus;
# asserted absent anyway before use
_ALL = "\x00ALL\x00"


def rollup_sum(ds, k1: str, k2: str, value_col: str, count_name: str = "n_rows",
               sum_name: str = "sum_value", cube: bool = False):
    """``GROUP BY ROLLUP(k1, k2)`` with COUNT(*) and SUM(value_col):
    finest (k1, k2) rows, per-``k1`` subtotals (k2 NULL), and one grand
    total (both NULL) — exactly SQL's rollup row set.  ``cube=True``
    additionally emits the per-``k2`` subtotals (k1 NULL), completing
    ``GROUP BY CUBE(k1, k2)`` — same single exchange, one more
    pre-aggregated level per batch.

    Both keys must be strings; ``value_col`` must be integer (callers
    pre-scale money to cents — the module's exact-compare convention).
    Output: (k1, k2, count_name, sum_name), rolled-up keys as Arrow
    string nulls.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "a": t.column(k1).to_pylist(),
                "b": t.column(k2).to_pylist(),
                "v": t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        assert not df["a"].str.startswith("\x00").any(), "sentinel collision"
        assert not df["b"].str.startswith("\x00").any(), "sentinel collision"
        levels = []
        g = df.groupby(["a", "b"], sort=False, dropna=False)
        fine = pd.DataFrame({"n": g.size(), "s": g["v"].sum()}).reset_index()
        levels.append(fine)
        sub = fine.groupby("a", sort=False, dropna=False)[["n", "s"]].sum().reset_index()
        sub["b"] = _ALL
        levels.append(sub)
        if cube:
            sub2 = (
                fine.groupby("b", sort=False, dropna=False)[["n", "s"]]
                .sum()
                .reset_index()
            )
            sub2["a"] = _ALL
            levels.append(sub2)
        levels.append(
            pd.DataFrame({"a": [_ALL], "b": [_ALL], "n": [fine["n"].sum()],
                          "s": [fine["s"].sum()]})
        )
        allp = pd.concat(levels, ignore_index=True)
        return pa.table(
            {
                k1: pa.array(allp["a"].tolist(), pa.string()),
                k2: pa.array(allp["b"].tolist(), pa.string()),
                "n_part": pa.array(allp["n"].to_numpy(np.int64), pa.int64()),
                "s_part": pa.array(allp["s"].to_numpy(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.select_columns([k1, k2, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([k1, k2])
        .aggregate(Sum("n_part", alias_name=count_name),
                   Sum("s_part", alias_name=sum_name))
    )

    def unsentinel(t: pa.Table) -> pa.Table:
        out = {}
        for col in (k1, k2):
            arr = pc.cast(t.column(col), pa.string())
            out[col] = pc.if_else(pc.equal(arr, _ALL), pa.scalar(None, pa.string()), arr)
        out[count_name] = pc.cast(t.column(count_name), pa.int64())
        out[sum_name] = pc.cast(t.column(sum_name), pa.int64())
        return pa.table(out)

    return agg.map_batches(unsentinel, batch_format="pyarrow")


def melt(ds, id_cols: list[str], value_cols: list[str],
         metric_name: str = "metric", value_name: str = "value"):
    """Wide→long unpivot: one output row per (input row, value column),
    with the column name in ``metric_name`` and its float64 value in
    ``value_name`` — SQL's UNPIVOT / stacked UNION ALL.  Pure per-batch
    reshape: no shuffle, values pass through untouched (bit-exact vs the
    UNION ALL oracle)."""

    def reshape(t: pa.Table) -> pa.Table:
        parts = []
        for col in value_cols:
            cols = {c: t.column(c) for c in id_cols}
            cols[metric_name] = pa.array([col] * t.num_rows, pa.string())
            cols[value_name] = pc.cast(t.column(col), pa.float64())
            parts.append(pa.table(cols))
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    return ds.select_columns(list(id_cols) + list(value_cols)).map_batches(
        reshape, batch_format="pyarrow"
    )
