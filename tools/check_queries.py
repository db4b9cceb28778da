"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side on an sf dir, compare row-count + schema +
order-insensitive values (sorted by column name, rows sorted)."""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


# numpy dtype-kind families treated as equal: signed/unsigned ints produce the
# same value strings, so the driver's value hash cannot tell them apart either
_KIND_FAMILY = {"u": "i"}


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    """Driver-faithful compare: rowcount, column set, then per column the
    post-to_pandas dtype KIND, the null mask, and the UNCAST string repr of
    every non-null value.  No float-casting, no dtype coercion — the driver
    hashes the values as they land, so a pandas-nullable ``<NA>`` vs a float
    ``NaN``, or ``947`` vs ``947.0``, must FAIL here exactly like it fails
    there (the round-3 asof_join escape: semantics equal, representation
    not — the old float-cast compare masked it)."""
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount {len(ray_df)} vs {len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        return problems
    a, b = normalize(ray_df), normalize(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            ak = _KIND_FAMILY.get(av.dtype.kind, av.dtype.kind)
            bk = _KIND_FAMILY.get(bv.dtype.kind, bv.dtype.kind)
            if ak != bk:
                problems.append(
                    f"dtype kind differs in column {c}: {av.dtype} vs {bv.dtype}"
                )
                continue
            am = av.isna().to_numpy()
            bm = bv.isna().to_numpy()
            if not (am == bm).all():
                problems.append(f"null masks differ in column {c}")
                continue
            avs = av[~am].astype(str).to_numpy()
            bvs = bv[~bm].astype(str).to_numpy()
            if not (avs == bvs).all():
                problems.append(f"values differ in column {c}")
    return problems


def main(sf_dir: str, only: list[str] | None = None) -> int:
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows ({dt:.1f}s)")
            continue
        sql_df = con.execute(oracles[name]).fetchdf()
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: {problems} ({dt:.1f}s)")
            failures += 1
        else:
            print(f"PASS {name}: {len(ray_df)} rows ({dt:.1f}s)")
    return failures


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    rc = main(sf, only)
    ray.shutdown()
    sys.exit(1 if rc else 0)
