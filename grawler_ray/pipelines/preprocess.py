"""Flagship webtext preparation pipeline: the end-to-end chain a user runs
to turn a raw documents table into training-ready shards.

    quality filter (Gopher repetition rules, quality.py)
      -> exact dedup (md5, keep min doc_id)
      -> MinHash+LSH near-dup pairs -> connected components -> keep min
      -> BPE-ish token counting
      -> deterministic train/holdout split (Knuth hash, sampling.py)
      -> optional partitioned parquet output (one dir per split)

Every stage is the already-SQL-or-fixture-proven operator it names; this
module only composes them, plus ONE repartition semi-join (union + coarse
doc-hash groupby — Ray 2.49's native Dataset.join is avoided for the
documented Acero defects) to carry text past the component keep-set.

Scale shape: text moves through exactly three shuffles (exact-dedup
groupby, the minhash band shuffle inside minhash_dedup, and the semi-join);
all other stages are stateless map_batches.  Stage survivors are
materialized in the object store (narrow id columns ride along, text
spills if needed) because each feeds TWO consumers (the next stage + the
summary count); at the 100-TB target you would write each stage boundary
to partitioned parquet instead and make the counts free — the
``out_dir``-per-stage hook below is where that plugs in.

Returns a summary Dataset (stage, n_docs, n_tokens); n_tokens is 0 for
pre-token stages, and the train/holdout rows carry exact BPE token sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _keep_quality_batch(quality_kwargs: dict):
    from grawler_ray.functions.quality import quality_filter_batch

    qf = quality_filter_batch(**quality_kwargs)

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flags = qf(t)
        return t.filter(pc.equal(flags.column("keep"), True))

    return fn


def _exact_keep_first(df: pd.DataFrame) -> pd.DataFrame:
    """Coarse group: keep the min-doc_id row of every text_hash run."""
    df = df.sort_values(["text_hash", "doc_id"])
    h = df["text_hash"].to_numpy()
    first = np.concatenate(([True], h[1:] != h[:-1])) if len(h) else np.array([], bool)
    out = df.loc[first, ["doc_id", "text"]]
    return out


def _semi_join_text(docs_ds, keep_ids_ds, num_groups: int):
    """docs (doc_id, text) ⋉ keep_ids (doc_id) via union + coarse-hash
    groupby (the repartition-join pattern; both sides pandas blocks)."""

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        u = df["doc_id"].to_numpy().astype(np.uint64)
        g = ((u * _GOLDEN) >> np.uint64(33)) % np.uint64(num_groups)
        return pd.DataFrame(
            {
                "dg": g.astype(np.int32),
                "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                "text": df["text"].to_numpy(),
                "is_doc": np.ones(len(df), np.int8),
            }
        )

    def tag_keep(df: pd.DataFrame) -> pd.DataFrame:
        u = df["doc_id"].to_numpy().astype(np.uint64)
        g = ((u * _GOLDEN) >> np.uint64(33)) % np.uint64(num_groups)
        return pd.DataFrame(
            {
                "dg": g.astype(np.int32),
                "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                "text": np.full(len(df), "", object),
                "is_doc": np.zeros(len(df), np.int8),
            }
        )

    both = docs_ds.map_batches(tag_docs, batch_format="pandas").union(
        keep_ids_ds.map_batches(tag_keep, batch_format="pandas")
    )

    def keep_group(df: pd.DataFrame) -> pd.DataFrame:
        isdoc = df["is_doc"].to_numpy() == 1
        keep = np.sort(df.loc[~isdoc, "doc_id"].to_numpy())
        ids = df.loc[isdoc, "doc_id"].to_numpy()
        if len(keep) == 0:
            ok = np.zeros(len(ids), bool)
        else:
            pos = np.searchsorted(keep, ids)
            ok = (pos < len(keep)) & (keep[np.minimum(pos, len(keep) - 1)] == ids)
        return df.loc[isdoc].loc[ok, ["doc_id", "text"]]

    return both.groupby("dg").map_groups(keep_group, batch_format="pandas")


def prep_corpus(
    docs_ds,
    out_dir: str | None = None,
    *,
    minhash_threshold: float = 0.5,
    holdout_permille: int = 100,
    quality_kwargs: dict | None = None,
    num_groups: int = 256,
    collect_timings: dict | None = None,
):
    """Run the full prep chain; see module docstring.  ``docs_ds`` needs
    (doc_id, text).  Returns the summary Dataset; when ``out_dir`` is set,
    also writes ``{out_dir}/split=train|holdout/*.parquet`` with
    (doc_id, text, n_bpe_tokens, split).  Pass a dict as
    ``collect_timings`` to receive per-stage wall seconds (each stage
    boundary is a materialize, so the splits are real)."""
    import time as _time

    import ray.data

    from grawler_ray.functions.dedup import (
        dedup_components,
        exact_hash_batch,
        minhash_dedup,
    )
    from grawler_ray.functions.sampling import _bucket1000
    from grawler_ray.functions.textstats import token_count_batch

    _t = _time.monotonic

    def _mark(d: dict | None, stage: str, t0: float) -> float:
        now = _t()
        if d is not None:
            d[stage] = round(now - t0, 3)
        return now

    t0 = _t()
    n_input = docs_ds.count()

    # 1. quality filter (stateless)
    docs_q = docs_ds.map_batches(
        _keep_quality_batch(quality_kwargs or {}), batch_format="pyarrow"
    ).materialize()
    n_quality = docs_q.count()
    t0 = _mark(collect_timings, "quality", t0)

    # 2. exact dedup: coarse-hash the md5 prefix, keep min doc_id per hash
    def tag_hash(t: pa.Table) -> pa.Table:
        ht = exact_hash_batch(t)
        g = np.array(
            [int(h[:8], 16) % num_groups for h in ht.column("text_hash").to_pylist()],
            np.int32,
        )
        return pa.table(
            {
                "hg": pa.array(g, pa.int32()),
                "text_hash": ht.column("text_hash"),
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
            }
        )

    docs_e = (
        docs_q.map_batches(tag_hash, batch_format="pyarrow")
        .groupby("hg")
        .map_groups(_exact_keep_first, batch_format="pandas")
        .materialize()
    )
    n_exact = docs_e.count()
    t0 = _mark(collect_timings, "exact_dedup", t0)

    # 3. near-dup: pairs -> components -> keep doc_id == component
    pairs = minhash_dedup(docs_e, threshold=minhash_threshold)
    comps = dedup_components(docs_e, pairs)

    def keep_only(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["doc_id"].to_numpy() == df["component"].to_numpy(), ["doc_id"]]

    keep_ids = comps.map_batches(keep_only, batch_format="pandas")
    docs_n = _semi_join_text(docs_e, keep_ids, num_groups).materialize()
    n_near = docs_n.count()
    t0 = _mark(collect_timings, "near_dedup", t0)

    # 4. tokens + split (stateless)
    def tokens_split(df: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(df[["doc_id", "text"]], preserve_index=False)
        tc = token_count_batch(t)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        hold = _bucket1000(ids) < holdout_permille
        return pd.DataFrame(
            {
                "doc_id": ids,
                "text": df["text"].to_numpy(),
                "n_bpe_tokens": tc.column("n_bpe_tokens").to_numpy(),
                "split": np.where(hold, "holdout", "train"),
            }
        )

    final = docs_n.map_batches(tokens_split, batch_format="pandas").materialize()
    t0 = _mark(collect_timings, "tokens_split", t0)

    if out_dir is not None:
        final.write_parquet(out_dir, partition_cols=["split"])
        t0 = _mark(collect_timings, "write", t0)

    from ray.data.aggregate import Count, Sum

    split_rows = (
        final.groupby("split")
        .aggregate(Count(alias_name="n_docs"), Sum("n_bpe_tokens", alias_name="n_tokens"))
        .to_pandas()
    )
    rows = [
        {"stage": "input", "n_docs": n_input, "n_tokens": 0},
        {"stage": "quality", "n_docs": n_quality, "n_tokens": 0},
        {"stage": "exact_dedup", "n_docs": n_exact, "n_tokens": 0},
        {"stage": "near_dedup", "n_docs": n_near, "n_tokens": 0},
    ] + [
        {
            "stage": str(r["split"]),
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
        }
        for _, r in split_rows.iterrows()
    ]
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["stage", "n_docs", "n_tokens"])
    )
