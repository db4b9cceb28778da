"""Deterministic sampling operators (§2.6 — the reference has none; a
training-data pipeline needs reproducible subsets).

Sampling is keyed on an arithmetic Knuth-style hash of the row id —
deterministic across runs/partitionings AND expressible in ANSI SQL, so the
driver's DuckDB gate can verify the exact row set (`random()`-based samples
could only ever be rows-only checked).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = 2654435761  # 2^32 / golden ratio
_MOD = 1 << 32


def _bucket1000(ids: np.ndarray) -> np.ndarray:
    # non-negative ids only: numpy would wrap a negative int64 mod 2^64 while
    # the SQL mirror keeps its sign — fail loudly instead of silently
    # diverging from the oracle (ADVICE r2)
    if len(ids) and int(ids.min()) < 0:
        raise ValueError("sampling id column must be non-negative")
    return ((ids.astype(np.uint64) * _KNUTH) % _MOD) % 1000


def sample_fraction(ds, id_col: str = "doc_id", permille: int = 100):
    """Keep rows whose hash bucket (0-999) falls below ``permille`` — a
    deterministic ~permille/1000 sample.  SQL mirror (HUGEINT: BIGINT
    id * 2654435761 overflows int64 for id >= ~3.47e9, and
    ((x mod 2^128) mod 2^32) == (x mod 2^32) == numpy's uint64-wrap result
    for any non-negative int64 id):
    ((id::HUGEINT * 2654435761) % 4294967296) % 1000 < permille."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _bucket1000(ids) < permille
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, strata_col: str = "lang", id_col: str = "doc_id", permille: dict | int = 100):
    """Per-stratum deterministic sampling: ``permille`` is either one rate
    or a {stratum: rate} dict (missing strata keep nothing).  Stateless —
    no shuffle, no per-stratum pass; the stratum only selects the rate."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = _bucket1000(ids)
        if isinstance(permille, int):
            rates = np.full(len(ids), permille, dtype=np.int64)
        else:
            strata = t.column(strata_col).to_pylist()
            rates = np.fromiter(
                (permille.get(s, 0) for s in strata), dtype=np.int64, count=len(strata)
            )
        return t.filter(pa.array(b < rates))

    return ds.map_batches(fn, batch_format="pyarrow")


def split_train_holdout(ds, id_col: str = "doc_id", holdout_permille: int = 100):
    """Deterministic train/holdout tagging (single pass, no shuffle):
    adds ``split`` = 'holdout' for the hash bucket below the rate, else
    'train' — the standard leak-free dataset split at corpus scale."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        hold = _bucket1000(ids) < holdout_permille
        split = pc.if_else(
            pa.array(hold), pa.scalar("holdout"), pa.scalar("train")
        )
        return t.append_column("split", split)

    return ds.map_batches(fn, batch_format="pyarrow")
