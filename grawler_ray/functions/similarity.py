"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exactness baseline — per-batch numpy matmul
against a broadcast query matrix (no shuffle; the query side rides the object
store via ray.put).  The scale path is sign-LSH bucketing: each vector maps
to a hyperplane-sign bucket; queries probe only their bucket (+ optional
multi-probe), turning a full scan into a bucketed lookup — same layout trick
as the corpus fetch join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def ann_topk(embeddings_ds, query_ids: list[int], k: int = 10):
    """Exact cosine top-k for each query vector (queries = rows of the same
    table, selected by vec_id).  Returns (query_id, rank, vec_id) — integer
    output so the DuckDB oracle compares exactly.

    Two passes: (1) stream once to pull the query vectors; (2) stream again
    computing per-batch partial top-k against the broadcast query matrix,
    then reduce the partials on the driver (k x |queries| rows per batch —
    tiny).  Self-match (vec_id == query_id) is excluded.
    """
    import ray

    qset = set(query_ids)

    def grab_queries(t: pa.Table) -> pa.Table:
        keep = [i for i, v in enumerate(t.column("vec_id").to_pylist()) if v in qset]
        return t.take(pa.array(keep, pa.int64()))

    q_tab = embeddings_ds.map_batches(grab_queries, batch_format="pyarrow").to_pandas()
    q_tab = q_tab.sort_values("vec_id")
    Q = np.array(q_tab["embedding"].tolist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ids = q_tab["vec_id"].to_numpy()
    q_ref = ray.put((q_ids, Qn))

    def partial_topk(t: pa.Table) -> pa.Table:
        q_ids_, Qn_ = ray.get(q_ref)
        V = _to_matrix(t.column("embedding"))
        vids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Qn_ @ Vn.T  # (nq, nv)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids_)):
            row = sims[qi]
            mask = vids != q_ids_[qi]
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            top = idx[np.argsort(-row[idx], kind="stable")[:k]]
            out_q.extend([q_ids_[qi]] * len(top))
            out_v.extend(vids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        for rank, vec_id in enumerate(grp["vec_id"], start=1):
            out.append((int(qid), rank, int(vec_id)))
    return pd.DataFrame(out, columns=["query_id", "rank", "vec_id"])


def lsh_bucket_batch(dim: int, nbits: int = 16, seed: int = 3):
    """Sign-LSH bucket id per vector: bucket = bits of sign(H @ v) with a
    fixed random hyperplane matrix H (deterministic seed)."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((nbits, dim))

    def fn(t: pa.Table) -> pa.Table:
        V = _to_matrix(t.column("embedding"))
        signs = (H @ V.T) > 0  # (nbits, n)
        weights = (1 << np.arange(nbits)).astype(np.int64)
        buckets = (signs.astype(np.int64).T @ weights).astype(np.int64)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )

    return fn
