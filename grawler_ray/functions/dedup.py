"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard).

First-class training-data-pipeline components (not in the 931-LoC reference,
whose only dedup is the exact URL-seen set, src/crawler.go:178/191 — D1 in
SURVEY §2.7).  Standard constructions from the published literature:
- MinHash/LSH: Broder '97; banding analysis as in Leskovec-Rajaraman-Ullman,
  "Mining of Massive Datasets" ch.3.
- SimHash: Charikar '02 / Manku et al. WWW'07.

Scale shape: signatures are computed embarrassingly parallel in
``map_batches``; candidate generation is a groupby on (band, band-hash) — an
all-to-all on SMALL keys only (16 ints per doc, never the text); pair
verification re-reads only candidate docs.  Exact dedup is one groupby on a
16-byte hash.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..textops import _WORD_RE
from ..urlops import xxhash64

_MERSENNE = (1 << 61) - 1


def shingles(text: str, k: int = 3) -> set[int]:
    """xxhash64 of word k-grams (lowercased ASCII tokens)."""
    toks = _WORD_RE.findall((text or "").lower())
    if len(toks) < k:
        return {xxhash64(" ".join(toks))} if toks else set()
    return {xxhash64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide MinHash signature via (a*x+b) mod Mersenne61, vectorized
    over the shingle set."""
    if not sh:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(sh, dtype=np.uint64)
    # (a[:,None]*x + b[:,None]) % M  — uint64 wrap-around is fine for hashing
    # but we mod a Mersenne prime for uniformity using object-free arithmetic:
    prod = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def minhash_batch(num_perm: int = 128, seed: int = 1):
    a, b = _perm_params(num_perm, seed)

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        sigs = [
            minhash_signature(shingles(txt), a, b).tolist()
            for txt in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.uint64())),
            }
        )

    return fn


def lsh_band_explode(num_bands: int = 16):
    """Signature -> (band, band_hash, doc_id) rows; the groupby key."""

    def fn(t: pa.Table) -> pa.Table:
        bands, bhashes, ids = [], [], []
        for doc_id, sig in zip(t.column("doc_id").to_pylist(), t.column("sig").to_pylist()):
            rows_per_band = len(sig) // num_bands
            for bi in range(num_bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                h = xxhash64(",".join(map(str, chunk)))
                bands.append(bi)
                bhashes.append(np.int64(h - (1 << 63)))  # signed for arrow
                ids.append(doc_id)
        return pa.table(
            {
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(bhashes, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    return fn


def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """groupby(band, band_hash): emit candidate pairs (a < b)."""
    ids = sorted(df["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
    pairs = list(combinations(ids, 2))
    return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})


def jaccard(s1: set[int], s2: set[int]) -> float:
    if not s1 and not s2:
        return 1.0
    u = len(s1 | s2)
    return len(s1 & s2) / u if u else 0.0


def minhash_dedup(docs_ds, threshold: float = 0.8, num_perm: int = 128, num_bands: int = 16):
    """Full MinHash+LSH near-dup pipeline over a documents Dataset:
    signatures -> band explode -> bucket groupby -> candidate pairs ->
    exact-Jaccard verification on the candidates only.

    Returns a Dataset of (a, b, jaccard) verified pairs.  The verification
    join broadcasts only the candidate docs' shingle sets (candidates are a
    tiny fraction of the corpus by construction).
    """
    import ray
    import ray.data  # noqa: F401

    sigs = docs_ds.map_batches(minhash_batch(num_perm), batch_format="pyarrow")
    cand = (
        sigs.map_batches(lsh_band_explode(num_bands), batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand_pd = cand.to_pandas().drop_duplicates().reset_index(drop=True)
    if len(cand_pd) == 0:
        return ray.data.from_items([])
    cand_ids = sorted(set(cand_pd["a"]) | set(cand_pd["b"]))

    # shingle sets for candidate docs only (broadcast)
    def shingle_batch(t: pa.Table) -> pa.Table:
        keep = [i for i, d in enumerate(t.column("doc_id").to_pylist()) if d in cand_set]
        sub = t.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "doc_id": sub.column("doc_id"),
                "sh": pa.array(
                    [sorted(shingles(x)) for x in sub.column("text").to_pylist()],
                    pa.list_(pa.uint64()),
                ),
            }
        )

    cand_set = set(cand_ids)
    sh_tab = docs_ds.map_batches(shingle_batch, batch_format="pyarrow").to_pandas()
    sh_map = {d: set(s) for d, s in zip(sh_tab["doc_id"], sh_tab["sh"])}
    sh_ref = ray.put(sh_map)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(sh_ref)
        js = [jaccard(m[a], m[b]) for a, b in zip(df["a"], df["b"])]
        df = df.copy()
        df["jaccard"] = js
        return df[df["jaccard"] >= threshold]

    return ray.data.from_pandas(cand_pd).map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """Charikar SimHash over word features weighted by frequency."""
    from ..textops import words_freq

    acc = np.zeros(64, dtype=np.int64)
    for w, f in words_freq(text or "").items():
        h = xxhash64(w)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), f, -f)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "simhash": pa.array(
                [np.int64(simhash64(x) - (1 << 63)) for x in t.column("text").to_pylist()],
                pa.int64(),
            ),
        }
    )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_hash_batch(t: pa.Table) -> pa.Table:
    """(doc_id, text_hash=md5 hex) — matches DuckDB md5(text)."""
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "text_hash": pa.array(
                [hashlib.md5((x or "").encode()).hexdigest() for x in t.column("text").to_pylist()],
                pa.string(),
            ),
        }
    )


def exact_dedup_group(df: pd.DataFrame) -> pd.DataFrame:
    """groupby(text_hash): keep min doc_id, count the group."""
    return pd.DataFrame(
        {
            "text_hash": [df["text_hash"].iloc[0]],
            "keep_doc_id": [int(df["doc_id"].min())],
            "n_dups": [len(df)],
        }
    )
