"""Perceptual image hashing over REAL decoded pixels — the image leg of
near-duplicate detection (multimodal dedup is a first-class
training-data operation: re-encoded / brightness-shifted / lightly
edited copies of one image should collapse like near-dup text).

dHash (difference hash): decode -> grayscale -> exact box-average
resample to 9x8 (``functions/png.resize_box`` — the same deterministic
kernel the resize stage uses) -> 64 horizontal gradient signs.
Constant brightness shifts and uniform rescales leave every gradient
sign unchanged, so those edits hash IDENTICALLY; small local edits flip
few bits.  Pairing reuses the exact Manku block machinery of
``dedup.simhash_pairs`` (pigeonhole over ``max_hamming + 1`` blocks —
an EXACT Hamming-neighbor plan, not approximate), via its pluggable
``sig_fn``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .gif import GifError, decode_gif
from .jpeg import JpegError, decode_jpeg
from .png import PngError, decode_png, resize_box


def dhash64(img: np.ndarray) -> int:
    """uint8 image (h, w[, c]) -> 64-bit dHash (row-major gradient
    signs over a 9x8 box-average thumbnail)."""
    a = np.asarray(img, np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    g = resize_box(a.astype(np.uint8), 9, 8).astype(np.int32)
    if g.ndim == 3:  # resize_box preserves a channel axis for 3-D input
        g = g[:, :, 0]
    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def decode_any_image(payload: bytes) -> np.ndarray | None:
    """PNG/JPEG/GIF payload -> pixels, None when corrupt/unknown."""
    p = payload or b""
    try:
        if p.startswith(b"\x89PNG"):
            return decode_png(p)
        if p.startswith(b"\xff\xd8\xff"):
            return decode_jpeg(p)
        if p.startswith(b"GIF8"):
            return decode_gif(p, max_frames=1)[0]["image"]
    except (PngError, JpegError, GifError):
        return None
    return None


def dhash_batch(t: pa.Table) -> pa.Table:
    """(doc_id, payload) -> (doc_id, simhash) in the signed-int64
    storage convention dedup.simhash_pairs expects; undecodable
    payloads drop out of the pairing entirely."""
    ids, sigs = [], []
    for doc_id, p in zip(
        t.column("doc_id").to_pylist(), t.column("payload").to_pylist()
    ):
        img = decode_any_image(p)
        if img is None:
            continue
        ids.append(doc_id)
        sigs.append(np.int64(dhash64(img) - (1 << 63)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(sigs, pa.int64()),
        }
    )


def image_dhash_pairs(payload_ds, max_hamming: int = 3, **kw):
    """Near-duplicate image pairs over a (doc_id, payload) Dataset:
    real decode -> dHash -> exact Manku Hamming pairing.  Returns
    (a, b, hamming) with hamming <= max_hamming."""
    from .dedup import simhash_pairs

    return simhash_pairs(
        payload_ds, max_hamming=max_hamming, sig_fn=dhash_batch, **kw
    )
