"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns; decode / feature-extract run
as actor-pool ``map_batches`` stages with small batch sizes (payloads are
large — batch_size x concurrency must fit the worker heap).  The decode
libraries are NOT in this container, so the decode kernel is STUBBED: the
Ray-side plumbing (schema, batch sizing, actor signature, deterministic
output layout) is real and tested; ``real_decode=True`` raises
NotImplementedError exactly where a PIL/ffmpeg call would go.
"""

from __future__ import annotations

import pyarrow as pa


class DecodeImageMeta:
    """Actor-pool stage: binary payload -> (n_bytes, width, height, format).

    Fake-decode derives deterministic dims from the byte length only, so the
    DuckDB oracle can reproduce it with octet_length arithmetic.
    """

    def __init__(self, real_decode: bool = False):
        # real path would do: from PIL import Image  (once per actor)
        self.real_decode = real_decode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real_decode:
            raise NotImplementedError(
                "image decode libs are not available in this environment; "
                "plug PIL/turbojpeg here (load once per actor in __init__)"
            )
        payloads = t.column("payload").to_pylist()
        n = [len(p or b"") for p in payloads]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bytes": pa.array(n, pa.int64()),
                "width": pa.array([x % 640 + 16 for x in n], pa.int64()),
                "height": pa.array([x % 480 + 16 for x in n], pa.int64()),
                "format": pa.array(["fake" for _ in n], pa.string()),
            }
        )


def to_payload_batch(t: pa.Table) -> pa.Table:
    """Test shim: documents.text utf-8 bytes as the opaque binary payload."""
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "payload": pa.array(
                [(x or "").encode("utf-8") for x in t.column("text").to_pylist()],
                pa.binary(),
            ),
        }
    )


def decode_image_meta(docs_ds, batch_size: int = 256, concurrency=2):
    """The wired stage: payload column -> metadata, actor pool, small batches."""
    return docs_ds.map_batches(to_payload_batch, batch_format="pyarrow").map_batches(
        DecodeImageMeta,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"real_decode": False},
    )


class ResizeImage:
    """Actor-pool resize stage: payload -> resized payload + target dims.

    Real path (``real_resize=True``) is where a PIL ``Image.resize`` goes —
    loaded once per actor in __init__, applied per batch.  The STUB kernel
    deterministically truncates the payload to ``min(n_bytes, w*h)`` bytes so
    the byte-accounting (and the DuckDB oracle) stays exact while the
    Ray-side plumbing — actor pool, constructor args, binary in/out schema,
    small batches — is the real thing.
    """

    def __init__(self, width: int, height: int, real_resize: bool = False):
        self.width = width
        self.height = height
        self.real_resize = real_resize

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real_resize:
            raise NotImplementedError(
                "image libs are not available in this environment; plug "
                "PIL.Image.resize here (import once per actor in __init__)"
            )
        cap = self.width * self.height
        payloads = [(p or b"")[:cap] for p in t.column("payload").to_pylist()]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([self.width] * t.num_rows, pa.int64()),
                "height": pa.array([self.height] * t.num_rows, pa.int64()),
                "n_bytes_out": pa.array([len(p) for p in payloads], pa.int64()),
            }
        )


def resize_image(docs_ds, width: int = 64, height: int = 48, batch_size: int = 128, concurrency=2):
    """payload -> resized payload; actor pool with constructor-arg dims."""
    return docs_ds.map_batches(to_payload_batch, batch_format="pyarrow").map_batches(
        ResizeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"width": width, "height": height},
    )


def sample_frames(docs_ds, frame_size: int = 1024, stride: int = 4, batch_size: int = 64):
    """Video-style frame sampling: the payload is treated as a sequence of
    ``frame_size``-byte frames; every ``stride``-th frame is emitted as its
    own row (doc_id, frame_idx, frame, frame_len).  The chunking/explode
    plumbing is real (real bytes move); a real decoder would replace the
    byte-slice with an ffmpeg keyframe read.  Small batches: the explode
    multiplies payload bytes held per task."""

    def fn(t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for doc_id, p in zip(t.column("doc_id").to_pylist(), t.column("payload").to_pylist()):
            p = p or b""
            nframes = (len(p) + frame_size - 1) // frame_size
            for fi in range(0, nframes, stride):
                ids.append(doc_id)
                idxs.append(fi)
                frames.append(p[fi * frame_size : (fi + 1) * frame_size])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
                "frame_len": pa.array([len(f) for f in frames], pa.int64()),
            }
        )

    return docs_ds.map_batches(to_payload_batch, batch_format="pyarrow").map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size
    )


class ExtractByteFeatures:
    """Feature-extraction stage: payload -> fixed-width feature vector.
    The STUB kernel computes a 16-bin byte-value histogram (deterministic,
    vectorized) where a real model (CLIP/whisper embedding) would run —
    batched inference shape: model load once per actor, one forward pass
    per batch."""

    def __init__(self, bins: int = 16, real_model: bool = False):
        self.bins = bins
        self.real_model = real_model

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real_model:
            raise NotImplementedError(
                "no model runtime in this environment; load the encoder here "
                "(once per actor) and replace the histogram with its forward pass"
            )
        import numpy as np

        feats = []
        width = 256 // self.bins
        for p in t.column("payload").to_pylist():
            arr = np.frombuffer(p or b"", dtype=np.uint8)
            hist = np.bincount(arr // width, minlength=self.bins)[: self.bins]
            feats.append(hist.astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "features": pa.array(feats, pa.list_(pa.int64())),
            }
        )


def extract_features(docs_ds, bins: int = 16, batch_size: int = 256, concurrency=2):
    return docs_ds.map_batches(to_payload_batch, batch_format="pyarrow").map_batches(
        ExtractByteFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"bins": bins},
    )
