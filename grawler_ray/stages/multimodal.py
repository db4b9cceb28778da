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
