"""Multimodal stage plumbing: binary payload schemas, actor-pool wiring,
deterministic stub kernels, and the real-kernel NotImplementedError gates."""

import numpy as np
import pyarrow as pa
import pytest

from grawler_ray.stages.multimodal import (
    DecodeImageMeta,
    ExtractByteFeatures,
    ResizeImage,
)


def _payload_table():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([b"x" * 5000, b"", b"ab" * 700], pa.binary()),
        }
    )


def test_decode_meta_stub_deterministic():
    out = DecodeImageMeta()(_payload_table())
    assert out.column_names == ["doc_id", "n_bytes", "width", "height", "format"]
    assert out.column("n_bytes").to_pylist() == [5000, 0, 1400]
    assert out.column("width").to_pylist() == [5000 % 640 + 16, 16, 1400 % 640 + 16]


def test_decode_meta_real_path_reports_non_images():
    # real decode never raises on arbitrary bytes: PNG and JPEG decode
    # for real (tests/test_png.py, test_jpeg.py), truncated image
    # streams report format="corrupt", plain bytes format="unknown"
    out = DecodeImageMeta(real_decode=True)(_payload_table())
    assert out.column("format").to_pylist() == ["unknown"] * 3
    assert out.column("width").to_pylist() == [0, 0, 0]


def test_resize_stub_truncates_to_dims():
    out = ResizeImage(width=10, height=10)(_payload_table())
    assert out.column("n_bytes_out").to_pylist() == [100, 0, 100]
    assert out.column("payload").to_pylist()[0] == b"x" * 100
    # real resize passes non-image payloads through as empty bytes
    real = ResizeImage(4, 4, real_resize=True)(_payload_table())
    assert real.column("n_bytes_out").to_pylist() == [0, 0, 0]


def test_byte_features_histogram():
    out = ExtractByteFeatures(bins=16)(_payload_table())
    f1 = out.column("features").to_pylist()[0]
    assert len(f1) == 16
    assert sum(f1) == 5000
    assert f1[ord("x") // 16] == 5000  # all bytes in one bin
    assert sum(out.column("features").to_pylist()[1]) == 0
    with pytest.raises(NotImplementedError):
        ExtractByteFeatures(real_model=True)(_payload_table())


def test_frame_sampling_pipeline(ray_session):
    import ray.data

    from grawler_ray.stages.multimodal import sample_frames

    docs = ray.data.from_items(
        [
            {"doc_id": 1, "text": "a" * 5000},   # 5 frames -> idx 0, 4
            {"doc_id": 2, "text": ""},            # 0 frames
            {"doc_id": 3, "text": "b" * 1024},    # 1 frame -> idx 0
        ]
    )
    out = sample_frames(docs, frame_size=1024, stride=4).to_pandas()
    got = sorted(zip(out.doc_id, out.frame_idx, out.frame_len))
    assert got == [(1, 0, 1024), (1, 4, 5000 - 4 * 1024), (3, 0, 1024)]
    # the frame bytes are the real payload slices
    row = out[(out.doc_id == 1) & (out.frame_idx == 4)].frame.iloc[0]
    assert row == b"a" * (5000 - 4 * 1024)


def test_resize_actor_pool_pipeline(ray_session):
    import ray.data

    from grawler_ray.stages.multimodal import resize_image

    docs = ray.data.from_items([{"doc_id": i, "text": "z" * (i * 1000)} for i in range(5)])
    out = resize_image(docs, width=32, height=16, concurrency=2).to_pandas()
    assert (out.n_bytes_out == np.minimum(out.doc_id * 1000, 32 * 16)).all()
