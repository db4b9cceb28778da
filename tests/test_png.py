"""Pure-stdlib PNG codec + the REAL multimodal decode/resize stages.

The codec (grawler_ray/functions/png.py) is the container's substitute
for PIL: these tests pin roundtrip exactness across every scanline
filter and channel count, palette expansion, spec rejections, the exact
box-average resample, and the Ray actor-pool stages against a serial
numpy oracle built from the same synth_pixels spec.
"""

import struct
import zlib

import numpy as np
import pytest

from grawler_ray.functions.png import (
    PngError,
    _SIG,
    _chunk,
    decode_png,
    encode_png,
    png_meta,
    resize_box,
)

SF = "/root/testdata/sf0.001"


class TestCodec:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize(
        "shape", [(5, 7), (5, 7, 2), (4, 4, 3), (9, 3, 4), (1, 1), (2, 300, 3)]
    )
    def test_roundtrip(self, shape, filter_type):
        rng = np.random.RandomState(hash((shape, filter_type)) % 2**31)
        a = rng.randint(0, 256, shape).astype(np.uint8)
        b = decode_png(encode_png(a, filter_type=filter_type))
        assert b.shape == a.shape
        assert (b == a).all()

    def test_meta_without_inflate(self):
        a = np.zeros((6, 8, 3), np.uint8)
        assert png_meta(encode_png(a)) == (8, 6, 8, 2, 0)
        # gray and RGBA color types
        assert png_meta(encode_png(np.zeros((2, 3), np.uint8)))[3] == 0
        assert png_meta(encode_png(np.zeros((2, 3, 4), np.uint8)))[3] == 6

    def test_palette_expands_to_rgb(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        raw = bytes([0, 0, 1, 0, 2, 0])  # rows [0,1],[2,0], filter 0
        png = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", plte)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        d = decode_png(png)
        assert d.shape == (2, 2, 3)
        assert (d[0, 0] == [255, 0, 0]).all()
        assert (d[0, 1] == [0, 255, 0]).all()
        assert (d[1, 0] == [0, 0, 255]).all()
        assert (d[1, 1] == [255, 0, 0]).all()

    def test_rejections(self):
        a = np.zeros((4, 4), np.uint8)
        with pytest.raises(PngError, match="signature"):
            decode_png(b"GIF89a not a png")
        with pytest.raises(PngError):
            decode_png(encode_png(a)[:40])  # truncated mid-stream
        ih16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
        png16 = (
            _SIG
            + _chunk(b"IHDR", ih16)
            + _chunk(b"IDAT", zlib.compress(b"\0\0\0"))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(PngError, match="bit depth"):
            decode_png(png16)
        ih_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
        png_i = (
            _SIG
            + _chunk(b"IHDR", ih_i)
            + _chunk(b"IDAT", zlib.compress(b"\0" * 6))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(PngError, match="interlac"):
            decode_png(png_i)
        ih_p = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        png_p = (
            _SIG
            + _chunk(b"IHDR", ih_p)
            + _chunk(b"IDAT", zlib.compress(bytes(6)))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(PngError, match="PLTE"):
            decode_png(png_p)

    def test_resize_hand_computed(self):
        a = np.arange(16, dtype=np.uint8).reshape(4, 4)
        exp = np.array([[2, 4], [10, 12]], np.uint8)  # truncating box means
        assert (resize_box(a, 2, 2) == exp).all()

    @pytest.mark.parametrize("shape", [(7, 5), (7, 5, 3), (3, 9, 4)])
    @pytest.mark.parametrize("target", [(2, 3), (5, 7), (10, 4), (1, 1)])
    def test_resize_vs_naive_loop(self, shape, target):
        """Integral-image kernel == the obvious per-output-pixel loop."""
        rng = np.random.RandomState(3)
        a = rng.randint(0, 256, shape).astype(np.uint8)
        w, h = target
        got = resize_box(a, w, h)
        a3 = a if a.ndim == 3 else a[:, :, None]
        H, W = a3.shape[:2]
        for i in range(h):
            y0, y1 = (i * H) // h, max(((i + 1) * H) // h, (i * H) // h + 1)
            for j in range(w):
                x0 = (j * W) // w
                x1 = max(((j + 1) * W) // w, x0 + 1)
                box = a3[y0:y1, x0:x1].reshape(-1, a3.shape[2])
                exp = box.astype(np.int64).sum(0) // box.shape[0]
                gotpx = got[i, j] if got.ndim == 3 else np.array([got[i, j]])
                assert (gotpx == exp.astype(np.uint8)).all()


class TestRealStages:
    def test_decode_meta_vs_synth_oracle(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import decode_png_meta, synth_pixels

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            decode_png_meta(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got["format"] == "png").all()
        for _, r in got.sample(25, random_state=0).iterrows():
            px = synth_pixels(int(r.doc_id))
            h, w = px.shape[:2]
            c = 1 if px.ndim == 2 else px.shape[2]
            assert (r.width, r.height, r.channels) == (w, h, c)
            assert r.px_mean_milli == int(px.sum(dtype=np.int64)) * 1000 // px.size

    def test_resize_vs_synth_oracle(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import resize_png, synth_pixels

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            resize_png(docs, width=16, height=12)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got.width == 16).all() and (got.height == 12).all()
        assert (got.n_bytes_out > 0).all()
        for _, r in got.sample(25, random_state=1).iterrows():
            px = resize_box(synth_pixels(int(r.doc_id)), 16, 12)
            assert r.px_mean_milli == int(px.sum(dtype=np.int64)) * 1000 // px.size

    def test_corrupt_and_unknown_payloads_reported(self, ray_session):
        # a truncated JPEG stream is "corrupt" (never a crash — web
        # corpora are full of these); plain bytes are "unknown"
        import pyarrow as pa

        from grawler_ray.stages.multimodal import DecodeImageMeta, ResizeImage

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array(
                    [b"\xff\xd8\xff\xe0fakejpeg", b"plain text"], pa.binary()
                ),
            }
        )
        out = DecodeImageMeta(real_decode=True)(t)
        assert out.column("format").to_pylist() == ["corrupt", "unknown"]
        assert out.column("width").to_pylist() == [0, 0]
        rs = ResizeImage(4, 4, real_resize=True)(t)
        assert rs.column("n_bytes_out").to_pylist() == [0, 0]
