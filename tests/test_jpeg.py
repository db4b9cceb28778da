"""Baseline JPEG codec (grawler_ray/functions/jpeg.py) + the REAL
multimodal JPEG stages.

Conformance anchors are INDEPENDENT of the codec: tiny streams are
hand-assembled byte-by-byte in the tests (trivial Huffman tables whose
canonical codes are derived by hand) and the expected pixels come from
the T.81 reconstruction formula written out directly here — so a
transposed IDCT, a zigzag slip, a dequant-order bug or a broken EXTEND
would all fail against spec math, not against the codec's own encoder.
"""

import struct

import numpy as np
import pytest

from grawler_ray.functions.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
    jpeg_meta,
)
from grawler_ray.functions.png import resize_box

SF = "/root/testdata/sf0.001"

_ZZ = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _spec_idct(F):
    """T.81 A.3.3 reconstruction, written straight from the spec."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _handmade_jpeg(scan_bytes: bytes, ac_symbol: int = 0x01, q: int = 16) -> bytes:
    """8x8 grayscale stream with quant table = q everywhere and TRIVIAL
    hand-derived canonical Huffman tables:
      DC: two codes of length 1 -> '0'=category 0, '1'=category 2
      AC: two codes of length 1 -> '0'=EOB (0x00), '1'=``ac_symbol``
    (the run/size byte is high-nibble run, low-nibble size: 0x01 =
    (run 0, size 1); 0x11 = (run 1, size 1))."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([q] * 64))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    dc_counts = [2] + [0] * 15
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes([0, 2]))
    ac_counts = [2] + [0] * 15
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes([0x00, ac_symbol]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan_bytes
    out += b"\xff\xd9"
    return bytes(out)


class TestSpecAnchors:
    def test_dc_only_block_matches_spec_formula(self):
        # bits: DC cat-2 code '1', magnitude bits '11' (EXTEND(3,2)=3),
        # AC EOB '0' -> '1110' + 1-padding = 0xEF
        img = decode_jpeg(_handmade_jpeg(bytes([0xEF])))
        F = np.zeros((8, 8))
        F[0, 0] = 3 * 16  # dequantized DC
        exp = np.clip(np.round(_spec_idct(F) + 128), 0, 255).astype(np.uint8)
        assert img.shape == (8, 8)
        assert (img == exp).all()
        assert (exp == exp[0, 0]).all()  # DC-only really is flat

    def test_single_ac_coefficient_pins_orientation(self):
        # bits: DC cat-0 '0'; AC code '1' = (run 0, size 1) + value bit
        # '1' -> coefficient at ZIGZAG position 1 = natural (row 0,
        # col 1) = the FIRST HORIZONTAL frequency; EOB '0' -> '0110' +
        # 1-padding = 0x6F
        img = decode_jpeg(_handmade_jpeg(bytes([0x6F]), ac_symbol=0x01))
        F = np.zeros((8, 8))
        F[0, 1] = 1 * 16
        exp = np.clip(np.round(_spec_idct(F) + 128), 0, 255).astype(np.uint8)
        assert (img == exp).all()
        # orientation: rows identical, columns vary — a transposed IDCT
        # or a zigzag slip would flip this
        assert (img == img[0:1, :]).all()
        assert not (img == img[:, 0:1]).all()

    def test_vertical_ac_coefficient_and_run_skip(self):
        # same bits, AC symbol 0x11 = (run 1, size 1): skips one zero
        # then writes ZIGZAG position 2 = natural (row 1, col 0) — the
        # first VERTICAL frequency, and the run-length path
        img = decode_jpeg(_handmade_jpeg(bytes([0x6F]), ac_symbol=0x11))
        F = np.zeros((8, 8))
        F[1, 0] = 1 * 16
        exp = np.clip(np.round(_spec_idct(F) + 128), 0, 255).astype(np.uint8)
        assert (img == exp).all()
        assert (img == img[:, 0:1]).all()
        assert not (img == img[0:1, :]).all()


class TestCodec:
    def test_flat_images_near_exact(self):
        for v in (0, 77, 130, 255):
            a = np.full((24, 17), v, np.uint8)
            d = decode_jpeg(encode_jpeg(a, quality=90))
            assert d.shape == a.shape
            assert np.abs(d.astype(int) - v).max() <= 1
        c = np.zeros((10, 9, 3), np.uint8)
        c[:] = [200, 60, 90]
        d = decode_jpeg(encode_jpeg(c, quality=95))
        assert np.abs(d.astype(int) - [200, 60, 90]).max() <= 3

    @pytest.mark.parametrize("quality,tol", [(95, 6), (90, 9), (75, 20)])
    def test_smooth_roundtrip(self, quality, tol):
        xx, yy = np.meshgrid(np.arange(40), np.arange(28))
        img = np.stack(
            [(xx * 2 + yy) % 200, (xx + yy) % 180, (150 - xx) % 160], -1
        ).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(img, quality=quality))
        assert np.abs(d.astype(int) - img.astype(int)).max() <= tol

    def test_subsampled_roundtrip(self):
        xx, yy = np.meshgrid(np.arange(37), np.arange(22))
        img = np.stack([xx * 3 % 220, yy * 4 % 210, (xx + yy) % 190], -1).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
        assert d.shape == img.shape
        # chroma is half-res: compare in luma where precision holds
        ly = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        dy = 0.299 * d[..., 0] + 0.587 * d[..., 1] + 0.114 * d[..., 2]
        assert np.abs(ly - dy).max() <= 12

    def test_restart_interval_stream_equals_plain(self):
        xx, yy = np.meshgrid(np.arange(33), np.arange(19))
        g = ((xx * 5 + yy * 2) % 256).astype(np.uint8)
        plain = decode_jpeg(encode_jpeg(g, 92))
        rst = decode_jpeg(encode_jpeg(g, 92, restart_interval=1))
        assert (plain == rst).all()

    def test_meta_without_entropy_decode(self):
        a = np.zeros((13, 29, 3), np.uint8)
        assert jpeg_meta(encode_jpeg(a)) == (29, 13, 3)
        assert jpeg_meta(encode_jpeg(a[:, :, 0])) == (29, 13, 1)

    def test_rejections(self):
        with pytest.raises(JpegError, match="SOI"):
            decode_jpeg(b"not a jpeg at all")
        # progressive SOF2 rejected with a clear error
        out = bytearray(b"\xff\xd8")
        out += _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        with pytest.raises(JpegError, match="progressive|SOF"):
            decode_jpeg(bytes(out))
        with pytest.raises(JpegError):
            decode_jpeg(encode_jpeg(np.zeros((8, 8), np.uint8))[:30])


class TestRealStages:
    def test_decode_meta_matches_serial(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import (
            decode_jpeg_meta,
            synth_pixels,
            to_jpeg_payload_batch,
        )
        import pyarrow as pa

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            decode_jpeg_meta(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got["format"] == "jpeg").all()
        for _, r in got.sample(15, random_state=0).iterrows():
            px = synth_pixels(int(r.doc_id))
            h, w = px.shape[:2]
            c = 1 if px.ndim == 2 else 3  # alpha dropped on JPEG synth
            assert (r.width, r.height, r.channels) == (w, h, c)
            # serial oracle: decode the same payload outside Ray
            t = pa.table({"doc_id": pa.array([int(r.doc_id)], pa.int64())})
            payload = to_jpeg_payload_batch(t).column("payload")[0].as_py()
            dec = decode_jpeg(payload)
            assert r.px_mean_milli == int(dec.sum(dtype=np.int64)) * 1000 // dec.size
            # lossy but close: decoded mean near the source mean
            src_mean = (px[:, :, :3] if px.ndim == 3 else px).mean()
            assert abs(r.px_mean_milli / 1000.0 - src_mean) < 6.0

    def test_resize_matches_serial(self, ray_session):
        import ray.data
        import pyarrow as pa

        from grawler_ray.stages.multimodal import resize_jpeg, to_jpeg_payload_batch

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            resize_jpeg(docs, width=16, height=12)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got.width == 16).all() and (got.height == 12).all()
        assert (got.n_bytes_out > 0).all()
        for _, r in got.sample(15, random_state=1).iterrows():
            t = pa.table({"doc_id": pa.array([int(r.doc_id)], pa.int64())})
            payload = to_jpeg_payload_batch(t).column("payload")[0].as_py()
            ref = decode_jpeg(
                encode_jpeg(resize_box(decode_jpeg(payload), 16, 12), quality=90)
            )
            assert r.px_mean_milli == int(ref.sum(dtype=np.int64)) * 1000 // ref.size


class TestMjpegDefaultTables:
    """MJPEG streams legitimately omit DHT segments: the decoder must
    supply the Annex K.3 typical tables.  Our encoder emits exactly
    those tables, so a DHT-stripped stream must decode bit-identically."""

    @staticmethod
    def _strip_dht(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0xC4:
                seglen = int.from_bytes(data[i + 2 : i + 4], "big")
                i += 2 + seglen
                continue
            out.append(data[i])
            i += 1
        return bytes(out)

    @pytest.mark.parametrize("mode", ["rgb", "subsampled", "gray"])
    def test_dhtless_decodes_identically(self, mode):
        y, x = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
        img = np.stack(
            [(2 * y + 3 * x) % 256, (y + x) % 256, (3 * y) % 256], -1
        ).astype(np.uint8)
        if mode == "gray":
            j = encode_jpeg(img[:, :, 0], quality=90)
        elif mode == "subsampled":
            j = encode_jpeg(img, quality=90, subsample=True)
        else:
            j = encode_jpeg(img, quality=95)
        assert np.array_equal(decode_jpeg(self._strip_dht(j)), decode_jpeg(j))

    def test_dhtless_avi_frames_decode(self):
        from grawler_ray.functions.avi import decode_avi, encode_avi

        y, x = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        frames = [
            np.stack([(y * k) % 256, (x * k) % 256, (y + x) % 256], -1).astype(
                np.uint8
            )
            for k in range(1, 4)
        ]
        avi = bytearray(encode_avi(frames, fps=10, quality=92))
        # strip DHT inside every movi frame chunk (true MJPEG shape);
        # chunk sizes change, so rebuild via the codec's own walker
        from grawler_ray.functions.avi import _iter_video_chunks

        jpegs = [self._strip_dht(f) for f in _iter_video_chunks(bytes(avi))]
        import struct as _s

        def chunk(cc, body):
            return cc + _s.pack("<I", len(body)) + body + (
                b"\x00" if len(body) & 1 else b""
            )

        base = bytes(avi)
        hdrl_start = base.index(b"LIST", 12)
        hdrl_size = _s.unpack_from("<I", base, hdrl_start + 4)[0]
        hdrl = base[hdrl_start : hdrl_start + 8 + hdrl_size + (hdrl_size & 1)]
        movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", j) for j in jpegs))
        payload = b"AVI " + hdrl + movi
        mj = b"RIFF" + _s.pack("<I", len(payload)) + payload
        dec = decode_avi(mj)
        ref = decode_avi(bytes(avi))
        assert len(dec) == 3
        for d, r in zip(dec, ref):
            assert np.array_equal(d["image"], r["image"])

    def test_missing_qt_is_typed_error(self):
        img = np.full((8, 8), 100, np.uint8)
        j = bytearray(encode_jpeg(img, quality=90))
        # strip DQT (FFDB) segments: decode must fail with JpegError
        out = bytearray()
        i = 0
        while i < len(j):
            if j[i] == 0xFF and i + 1 < len(j) and j[i + 1] == 0xDB:
                seglen = int.from_bytes(j[i + 2 : i + 4], "big")
                i += 2 + seglen
                continue
            out.append(j[i])
            i += 1
        with pytest.raises(JpegError):
            decode_jpeg(bytes(out))
