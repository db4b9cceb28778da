"""GIF decoder (grawler_ray/functions/gif.py) + the REAL animation
frame-sampling stage.  Hand-built streams pin interlacing, transparency
and disposal composition against byte-level expectations; roundtrips
pin the LZW pair (exact for <=256-color frames); the Ray stage is
checked against a serial decode of the same synthesized payloads.
"""

import struct

import numpy as np
import pytest

from grawler_ray.functions.gif import (
    GifError,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_meta,
)

SF = "/root/testdata/sf0.001"


def _raw_gif(w, h, blocks, gct=None, bg=0):
    """Assemble a GIF from raw block bytes (for disposal/transparency
    corners the encoder doesn't emit)."""
    packed = 0
    body = b""
    if gct is not None:
        n = len(gct) // 3
        bits = max(1, (n - 1).bit_length())
        packed = 0x80 | (bits - 1)
        body = gct + bytes(3 * ((2 << (bits - 1)) - n))
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h) + bytes([packed, bg, 0])
    out += body
    for b in blocks:
        out += b
    out += b"\x3b"
    return bytes(out)


def _image_block(x, y, w, h, indices, pal=None, interlaced=False, min_code=2):
    flags = 0
    body = b""
    if pal is not None:
        n = len(pal) // 3
        bits = max(1, (n - 1).bit_length())
        flags |= 0x80 | (bits - 1)
        body = pal + bytes(3 * ((2 << (bits - 1)) - n))
    if interlaced:
        flags |= 0x40
    out = bytearray(b"\x2c") + struct.pack("<HHHH", x, y, w, h) + bytes([flags])
    out += body
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, np.asarray(indices, np.uint8).reshape(-1))
    for i in range(0, len(lzw), 255):
        c = lzw[i : i + 255]
        out += bytes([len(c)]) + c
    out += b"\x00"
    return bytes(out)


def _gce(disposal=0, transparent=None, delay_cs=0):
    flags = (disposal & 0x7) << 2
    t = 0
    if transparent is not None:
        flags |= 1
        t = transparent
    return b"\x21\xf9\x04" + bytes([flags]) + struct.pack("<H", delay_cs) + bytes([t, 0])


class TestCodec:
    def test_exact_roundtrip_few_colors(self):
        rng = np.random.RandomState(0)
        a = (rng.randint(0, 8, (13, 17, 3)) * 32).astype(np.uint8)
        fr = decode_gif(encode_gif(a))
        assert len(fr) == 1
        assert (fr[0]["image"] == a).all()
        assert gif_meta(encode_gif(a)) == (17, 13, 1)

    def test_multiframe_roundtrip_and_delays(self):
        rng = np.random.RandomState(1)
        frames = [
            (rng.randint(0, 4, (9, 11, 3)) * 80).clip(0, 255).astype(np.uint8)
            for _ in range(4)
        ]
        g = encode_gif(frames, delay_ms=50)
        out = decode_gif(g)
        assert len(out) == 4
        for f, o in zip(frames, out):
            assert (o["image"] == f).all()
            assert o["delay_ms"] == 50
        assert gif_meta(g) == (11, 9, 4)
        assert len(decode_gif(g, max_frames=2)) == 2

    def test_many_colors_quantize_bounded(self):
        rng = np.random.RandomState(2)
        big = rng.randint(0, 256, (20, 30, 3)).astype(np.uint8)
        o = decode_gif(encode_gif(big))[0]["image"]
        assert np.abs(o.astype(int) - big.astype(int)).max() <= 48

    def test_interlaced_rows_reordered(self):
        pal = bytes([255, 0, 0, 0, 0, 255])
        rows = np.array(
            [[0, 0, 0, 0], [1, 1, 1, 1], [0, 1, 0, 1], [1, 0, 1, 0]], np.uint8
        )
        # storage order for h=4: pass 1 row 0, pass 3 row 2, pass 4 rows 1,3
        stored = np.vstack([rows[0], rows[2], rows[1], rows[3]])
        g = _raw_gif(4, 4, [_image_block(0, 0, 4, 4, stored, pal, interlaced=True)])
        out = decode_gif(g)[0]["image"]
        exp = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)[rows]
        assert (out == exp).all()

    def test_transparency_composes_over_previous(self):
        pal = bytes([10, 10, 10, 200, 0, 0, 0, 200, 0])
        base = np.full((2, 2), 1, np.uint8)  # all red
        # second frame: index 2 (green) top-left, transparent elsewhere
        over = np.array([[2, 0], [0, 0]], np.uint8)
        g = _raw_gif(
            2, 2,
            [
                _image_block(0, 0, 2, 2, base, pal),
                _gce(disposal=1, transparent=0, delay_cs=5),
                _image_block(0, 0, 2, 2, over, pal),
            ],
        )
        out = decode_gif(g)
        assert len(out) == 2
        f2 = out[1]["image"]
        assert (f2[0, 0] == [0, 200, 0]).all()      # painted
        assert (f2[0, 1] == [200, 0, 0]).all()      # transparent -> kept
        assert out[1]["delay_ms"] == 50

    def test_disposal_restore_background(self):
        gct = bytes([5, 5, 5, 200, 0, 0, 0, 200, 0, 0, 0, 0])
        full = np.full((2, 2), 1, np.uint8)       # red frame
        dot = np.full((1, 1), 2, np.uint8)        # green top-left
        g = _raw_gif(
            2, 2,
            [
                _gce(disposal=2),                  # restore-bg after frame 1
                _image_block(0, 0, 2, 2, full),
                _image_block(0, 0, 1, 1, dot),
            ],
            gct=gct, bg=0,
        )
        out = decode_gif(g)
        assert (out[0]["image"] == [200, 0, 0]).all()
        f2 = out[1]["image"]
        assert (f2[0, 0] == [0, 200, 0]).all()     # the new dot
        # the disposed region fell back to the background color (index 0)
        assert (f2[1, 1] == [5, 5, 5]).all()

    def test_disposal_restore_previous(self):
        gct = bytes([5, 5, 5, 200, 0, 0, 0, 200, 0, 0, 0, 0])
        full = np.full((2, 2), 1, np.uint8)
        dot = np.full((1, 1), 2, np.uint8)
        g = _raw_gif(
            2, 2,
            [
                _image_block(0, 0, 2, 2, full),
                _gce(disposal=3),                  # restore-previous
                _image_block(0, 0, 1, 1, dot),
                _image_block(0, 0, 1, 1, np.full((1, 1), 0, np.uint8)),
            ],
            gct=gct, bg=0,
        )
        out = decode_gif(g)
        assert len(out) == 3
        # frame 3 paints over the RESTORED frame-1 canvas: (0,0) is index 0
        assert (out[2]["image"][0, 0] == [5, 5, 5]).all()
        assert (out[2]["image"][1, 1] == [200, 0, 0]).all()

    def test_rejections(self):
        with pytest.raises(GifError, match="signature"):
            decode_gif(b"PNG not a gif")
        a = np.zeros((4, 4, 3), np.uint8)
        for cut in (20, 30, 40):
            with pytest.raises(GifError):
                decode_gif(encode_gif(a)[:cut])


class TestRealStages:
    def test_gif_meta_stage(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import (
            DecodeImageMeta,
            synth_gif,
            to_gif_payload_batch,
        )

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            docs.map_batches(to_gif_payload_batch, batch_format="pyarrow")
            .map_batches(
                DecodeImageMeta,
                batch_format="pyarrow",
                concurrency=2,
                fn_constructor_kwargs={"real_decode": True},
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got["format"] == "gif").all()
        for _, r in got.sample(15, random_state=0).iterrows():
            first = decode_gif(synth_gif(int(r.doc_id)), max_frames=1)[0]["image"]
            assert (r.width, r.height, r.channels) == (
                first.shape[1], first.shape[0], 3
            )
            assert r.px_mean_milli == int(first.sum(dtype=np.int64)) * 1000 // first.size

    def test_gif_frames_stage_vs_serial(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import sample_gif_frames, synth_gif

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            sample_gif_frames(docs, stride=2)
            .to_pandas()
            .sort_values(["doc_id", "frame_idx"])
            .reset_index(drop=True)
        )
        # every doc contributes ceil(n_frames/2) rows with true stats
        sample_ids = got.doc_id.drop_duplicates().sample(10, random_state=1)
        for doc_id in sample_ids:
            fr = decode_gif(synth_gif(int(doc_id)))
            sub = got[got.doc_id == doc_id]
            assert sub.frame_idx.tolist() == list(range(0, len(fr), 2))
            for _, r in sub.iterrows():
                img = fr[int(r.frame_idx)]["image"]
                assert r.px_mean_milli == int(img.sum(dtype=np.int64)) * 1000 // img.size
                assert r.delay_ms == 40
        # the sampled frame payloads are lossless PNGs of the frames
        from grawler_ray.functions.png import decode_png
        from grawler_ray.stages.multimodal import to_gif_payload_batch  # noqa: F401

        full = (
            sample_gif_frames(docs.limit(5), stride=2)
            .to_pandas()
            .sort_values(["doc_id", "frame_idx"])
        )
        for _, r in full.iterrows():
            fr = decode_gif(synth_gif(int(r.doc_id)))
            assert (decode_png(r.frame_png) == fr[int(r.frame_idx)]["image"]).all()
