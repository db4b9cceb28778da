"""MP3 frame-walk + MP4 box-walk metadata parsers
(grawler_ray/functions/mediameta.py) and the REAL media-triage stage.
Fixture writers emit spec-valid framing with closed-form parameters, so
every metadata field is hand-checkable; hand-built byte streams pin the
ID3v2 / Xing / largesize / to-EOF corners; truncations and random bytes
must surface as the typed codec errors."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grawler_ray.functions.mediameta import (
    Mp3Error,
    Mp4Error,
    mp3_meta,
    mp4_meta,
    write_mp3_frames,
    write_mp4,
)

SF = "/root/testdata/sf0.001"


class TestMp3:
    @pytest.mark.parametrize(
        "n,br,sr,ch,layer,spf",
        [
            (100, 128, 44100, 2, 3, 1152),  # MPEG1 L3
            (40, 64, 22050, 1, 3, 576),  # MPEG2 L3
            (25, 40, 8000, 1, 3, 576),  # MPEG2.5 L3
            (12, 192, 48000, 2, 1, 384),  # MPEG1 L1
            (9, 96, 32000, 2, 2, 1152),  # MPEG1 L2
        ],
    )
    def test_closed_form_fields(self, n, br, sr, ch, layer, spf):
        m = mp3_meta(write_mp3_frames(n, br, sr, ch, layer=layer))
        assert m["n_frames"] == n
        assert m["duration_ms"] == n * spf * 1000 // sr
        assert (m["sample_rate"], m["channels"]) == (sr, ch)
        assert (m["bitrate_kbps"], m["layer"]) == (br, layer)
        assert m["mpeg25"] == (sr == 8000)
        assert not m["vbr"] and m["id3_bytes"] == 0

    def test_id3_skip_and_footer(self):
        m = mp3_meta(write_mp3_frames(5, 128, 44100, 2, id3=b"\xaa" * 300))
        assert m["id3_bytes"] == 310 and m["n_frames"] == 5

    def test_xing_frame_count_agrees(self):
        m = mp3_meta(write_mp3_frames(31, 64, 22050, 1, xing=True))
        assert m["n_frames"] == 31 and m["vbr"]

    def test_xing_mismatch_is_error(self):
        data = bytearray(write_mp3_frames(20, 128, 44100, 2, xing=True))
        # walking fewer frames than Xing claims = truncation signal
        cut = data[: len(data) - 418]  # drop one 417/418-byte frame
        with pytest.raises(Mp3Error):
            mp3_meta(bytes(cut))

    def test_trailing_garbage_stops_clean(self):
        data = write_mp3_frames(7, 128, 44100, 2) + b"TAG" + b"\x00" * 125
        assert mp3_meta(data)["n_frames"] == 7

    def test_truncated_tail_without_xing_stops_at_last_good(self):
        data = write_mp3_frames(10, 128, 44100, 2)
        assert mp3_meta(data[:-100])["n_frames"] == 9

    def test_errors(self):
        for bad in (
            b"",
            b"\xff\xfb",  # bare header start, truncated
            b"ID3\x04\x00\x00\x00\x00\x00\x05hello",  # tag only
            b"ID3\x04\x00\x00\xff\x00\x00\x05" + b"x" * 40,  # non-syncsafe
            bytes([0xFF, 0xE8, 0x00, 0x00]) + bytes(100),  # reserved version
            bytes([0xFF, 0xFB, 0xF0, 0x00]) + bytes(100),  # bitrate idx 15
            bytes([0xFF, 0xFB, 0x0C, 0x00]) + bytes(100),  # free format
        ):
            with pytest.raises(Mp3Error):
                mp3_meta(bad)

    def test_samplerate_change_mid_stream_is_error(self):
        a = write_mp3_frames(3, 128, 44100, 2)
        b = write_mp3_frames(3, 64, 22050, 1)
        with pytest.raises(Mp3Error):
            mp3_meta(a + b)


class TestMp4:
    def test_closed_form_fields(self):
        m = mp4_meta(write_mp4(2500, 600, 1280, 720, ("vide", "soun"), "mp42"))
        assert m == {
            "brand": "mp42",
            "duration_ms": 2500,
            "timescale": 600,
            "width": 1280,
            "height": 720,
            "track_types": ["soun", "vide"],
        }

    def test_audio_only_and_largesize_mdat(self):
        m = mp4_meta(write_mp4(900, 1000, 0, 0, ("soun",), largesize_mdat=True))
        assert m["track_types"] == ["soun"] and m["duration_ms"] == 900
        assert m["width"] == 0 and m["height"] == 0

    def test_mvhd_v1_64bit_duration(self):
        # hand-build a v1 mvhd: version 1, 64-bit times
        def box(t, b):
            return struct.pack(">I", 8 + len(b)) + t + b

        mvhd = box(
            b"mvhd",
            b"\x01\x00\x00\x00"
            + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 7)
            + bytes(80),
        )
        data = box(b"ftyp", b"isom" + bytes(8)) + box(b"moov", mvhd)
        m = mp4_meta(data)
        assert m["duration_ms"] == 7000 and m["timescale"] == 90000

    def test_to_eof_box_size(self):
        base = write_mp4(1000)
        # append a size-0 (to-EOF) free box — must not break the walk
        data = base + struct.pack(">I", 0) + b"free" + bytes(20)
        assert mp4_meta(data)["duration_ms"] == 1000

    def test_errors(self):
        full = write_mp4(1000)
        for bad in (
            b"",
            b"\x00\x00\x00\x08ftyp",  # ftyp but no moov
            full[:30],
            full[:9],
            # box size smaller than header
            struct.pack(">I", 3) + b"ftyp" + bytes(20),
        ):
            with pytest.raises(Mp4Error):
                mp4_meta(bad)


class TestTriageStage:
    def test_stage_vs_synth_spec(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import media_triage, synth_container

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            media_triage(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) == 500
        for _, r in got.sample(30, random_state=0).iterrows():
            doc_id = int(r.doc_id)
            if doc_id % 17 == 0:
                # planted truncation: mp4 -> corrupt; mp3 -> fewer frames
                if doc_id % 3 == 0:
                    assert r["format"] == "corrupt"
                else:
                    assert r["format"] == "mp3"
                    assert 0 < r.n_frames < 10 + doc_id % 50
            elif doc_id % 3 == 0:
                assert r["format"] == "mp4"
                # ms -> 600 Hz ticks -> ms floors twice
                want = 500 + (doc_id * 13) % 4000
                assert r.duration_ms == want * 600 // 1000 * 1000 // 600
                assert r.width == 320 + (doc_id % 5) * 160
                assert r.height == 240 + (doc_id % 5) * 120
                assert r.track_types == (
                    "soun,vide" if doc_id % 2 == 0 else "vide"
                )
            else:
                spf = 1152 if doc_id % 3 == 1 else 576
                sr = (44100, 22050)[doc_id % 3 - 1]
                n = 10 + doc_id % 50
                assert r["format"] == "mp3"
                assert r.n_frames == n
                assert r.sample_rate == sr
                assert r.bitrate_kbps == (32, 64)[doc_id % 3 - 1]
                assert r.channels == 1 + doc_id % 2
                assert r.duration_ms == n * spf * 1000 // sr

    def test_stage_unknown_payloads(self):
        import pyarrow as pa

        from grawler_ray.stages.multimodal import ExtractContainerMeta

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([b"plain text here", b""], pa.binary()),
            }
        )
        out = ExtractContainerMeta()(t)
        assert out.column("format").to_pylist() == ["unknown", "unknown"]


@given(st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_mp3_random_bytes_raise_mp3error(data):
    try:
        mp3_meta(data)
    except Mp3Error:
        pass


@given(st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_mp4_random_bytes_raise_mp4error(data):
    try:
        mp4_meta(data)
    except Mp4Error:
        pass


@given(st.integers(0, 10_000), st.floats(0.01, 0.99))
@settings(max_examples=80, deadline=None)
def test_truncated_containers_parse_or_raise_typed(doc, frac):
    from grawler_ray.stages.multimodal import synth_container

    data = synth_container(doc)
    cut = max(1, int(len(data) * frac))
    try:
        mp3_meta(data[:cut])
    except Mp3Error:
        pass
    try:
        mp4_meta(data[:cut])
    except Mp4Error:
        pass
