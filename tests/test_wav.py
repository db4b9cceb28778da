"""WAV codec + audio DSP features (grawler_ray/functions/wav.py) and the
REAL audio-feature stage.  Pure tones give CLOSED-FORM oracles: RMS =
A/sqrt(2), zero-crossing rate = 2f, spectral centroid/rolloff -> f — so
the stage is checked against spec math, not a serial rerun."""

import struct

import numpy as np
import pytest

from grawler_ray.functions.wav import (
    WavError,
    audio_features,
    decode_wav,
    encode_wav,
    wav_meta,
)

SF = "/root/testdata/sf0.001"


class TestCodec:
    @pytest.mark.parametrize("bits,tol", [(8, 1e-2), (16, 1e-4), (32, 1e-7)])
    def test_roundtrip(self, bits, tol):
        rate = 8000
        t = np.arange(rate // 2) / rate
        x = 0.7 * np.sin(2 * np.pi * 300 * t)
        d, r = decode_wav(encode_wav(x, rate, bits=bits))
        assert r == rate and d.shape == (len(x), 1)
        assert np.abs(d[:, 0] - x).max() < tol

    def test_stereo_and_meta(self):
        rate = 16000
        t = np.arange(1000) / rate
        st = np.stack([np.sin(2 * np.pi * 200 * t), np.cos(2 * np.pi * 200 * t)], 1) * 0.4
        wav = encode_wav(st, rate)
        d, r = decode_wav(wav)
        assert d.shape == (1000, 2) and np.abs(d - st).max() < 1e-4
        assert wav_meta(wav) == (rate, 2, 16, 1000)

    def test_24bit_and_float_decode(self):
        # hand-build a 24-bit PCM and a float32 WAV
        def raw_wav(tag, ch, rate, bits, pcm):
            fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ch * bits // 8,
                              ch * bits // 8, bits)
            body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
            body += b"data" + struct.pack("<I", len(pcm)) + pcm
            return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

        # 24-bit: values +- half scale
        vals = [1 << 22, -(1 << 22)]
        pcm = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        d, r = decode_wav(raw_wav(1, 1, 8000, 24, pcm))
        assert np.allclose(d[:, 0], [0.5, -0.5])
        f32 = np.array([0.25, -0.75], np.float32).tobytes()
        d2, _ = decode_wav(raw_wav(3, 1, 8000, 32, f32))
        assert np.allclose(d2[:, 0], [0.25, -0.75])

    def test_rejections(self):
        with pytest.raises(WavError, match="RIFF"):
            decode_wav(b"OggS not a wav")
        x = np.zeros(100)
        with pytest.raises(WavError):
            decode_wav(encode_wav(x, 8000)[:30])
        # mp3-in-wav (format tag 85) names the ffmpeg slot
        fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
        bad = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        with pytest.raises(WavError, match="format tag"):
            decode_wav(bad)


class TestFeatures:
    def test_pure_tone_closed_forms(self):
        rate = 8000
        for freq, amp in ((440, 0.5), (123, 0.9), (700, 0.2)):
            t = np.arange(rate) / rate
            x = amp * np.sin(2 * np.pi * freq * t)
            f = audio_features(x, rate)
            assert f["duration_ms"] == 1000
            assert abs(f["rms_milli"] - int(amp / np.sqrt(2) * 1000)) <= 1
            assert abs(f["zcr_milli"] / 1000 - 2 * freq) < 6
            assert abs(f["centroid_mhz"] / 1000 - freq) < 2
            assert abs(f["rolloff_mhz"] / 1000 - freq) < 2

    def test_two_tone_centroid_between(self):
        rate = 8000
        t = np.arange(rate) / rate
        x = 0.5 * np.sin(2 * np.pi * 200 * t) + 0.5 * np.sin(2 * np.pi * 1000 * t)
        f = audio_features(x, rate)
        assert 200 < f["centroid_mhz"] / 1000 < 1000
        # equal power -> centroid at the midpoint
        assert abs(f["centroid_mhz"] / 1000 - 600) < 10
        # 85% rolloff lands on the higher tone
        assert abs(f["rolloff_mhz"] / 1000 - 1000) < 5

    def test_silence(self):
        f = audio_features(np.zeros(1000), 8000)
        assert f["rms_milli"] == 0 and f["centroid_mhz"] == 0


class TestRealStage:
    def test_stage_matches_closed_forms(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import extract_wav_features

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            extract_wav_features(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got["format"] == "wav").all()
        assert (got.sample_rate == 8000).all()
        for _, r in got.sample(20, random_state=0).iterrows():
            doc_id = int(r.doc_id)
            freq = 100 + (doc_id * 37) % 800
            amp = 0.2 + (doc_id % 5) / 10.0
            n = 8000 // 4 + (doc_id % 7) * 100
            assert r.channels == (2 if doc_id % 3 == 0 else 1)
            assert r.duration_ms == n * 1000 // 8000
            # stereo halves channel 2 -> channel-mean amp = 0.75 * amp
            eff = amp * 0.75 if doc_id % 3 == 0 else amp
            # 16-bit quantization + non-integer cycle counts: ~1% slack
            assert abs(r.rms_milli - eff / np.sqrt(2) * 1000) <= 12
            assert abs(r.centroid_mhz / 1000 - freq) < 25
            assert abs(r.zcr_milli / 1000 - 2 * freq) < 70

    def test_stage_corrupt_and_unknown(self, ray_session):
        import pyarrow as pa

        from grawler_ray.stages.multimodal import ExtractAudioFeatures

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([b"RIFFxxxxWAVEjunk", b"plain"], pa.binary()),
            }
        )
        out = ExtractAudioFeatures()(t)
        assert out.column("format").to_pylist() == ["corrupt", "unknown"]
        assert out.column("rms_milli").to_pylist() == [0, 0]
