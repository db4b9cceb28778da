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


class TestG711:
    """G.711 u-law/A-law: decode tables and vectorized encoders are
    bit-checked against CPython's audioop (the independent ITU oracle)
    over the FULL code/sample space."""

    def test_decode_tables_match_audioop(self):
        audioop = pytest.importorskip("audioop")
        from grawler_ray.functions.wav import _ALAW_DEC, _ULAW_DEC

        codes = bytes(range(256))
        assert np.array_equal(
            np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2"), _ULAW_DEC
        )
        assert np.array_equal(
            np.frombuffer(audioop.alaw2lin(codes, 2), "<i2"), _ALAW_DEC
        )

    def test_encoders_match_audioop_full_sweep(self):
        audioop = pytest.importorskip("audioop")
        from grawler_ray.functions.wav import alaw_encode, ulaw_encode

        x = np.arange(-32768, 32768, dtype=np.int16)
        assert np.array_equal(
            np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), np.uint8),
            ulaw_encode(x),
        )
        assert np.array_equal(
            np.frombuffer(audioop.lin2alaw(x.tobytes(), 2), np.uint8),
            alaw_encode(x),
        )

    @pytest.mark.parametrize("codec,min_snr", [("ulaw", 30.0), ("alaw", 30.0)])
    def test_wav_roundtrip_snr(self, codec, min_snr):
        from grawler_ray.functions.wav import encode_wav_compressed

        rate = 8000
        t = np.arange(2000) / rate
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        d, r = decode_wav(encode_wav_compressed(x, rate, codec))
        assert r == rate and d.shape == (2000, 1)
        err = d[:, 0] - x
        snr = 10 * np.log10((x**2).mean() / (err**2).mean())
        assert snr > min_snr
        assert wav_meta(encode_wav_compressed(x, rate, codec)) == (rate, 1, 8, 2000)


class TestImaAdpcm:
    def test_reference_scalar_decoder_equality(self):
        """The vectorized lockstep decoder must equal a straight-line
        scalar IMA decoder (independent second plan) bit-for-bit."""
        from grawler_ray.functions.wav import (
            _IMA_INDEX,
            _IMA_STEP,
            ima_decode_blocks,
            ima_encode_blocks,
            ima_samples_per_block,
        )

        rng = np.random.default_rng(3)
        x = (rng.integers(-8000, 8000, size=2000)).astype(np.int16)
        # smooth it so deltas are codable
        x = np.cumsum(x // 50).clip(-30000, 30000).astype(np.int16)
        for ch in (1, 2):
            s = np.stack([x, x[::-1]], 1)[:, :ch]
            align = 128 * ch
            raw = ima_encode_blocks(s, align)
            got = ima_decode_blocks(raw, ch, align)

            # scalar reference
            spb = ima_samples_per_block(align, ch)
            nb = len(raw) // align
            ref = np.empty((nb * spb, ch), np.int16)
            for bi in range(nb):
                blk = raw[bi * align : (bi + 1) * align]
                for c in range(ch):
                    pred = int.from_bytes(blk[4 * c : 4 * c + 2], "little", signed=True)
                    idx = min(88, blk[4 * c + 2])
                    ref[bi * spb, c] = pred
                    si = 1
                    data = blk[4 * ch :]
                    # 4-byte channel groups interleaved, low nibble first
                    nibbles = []
                    for gi in range(len(data) // (4 * ch)):
                        grp = data[gi * 4 * ch + 4 * c : gi * 4 * ch + 4 * c + 4]
                        for byte in grp:
                            nibbles.append(byte & 0x0F)
                            nibbles.append(byte >> 4)
                    for n in nibbles:
                        step = int(_IMA_STEP[idx])
                        delta = step >> 3
                        if n & 4:
                            delta += step
                        if n & 2:
                            delta += step >> 1
                        if n & 1:
                            delta += step >> 2
                        pred = pred - delta if n & 8 else pred + delta
                        pred = max(-32768, min(32767, pred))
                        idx = max(0, min(88, idx + int(_IMA_INDEX[n & 7])))
                        ref[bi * spb + si, c] = pred
                        si += 1
            assert np.array_equal(got, ref)

    @pytest.mark.parametrize("ch", [1, 2])
    def test_wav_roundtrip_snr_and_fact_trim(self, ch):
        from grawler_ray.functions.wav import encode_wav_compressed

        rate = 8000
        t = np.arange(3777) / rate  # deliberately not a block multiple
        x = 0.5 * np.sin(2 * np.pi * 300 * t)
        s = np.stack([x, 0.7 * x], 1)[:, :ch]
        wav = encode_wav_compressed(s, rate, "ima_adpcm", block_align=256 * ch)
        d, r = decode_wav(wav)
        assert r == rate and d.shape == s.shape  # fact chunk trims padding
        err = d - s
        snr = 10 * np.log10((s**2).mean() / (err**2).mean())
        assert snr > 25.0
        assert wav_meta(wav) == (rate, ch, 4, 3777)

    def test_beats_audioop_reference_quality(self):
        """Block-restart + slope-seeded index should not lose to the
        stateful audioop DVI coder on a tone."""
        audioop = pytest.importorskip("audioop")
        from grawler_ray.functions.wav import encode_wav_compressed

        rate = 8000
        t = np.arange(4000) / rate
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        d, _ = decode_wav(encode_wav_compressed(x, rate, "ima_adpcm", block_align=256))
        ours = 10 * np.log10((x**2).mean() / ((d[:, 0] - x) ** 2).mean())
        s16 = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2")
        enc, _ = audioop.lin2adpcm(s16.tobytes(), 2, None)
        dec, _ = audioop.adpcm2lin(enc, 2, None)
        ref = np.frombuffer(dec, "<i2") / 32768.0
        theirs = 10 * np.log10((x**2).mean() / ((ref - x) ** 2).mean())
        assert ours > theirs - 1.0


class TestMixedCodecStage:
    def test_codec_column_and_closed_forms(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import extract_audio_codec_features

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            extract_audio_codec_features(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got["format"] == "wav").all()
        expect = np.array(["pcm", "ulaw", "alaw", "ima_adpcm"])
        assert (got.codec == expect[got.doc_id % 4]).all()
        for _, r in got.sample(20, random_state=0).iterrows():
            doc_id = int(r.doc_id)
            freq = 100 + (doc_id * 37) % 800
            amp = 0.2 + (doc_id % 5) / 10.0
            n = 8000 // 4 + (doc_id % 7) * 100
            assert r.duration_ms == n * 1000 // 8000
            # compressed codecs add quantization noise: wider slack than
            # the PCM test, still pinned to the closed forms
            assert abs(r.rms_milli - amp / np.sqrt(2) * 1000) <= 40
            assert abs(r.centroid_mhz / 1000 - freq) < 60


class TestMfcc:
    def test_tone_maps_to_nearest_mel_band(self):
        from grawler_ray.functions.wav import mel_scale, mfcc_features

        rate, n_mels = 8000, 20
        centers = np.linspace(0, float(mel_scale(rate / 2)), n_mels + 2)[1:-1]
        for f in (150, 440, 900, 2000, 3500):
            t = np.arange(4000) / rate
            m = mfcc_features(0.4 * np.sin(2 * np.pi * f * t), rate, n_mels=n_mels)
            want = int(np.argmin(np.abs(centers - float(mel_scale(f)))))
            assert m["mel_argmax"] == want, (f, m["mel_argmax"], want)
            assert len(m["mfcc_milli"]) == 8

    def test_filterbank_partition_of_unity_interior(self):
        """Triangular mel filters overlap so interior FFT bins sum to
        ~1 (the standard sanity check on the construction)."""
        from grawler_ray.functions.wav import mel_filterbank

        fb = mel_filterbank(20, 4000, 8000)
        col = fb.sum(axis=0)
        interior = col[100:-100]
        assert (interior > 0.49).all() and (interior <= 1.01).all()

    def test_amplitude_shifts_only_c0(self):
        """Scaling the signal multiplies every mel energy by a constant:
        log moves all bands equally, so only the DC coefficient
        changes."""
        from grawler_ray.functions.wav import mfcc_features

        rate = 8000
        # broadband noise keeps every mel band far above the log floor —
        # the invariance only holds when no band is clamped
        x = np.random.default_rng(3).standard_normal(4000)
        a = np.array(mfcc_features(0.2 * x, rate)["mfcc_milli"], float)
        b = np.array(mfcc_features(0.8 * x, rate)["mfcc_milli"], float)
        assert abs(a[0] - b[0]) > 1000  # c0 moves with energy
        assert np.abs(a[1:] - b[1:]).max() <= 2  # shape coefficients don't

    def test_stage_over_mixed_codecs(self, ray_session):
        import ray.data

        from grawler_ray.functions.wav import mel_scale
        from grawler_ray.stages.multimodal import extract_audio_mfcc

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            extract_audio_mfcc(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) == 500
        rate, n_mels = 8000, 20
        centers = np.linspace(0, float(mel_scale(rate / 2)), n_mels + 2)[1:-1]
        for _, r in got.sample(24, random_state=0).iterrows():
            doc_id = int(r.doc_id)
            freq = 100 + (doc_id * 37) % 800
            want = int(np.argmin(np.abs(centers - float(mel_scale(freq)))))
            # compressed codecs add quantization noise but the dominant
            # band holds within one bin
            assert abs(r.mel_argmax - want) <= 1, (doc_id, r.mel_argmax, want)
