"""Pure-stdlib WAV (RIFF PCM) codec + numpy audio features — the audio
leg of the multimodal stack made real: WAV is uncompressed PCM, so a
from-scratch decoder is exact, and the feature kernels (RMS, zero
crossings, spectral centroid/rolloff over an rFFT) are textbook DSP with
closed-form oracles on pure tones (RMS = A/sqrt(2), ZCR = 2f/rate,
centroid -> f).  Compressed audio (mp3/aac/ogg) stays an honest stub at
the ffmpeg slot.

Supported: RIFF/WAVE with PCM integer 8 (unsigned) / 16 / 24 / 32-bit
and IEEE float32/float64, any channel count; chunks in any order, odd
chunk padding honored.  Samples normalize to float64 in [-1, 1].
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 (n, channels) in [-1, 1], rate)."""
    try:
        return _decode_wav(data)
    except WavError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise WavError(f"truncated/malformed WAV: {e}") from e


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WavError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            tag, ch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                (tag,) = struct.unpack("<H", body[24:26])
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavError("missing fmt chunk")
    if raw is None:
        raise WavError("missing data chunk")
    tag, ch, rate, bits = fmt
    if ch < 1:
        raise WavError("zero channels")
    if tag == 1:  # PCM integer
        if bits == 8:
            x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8)
            n = len(b) // 3
            b = b[: n * 3].reshape(n, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
        else:
            raise WavError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(raw, "<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(raw, "<f8").astype(np.float64)
        else:
            raise WavError(f"unsupported float bit depth {bits}")
    else:
        raise WavError(f"unsupported format tag {tag} (mp3/adpcm need ffmpeg)")
    n = len(x) // ch
    return x[: n * ch].reshape(n, ch), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """float samples (n,) or (n, ch) in [-1, 1] -> PCM WAV bytes."""
    a = np.asarray(samples, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise WavError(f"unsupported sample shape {samples.shape}")
    n, ch = a.shape
    a = np.clip(a, -1.0, 1.0)
    if bits == 16:
        pcm = np.round(a * 32767.0).astype("<i2").tobytes()
        tag = 1
    elif bits == 8:
        pcm = (np.round(a * 127.0) + 128).astype(np.uint8).tobytes()
        tag = 1
    elif bits == 32:
        pcm = a.astype("<f4").tobytes()
        tag = 3
    else:
        raise WavError(f"unsupported encode bit depth {bits}")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * block, block, bits)
    out = bytearray()
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + bytes(out)


def wav_meta(data: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits, n_samples) without touching PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    rate = ch = bits = None
    data_size = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            _tag, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if rate is None or data_size is None:
        raise WavError("missing fmt/data chunk")
    return rate, ch, bits, data_size // max(1, ch * bits // 8)


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Per-clip scalar features over the channel-mean signal:
    duration_ms, rms_milli, zero-crossings/sec (milli), spectral
    centroid and 85% rolloff in Hz (milli) via the real FFT."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = len(x)
    if n == 0:
        raise WavError("empty signal")
    rms = float(np.sqrt(np.mean(x * x)))
    s = np.signbit(x)
    zc = int(np.count_nonzero(s[1:] != s[:-1]))
    zcr = zc * rate / max(1, n - 1)
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = mag * mag
    tot = float(power.sum())
    if tot > 0:
        centroid = float((freqs * power).sum() / tot)
        cum = np.cumsum(power)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * tot))])
    else:
        centroid = 0.0
        rolloff = 0.0
    return {
        "duration_ms": int(n * 1000 // rate),
        "rms_milli": int(rms * 1000),
        "zcr_milli": int(zcr * 1000),
        "centroid_mhz": int(centroid * 1000),
        "rolloff_mhz": int(rolloff * 1000),
    }
