"""Pure-stdlib WAV (RIFF) codec + numpy audio features — the audio
leg of the multimodal stack made real: WAV is uncompressed PCM, so a
from-scratch decoder is exact, and the feature kernels (RMS, zero
crossings, spectral centroid/rolloff over an rFFT) are textbook DSP with
closed-form oracles on pure tones (RMS = A/sqrt(2), ZCR = 2f/rate,
centroid -> f).

COMPRESSED audio decodes for real too, for the codecs whose specs are
closed-form: G.711 mu-law / A-law (format tags 7 / 6 — the ITU telephony
companders, implemented per the canonical public-domain Sun ``g711.c``
segment arithmetic, bit-checked against CPython's ``audioop`` in tests)
and IMA/DVI ADPCM (tag 0x11 — 4-bit adaptive delta PCM with per-block
predictor headers).  ADPCM's inner loop is sequential per block but
blocks are INDEPENDENT, so the decoder runs all blocks of a payload in
lockstep as numpy vectors (one pass of ``samples_per_block`` vector
steps regardless of block count) — the same trick the 100-TB stage
relies on.  Perceptual codecs (mp3/aac/ogg) stay an honest stub at the
ffmpeg slot.

Supported: RIFF/WAVE with PCM integer 8 (unsigned) / 16 / 24 / 32-bit,
IEEE float32/float64, G.711 u-law/A-law, IMA ADPCM (mono/stereo, any
block align), any channel count; chunks in any order, odd chunk padding
honored; ``fact`` chunk trims ADPCM padding.  Samples normalize to
float64 in [-1, 1].
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


# --- G.711 companding (Sun g711.c segment arithmetic, public domain) ---

_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], np.int32)
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int32)


def _build_g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry int16 decode tables for u-law / A-law, built once at
    import from the scalar spec formulas (the vectorized decode is then a
    table gather — exact and branch-free)."""
    ulaw = np.empty(256, np.int16)
    for code in range(256):
        u = ~code & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        ulaw[code] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    alaw = np.empty(256, np.int16)
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        alaw[code] = t if (a & 0x80) else -t
    return ulaw, alaw


_ULAW_DEC, _ALAW_DEC = _build_g711_tables()


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 u-law codes (vectorized linear2ulaw)."""
    pcm = np.asarray(x, np.int32) >> 2  # 16 -> 14 bit
    mask = np.where(pcm < 0, 0x7F, 0xFF)
    pcm = np.abs(pcm)
    pcm = np.minimum(pcm, 8159) + (0x84 >> 2)
    seg = np.searchsorted(_SEG_UEND, pcm)  # first seg with pcm <= end
    uval = (seg << 4) | ((pcm >> (seg + 1)) & 0xF)
    return (np.where(seg >= 8, 0x7F, uval) ^ mask).astype(np.uint8)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 A-law codes (vectorized linear2alaw)."""
    pcm = np.asarray(x, np.int32) >> 3  # 16 -> 13 bit
    mask = np.where(pcm >= 0, 0xD5, 0x55)
    pcm = np.where(pcm >= 0, pcm, -pcm - 1)
    seg = np.searchsorted(_SEG_AEND, pcm)
    aval = (seg << 4) | np.where(seg < 2, (pcm >> 1) & 0xF, (pcm >> seg) & 0xF)
    return (np.where(seg >= 8, 0x7F, aval) ^ mask).astype(np.uint8)


# --- IMA/DVI ADPCM (4-bit, per-block predictor headers) ---

_IMA_STEP = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def ima_samples_per_block(block_align: int, channels: int) -> int:
    return (block_align - 4 * channels) * 2 // channels + 1


def ima_decode_blocks(raw: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA ADPCM data bytes -> int16 samples (n, channels).  All blocks
    decode in LOCKSTEP: the nibble loop is ``samples_per_block`` vector
    steps over (n_blocks, channels) arrays, so cost is one sequential
    pass per payload regardless of duration."""
    ch = channels
    if ch < 1 or block_align < 4 * ch + 4 * ch:
        raise WavError(f"bad IMA ADPCM block align {block_align} for {ch} ch")
    nb = len(raw) // block_align
    if nb == 0:
        raise WavError("no complete ADPCM block")
    b = np.frombuffer(raw[: nb * block_align], np.uint8).reshape(nb, block_align)
    hdr = b[:, : 4 * ch].reshape(nb, ch, 4).astype(np.int32)
    pred = hdr[:, :, 0] | (hdr[:, :, 1] << 8)
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    idx = np.clip(hdr[:, :, 2], 0, 88)
    body = b[:, 4 * ch :]
    groups = body.shape[1] // (4 * ch)
    # layout: 4-byte channel groups interleaved ch0,ch1,ch0,... then
    # low-nibble-first within each byte
    g = body[:, : groups * 4 * ch].reshape(nb, groups, ch, 4)
    nib = np.empty((nb, groups, ch, 8), np.uint8)
    nib[..., 0::2] = g & 0x0F
    nib[..., 1::2] = g >> 4
    nib = nib.transpose(0, 2, 1, 3).reshape(nb, ch, groups * 8)
    spb = groups * 8 + 1
    out = np.empty((nb, ch, spb), np.int16)
    out[:, :, 0] = pred
    for j in range(groups * 8):
        n = nib[:, :, j].astype(np.int32)
        step = _IMA_STEP[idx]
        delta = step >> 3
        delta += np.where(n & 4, step, 0)
        delta += np.where(n & 2, step >> 1, 0)
        delta += np.where(n & 1, step >> 2, 0)
        pred = np.clip(np.where(n & 8, pred - delta, pred + delta), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[n & 7], 0, 88)
        out[:, :, j + 1] = pred
    return out.transpose(0, 2, 1).reshape(nb * spb, ch)


def ima_encode_blocks(x: np.ndarray, block_align: int) -> bytes:
    """int16 samples (n, channels) -> IMA ADPCM block bytes (vectorized
    across blocks; step index restarts per block — spec-conformant, the
    header carries it).  Pads the tail block by repeating the last
    sample."""
    x = np.asarray(x, np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    spb = ima_samples_per_block(block_align, ch)
    if spb < 2 or (spb - 1) % 8 != 0:
        raise WavError(f"block align {block_align} gives invalid samples/block {spb}")
    nb = (n + spb - 1) // spb
    pad = nb * spb - n
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
    blk = x.reshape(nb, spb, ch).transpose(0, 2, 1).astype(np.int32)  # (nb, ch, spb)
    pred = blk[:, :, 0]
    # initial step index per block: nearest step to the mean |delta| of the
    # block (the header carries it, so any spec decoder reproduces exactly)
    mean_d = np.abs(np.diff(blk, axis=2)).mean(axis=2)
    idx = np.searchsorted(_IMA_STEP, mean_d).clip(0, 88).astype(np.int32)
    idx0 = idx.copy()
    nibs = np.empty((nb, ch, spb - 1), np.uint8)
    for j in range(1, spb):
        step = _IMA_STEP[idx]
        diff = blk[:, :, j] - pred
        code = np.where(diff < 0, 8, 0)
        diff = np.abs(diff)
        for bit, sh in ((4, 0), (2, 1), (1, 2)):
            ge = diff >= (step >> sh)
            code |= np.where(ge, bit, 0)
            diff -= np.where(ge, step >> sh, 0)
        # reconstruct exactly as the decoder will
        delta = step >> 3
        delta += np.where(code & 4, step, 0)
        delta += np.where(code & 2, step >> 1, 0)
        delta += np.where(code & 1, step >> 2, 0)
        pred = np.clip(np.where(code & 8, pred - delta, pred + delta), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[code & 7], 0, 88)
        nibs[:, :, j - 1] = code
    hdr = np.zeros((nb, ch, 4), np.uint8)
    p0 = blk[:, :, 0] & 0xFFFF
    hdr[:, :, 0] = p0 & 0xFF
    hdr[:, :, 1] = p0 >> 8
    hdr[:, :, 2] = idx0
    groups = (spb - 1) // 8
    g = nibs.reshape(nb, ch, groups, 8).transpose(0, 2, 1, 3)  # (nb, groups, ch, 8)
    packed = (g[..., 0::2] | (g[..., 1::2] << 4)).astype(np.uint8)  # (nb,groups,ch,4)
    out = np.empty((nb, block_align), np.uint8)
    out[:, : 4 * ch] = hdr.reshape(nb, 4 * ch)
    out[:, 4 * ch : 4 * ch + groups * 4 * ch] = packed.reshape(nb, groups * 4 * ch)
    out[:, 4 * ch + groups * 4 * ch :] = 0
    return out.tobytes()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 (n, channels) in [-1, 1], rate)."""
    try:
        return _decode_wav(data)
    except WavError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise WavError(f"truncated/malformed WAV: {e}") from e


def _parse_wav(data: bytes) -> tuple[int, int, int, int, int, int | None, bytes]:
    """-> (tag, ch, rate, bits, align, fact_samples, raw data bytes)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    raw = None
    fact_samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WavError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            tag, ch, rate, _brate, align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                (tag,) = struct.unpack("<H", body[24:26])
            fmt = (tag, ch, rate, bits, align)
        elif cid == b"data":
            raw = body
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack("<I", body[:4])
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavError("missing fmt chunk")
    if raw is None:
        raise WavError("missing data chunk")
    tag, ch, rate, bits, align = fmt
    if ch < 1:
        raise WavError("zero channels")
    return tag, ch, rate, bits, align, fact_samples, raw


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    tag, ch, rate, bits, align, fact_samples, raw = _parse_wav(data)
    if tag == 0x11:  # IMA/DVI ADPCM — block-structured 4-bit
        if bits != 4:
            raise WavError(f"IMA ADPCM with bit depth {bits}")
        s16 = ima_decode_blocks(raw, ch, align)
        if fact_samples is not None:
            s16 = s16[:fact_samples]
        return s16.astype(np.float64) / 32768.0, rate
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
    elif tag == 6:  # G.711 A-law
        x = _ALAW_DEC[np.frombuffer(raw, np.uint8)].astype(np.float64) / 32768.0
    elif tag == 7:  # G.711 u-law
        x = _ULAW_DEC[np.frombuffer(raw, np.uint8)].astype(np.float64) / 32768.0
    else:
        raise WavError(f"unsupported format tag {tag} (mp3/aac need ffmpeg)")
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


def encode_wav_compressed(
    samples: np.ndarray, rate: int, codec: str = "ulaw", block_align: int = 1024
) -> bytes:
    """float samples in [-1, 1] -> compressed WAV bytes.  ``codec``:
    "ulaw" / "alaw" (G.711, tag 7/6) or "ima_adpcm" (tag 0x11 with a
    ``fact`` chunk so decode trims block padding)."""
    a = np.asarray(samples, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise WavError(f"unsupported sample shape {samples.shape}")
    n, ch = a.shape
    s16 = np.clip(np.round(a * 32767.0), -32768, 32767).astype(np.int16)
    fact = None
    if codec == "ulaw":
        payload = ulaw_encode(s16.ravel()).tobytes()
        tag, bits, align, brate = 7, 8, ch, rate * ch
    elif codec == "alaw":
        payload = alaw_encode(s16.ravel()).tobytes()
        tag, bits, align, brate = 6, 8, ch, rate * ch
    elif codec == "ima_adpcm":
        payload = ima_encode_blocks(s16, block_align)
        spb = ima_samples_per_block(block_align, ch)
        tag, bits, align = 0x11, 4, block_align
        brate = (rate * block_align + spb - 1) // spb
        fact = n
    else:
        raise WavError(f"unknown codec {codec!r}")
    fmt = struct.pack("<HHIIHH", tag, ch, rate, brate, align, bits)
    if tag == 0x11:
        fmt += struct.pack("<HH", 2, ima_samples_per_block(block_align, ch))
    out = bytearray()
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact is not None:
        out += b"fact" + struct.pack("<I", 4) + struct.pack("<I", fact)
    out += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + bytes(out)


def wav_meta(data: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits, n_samples) without touching PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    rate = ch = bits = None
    tag = align = None
    data_size = None
    fact_samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            tag, ch, rate, _br, align, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            data_size = size
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        pos += 8 + size + (size & 1)
    if rate is None or data_size is None:
        raise WavError("missing fmt/data chunk")
    if fact_samples is not None:
        n = fact_samples
    elif tag == 0x11:  # ADPCM without fact: whole blocks
        n = (data_size // max(1, align)) * ima_samples_per_block(align, ch)
    else:
        n = data_size // max(1, ch * bits // 8)
    return rate, ch, bits, n


def decode_wav_batch(payloads: list[bytes]) -> list[tuple[np.ndarray, int] | None]:
    """Decode MANY WAVs at once: PCM/float/G.711 decode per payload
    (already single vector ops); IMA ADPCM payloads GROUP by
    (channels, block_align) and run ONE lockstep ``ima_decode_blocks``
    over their concatenated block streams — blocks are independent and
    none straddles a payload, so the result is bit-identical to
    per-payload decode while the sequential nibble loop's vector width
    becomes the whole batch's block count.  Malformed payloads yield
    None (web corpora demand it)."""
    out: list[tuple[np.ndarray, int] | None] = [None] * len(payloads)
    ima: dict[tuple[int, int], list[tuple[int, int, int, int | None, bytes]]] = {}
    for i, p in enumerate(payloads):
        try:
            tag, ch, rate, bits, align, fact, raw = _parse_wav(p or b"")
            if tag == 0x11:
                if bits != 4:
                    raise WavError(f"IMA ADPCM with bit depth {bits}")
                nb = len(raw) // align
                if nb == 0:
                    raise WavError("no complete ADPCM block")
                ima.setdefault((ch, align), []).append(
                    (i, rate, nb, fact, raw[: nb * align])
                )
            else:
                out[i] = _decode_wav(p or b"")
        except WavError:
            out[i] = None
    for (ch, align), group in ima.items():
        cat = b"".join(raw for _, _, _, _, raw in group)
        s16 = ima_decode_blocks(cat, ch, align)
        spb = ima_samples_per_block(align, ch)
        off = 0
        for i, rate, nb, fact, _raw in group:
            part = s16[off : off + nb * spb]
            off += nb * spb
            if fact is not None:
                part = part[:fact]
            out[i] = (part.astype(np.float64) / 32768.0, rate)
    return out


_TAG_NAMES = {1: "pcm", 3: "float", 6: "alaw", 7: "ulaw", 0x11: "ima_adpcm"}


def wav_codec_name(data: bytes) -> str:
    """fmt-chunk format tag -> codec name ("pcm", "float", "ulaw",
    "alaw", "ima_adpcm", or "tag_<n>")."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt " and size >= 16:
            (tag,) = struct.unpack("<H", data[pos + 8 : pos + 10])
            if tag == 0xFFFE and size >= 40:
                (tag,) = struct.unpack("<H", data[pos + 32 : pos + 34])
            return _TAG_NAMES.get(tag, f"tag_{tag}")
        pos += 8 + size + (size & 1)
    raise WavError("missing fmt chunk")


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


def mel_scale(f: np.ndarray | float) -> np.ndarray | float:
    """HTK mel scale: mel = 2595 log10(1 + f/700)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_filterbank(n_mels: int, n_fft: int, rate: int) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters, equal-width in mel
    space from 0 to Nyquist (the standard HTK construction)."""
    max_mel = float(mel_scale(rate / 2.0))
    pts_mel = np.linspace(0.0, max_mel, n_mels + 2)
    pts_hz = 700.0 * (10.0 ** (pts_mel / 2595.0) - 1.0)
    bins = np.floor((n_fft + 1) * pts_hz / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, ce, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, min(ce, fb.shape[1])):
            if ce > lo:
                fb[m - 1, k] = (k - lo) / (ce - lo)
        for k in range(ce, min(hi, fb.shape[1])):
            if hi > ce:
                fb[m - 1, k] = (hi - k) / (hi - ce)
    return fb


def mfcc_features(
    samples: np.ndarray, rate: int, n_mels: int = 20, n_mfcc: int = 8
) -> dict:
    """Whole-clip MFCCs over the channel-mean signal: rFFT power ->
    triangular mel filterbank -> log -> orthonormal DCT-II, first
    ``n_mfcc`` coefficients (milli-scaled ints for exact comparison).
    Pure tones give closed-form checks: the argmax mel band is the band
    whose center is nearest mel(f)."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = len(x)
    if n == 0:
        raise WavError("empty signal")
    power = np.abs(np.fft.rfft(x)) ** 2 / n
    fb = mel_filterbank(n_mels, n, rate)
    mel_e = fb @ power
    log_e = np.log(np.maximum(mel_e, 1e-12))
    # orthonormal DCT-II
    k = np.arange(n_mels)
    basis = np.cos(np.pi * np.outer(k, 2 * np.arange(n_mels) + 1) / (2 * n_mels))
    basis *= np.sqrt(2.0 / n_mels)
    basis[0] *= 1.0 / np.sqrt(2.0)
    mfcc = basis @ log_e
    return {
        "mel_argmax": int(np.argmax(mel_e)),
        "mfcc_milli": [int(round(c * 1000)) for c in mfcc[:n_mfcc]],
    }
