"""Pure-stdlib PNG codec (RFC 2083 / W3C PNG spec): zlib IDAT inflate +
per-scanline unfiltering in numpy.  No PIL/libpng — this container has no
image libraries, and the multimodal stages need a REAL decode path for at
least one format so the actor-pool plumbing runs on actual pixel data.

Supported: bit depth 8; color types 0 (grayscale), 2 (RGB), 3 (palette,
PLTE required), 4 (gray+alpha), 6 (RGBA); all five scanline filters
(None/Sub/Up/Average/Paeth).  Rejected with a clear error: other bit
depths and Adam7 interlacing (progressive layout — a real pipeline
re-encodes those upstream).

The encoder exists for fixtures and for the resize stage's re-encode:
filter type selectable per image (default 0), always writes 8-bit
truecolor/grayscale (palette input decodes to RGB before re-encode).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (palette expands on decode)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec §6.6), vectorized over one scanline position."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (h, w) for grayscale or
    (h, w, channels) otherwise.  Palette images expand to RGB."""
    try:
        return _decode_png(data)
    except PngError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise PngError(f"truncated/malformed PNG: {e}") from e


def _decode_png(data: bytes) -> np.ndarray:
    if len(data) < 8 or data[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        pos += 12 + length  # length + type + data + CRC (CRC not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    if bit_depth != 8:
        raise PngError(f"unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise PngError("Adam7 interlacing not supported")
    if color_type == 3 and plte is None:
        raise PngError("palette image without PLTE")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"bad IDAT stream: {e}") from e
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise PngError(
            f"IDAT size mismatch: {len(raw)} != {height}*({stride}+1)"
        )
    # unfilter: sequential over rows (Up/Average/Paeth reference the prior
    # row); within a row Sub/Average/Paeth recur over the PREVIOUS PIXEL,
    # so the inner walk is per-pixel but vectorized across channels
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(ch, stride, ch):
                cur[x : x + ch] += cur[x - ch : x]
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype == 3:  # Average
            cur = line
            cur[:ch] += (prev[:ch] // 2).astype(np.uint8)
            for x in range(ch, stride, ch):
                avg = (
                    cur[x - ch : x].astype(np.uint16)
                    + prev[x : x + ch].astype(np.uint16)
                ) // 2
                cur[x : x + ch] += avg.astype(np.uint8)
        elif ftype == 4:  # Paeth
            cur = line
            zero = np.zeros(ch, np.uint8)
            cur[:ch] += _paeth(zero, prev[:ch], zero)
            for x in range(ch, stride, ch):
                cur[x : x + ch] += _paeth(
                    cur[x - ch : x], prev[x : x + ch], prev[x - ch : x]
                )
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[y] = cur
        prev = cur
    if color_type == 3:
        px = plte[out.reshape(height, width)]
        return px  # (h, w, 3)
    if ch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h,w) / (h,w,1|2|3|4) -> PNG bytes.  ``filter_type``
    applies to every scanline (0/1/2/3/4) — non-zero types exist mainly
    so tests exercise every decoder branch."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise PngError(f"unsupported array shape {arr.shape}")
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = a.reshape(h, stride)
    lines = bytearray()
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            enc = cur - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
            ).astype(np.uint8)
        elif filter_type == 4:
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            upleft = np.zeros_like(prev)
            upleft[ch:] = prev[:-ch]
            enc = cur - _paeth(left, prev, upleft)
        else:
            raise PngError(f"unknown filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def png_meta(data: bytes) -> tuple[int, int, int, int, int]:
    """IHDR-only parse: (width, height, bit_depth, color_type, interlace)
    without inflating IDAT — the cheap metadata path."""
    if len(data) < 33 or data[:8] != _SIG or data[12:16] != b"IHDR":
        raise PngError("not a PNG (bad signature/IHDR)")
    w, h, bd, ct, _comp, _filt, il = struct.unpack(">IIBBBBB", data[16:29])
    return w, h, bd, ct, il


def resize_box(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Box-average (area-mean) resample to (height, width) — the standard
    downscale kernel, deterministic integer output (truncating mean).
    Nearest-neighbor source binning with EQUAL-WIDTH bins: output pixel
    (i,j) averages source rows floor(i*H/h)..floor((i+1)*H/h)-1 (min 1
    row), likewise columns."""
    a = np.asarray(arr, np.uint8)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    H, W, ch = a.shape
    ys = (np.arange(height + 1) * H) // height
    xs = (np.arange(width + 1) * W) // width
    # cumulative sum trick: box sums via 2-D integral image, exact
    ii = np.zeros((H + 1, W + 1, ch), np.int64)
    ii[1:, 1:] = np.cumsum(np.cumsum(a.astype(np.int64), 0), 1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    sums = (
        ii[y1][:, x1]
        - ii[y0][:, x1]
        - ii[y1][:, x0]
        + ii[y0][:, x0]
    )
    areas = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[:, :, None]
    out = (sums // areas).astype(np.uint8)
    return out[:, :, 0] if squeeze else out
