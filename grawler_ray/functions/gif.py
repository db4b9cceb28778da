"""Pure-stdlib GIF decoder (GIF87a/89a): LZW decompression, global and
local color tables, interlacing, and ANIMATION frame composition
(graphic-control disposal methods) — no PIL, no giflib.

This is the third leg of the real image stack (PNG, JPEG, GIF cover
essentially every image a web crawl stores), and the one that makes the
video-style ``sample_frames`` stage REAL: an animated GIF is genuinely a
frame sequence, so frame extraction runs on actual decoded pixel data
instead of byte slices.

Supported: 87a and 89a, global/local palettes, interlaced images,
transparency, multi-frame animations with disposal methods 0/1
(keep), 2 (restore background) and 3 (restore previous).  The encoder
writes single- or multi-frame GIFs (palette quantization: exact if the
frame has <= 256 distinct colors, else a 6x7x6 uniform cube) for
fixtures and roundtrip tests.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(data):
        raise GifError("truncated color table")
    return np.frombuffer(data[pos:end], np.uint8).reshape(n, 3).copy(), end


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if len(out) < n:
            raise GifError("truncated sub-block data")
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """GIF-variant LZW (LSB-first bit packing, clear/EOI codes, max 12-bit
    codes) -> uint8 index stream of ``expected`` pixels."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, np.uint8)
    n_out = 0

    # dictionary as (prefix_code, suffix_byte); roots implicit
    prefix = np.zeros(4096, np.int32)
    suffix = np.zeros(4096, np.uint8)
    stack = bytearray(4097)

    code_size = min_code_size + 1
    next_code = eoi + 1
    prev = -1

    acc = 0
    nbits = 0
    pos = 0
    ln = len(data)
    while n_out < expected:
        while nbits < code_size:
            if pos >= ln:
                raise GifError("LZW stream exhausted early")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise GifError("first LZW code not a root")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        # emit string for code (KwKwK case: code == next_code)
        if code < next_code:
            cur = code
            first_of_cur = None
        elif code == next_code:
            cur = prev
            first_of_cur = True  # placeholder: append first char of prev later
        else:
            raise GifError("LZW code out of range")
        sp = 0
        c = cur
        while c >= clear:
            stack[sp] = suffix[c]
            sp += 1
            c = prefix[c]
        first = c
        # write: root char + reversed stack (+ repeated first for KwKwK)
        m = sp + 1 + (1 if first_of_cur else 0)
        if n_out + m > expected:
            m = expected - n_out
        chunk = bytearray()
        chunk.append(first)
        for i in range(sp - 1, -1, -1):
            chunk.append(stack[i])
        if first_of_cur:
            chunk.append(first)
        out[n_out : n_out + m] = np.frombuffer(bytes(chunk[:m]), np.uint8)
        n_out += m
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code if code < next_code else next_code - 1
    return out


_INTERLACE_ROWS = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes, max_frames: int | None = None) -> list[dict]:
    """GIF bytes -> list of frames, each ``{"image": (h, w, 3) uint8,
    "delay_ms": int}`` — frames are the COMPOSED animation states (full
    logical-screen size, disposal applied), not raw sub-rectangles."""
    try:
        return _decode_gif(data, max_frames)
    except GifError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        # truncated stream hit a raw read: surface as the codec error
        raise GifError(f"truncated/malformed GIF: {e}") from e


def _decode_gif(data: bytes, max_frames: int | None = None) -> list[dict]:
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise GifError("not a GIF (bad signature)")
    W, H = struct.unpack("<HH", data[6:10])
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (packed & 0x07))

    canvas = np.zeros((H, W, 3), np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames: list[dict] = []
    transparent = None
    delay_ms = 0
    disposal = 0

    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = _read_subblocks(data, pos)
                if len(blk) >= 4:
                    flags = blk[0]
                    (delay_cs,) = struct.unpack("<H", blk[1:3])
                    delay_ms = delay_cs * 10
                    disposal = (flags >> 2) & 0x7
                    transparent = blk[3] if flags & 0x1 else None
            else:  # comment/app/plain-text: skip
                _, pos = _read_subblocks(data, pos)
            continue
        if b != 0x2C:
            raise GifError(f"unexpected block 0x{b:02X}")
        # image descriptor
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        x, y, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
        flags = data[pos + 8]
        pos += 9
        table = gct
        if flags & 0x80:
            table, pos = _read_color_table(data, pos, 2 << (flags & 0x07))
        if table is None:
            raise GifError("image without any color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, lzw, w * h)
        if flags & 0x40:  # interlaced: reorder rows
            rows = idx.reshape(h, w)
            de = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_ROWS:
                n = len(range(start, h, step))
                de[start:h:step] = rows[src : src + n]
                src += n
            idx = de.reshape(-1)
        if idx.max(initial=0) >= len(table):
            raise GifError("palette index out of range")
        rgb = table[idx].reshape(h, w, 3)

        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[y : y + h, x : x + w]
        if transparent is not None:
            mask = (idx.reshape(h, w) != transparent)[:, :, None]
            np.copyto(region, rgb, where=mask)
        else:
            region[:] = rgb
        frames.append({"image": canvas.copy(), "delay_ms": delay_ms})
        if max_frames is not None and len(frames) >= max_frames:
            break
        # apply disposal AFTER presenting the frame
        if disposal == 2:
            if gct is not None and bg_index < len(gct):
                canvas[y : y + h, x : x + w] = gct[bg_index]
            else:
                canvas[y : y + h, x : x + w] = 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise GifError("no image data")
    return frames


def gif_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) via a structural walk (no LZW work)."""
    try:
        return _gif_meta(data)
    except GifError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise GifError(f"truncated/malformed GIF: {e}") from e


def _gif_meta(data: bytes) -> tuple[int, int, int]:
    if len(data) < 13 or data[:4] != b"GIF8":
        raise GifError("not a GIF (bad signature)")
    W, H = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            pos += 1
            _, pos = _read_subblocks(data, pos)
            continue
        if b != 0x2C:
            raise GifError(f"unexpected block 0x{b:02X}")
        flags = data[pos + 8]
        pos += 9
        if flags & 0x80:
            pos += 3 * (2 << (flags & 0x07))
        pos += 1  # LZW min code size
        _, pos = _read_subblocks(data, pos)
        n += 1
    if n == 0:
        raise GifError("no image data")
    return W, H, n


# ---------------------------------------------------------------------------
# encoder (fixtures / tests)

def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    code_size = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    prev = int(indices[0])
    for v in indices[1:]:
        v = int(v)
        key = (prev, v)
        if key in table:
            prev = table[key]
            continue
        put(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            put(clear)
            table.clear()
            next_code = eoi + 1
            code_size = min_code_size + 1
        prev = v
    put(prev)
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _palette(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n,3), indices (h,w)) — exact when <=256 distinct colors,
    else a 6x7x6 uniform cube."""
    h, w = frame.shape[:2]
    flat = frame.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        return colors, inv.reshape(h, w).astype(np.int32)
    r = np.minimum(flat[:, 0].astype(np.int32) * 6 // 256, 5)
    g = np.minimum(flat[:, 1].astype(np.int32) * 7 // 256, 6)
    b = np.minimum(flat[:, 2].astype(np.int32) * 6 // 256, 5)
    idx = (r * 7 + g) * 6 + b
    pal = np.zeros((252, 3), np.uint8)
    for ri in range(6):
        for gi in range(7):
            for bi in range(6):
                pal[(ri * 7 + gi) * 6 + bi] = (
                    ri * 255 // 5, gi * 255 // 6, bi * 255 // 5
                )
    return pal, idx.reshape(h, w)


def encode_gif(frames, delay_ms: int = 100) -> bytes:
    """List of (h,w,3) uint8 arrays (or one array) -> GIF89a bytes; all
    frames full-size with a local palette each, disposal 'keep'."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise GifError("no frames")
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])  # no global table
    if len(frames) > 1:
        # Netscape looping extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        a = np.asarray(f, np.uint8)
        if a.shape[:2] != (h, w) or a.ndim != 3 or a.shape[2] != 3:
            raise GifError("all frames must be (h, w, 3) and same size")
        pal, idx = _palette(a)
        bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
        size_field = bits - 1
        table = np.zeros((1 << bits, 3), np.uint8)
        table[: len(pal)] = pal
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack(
                "<H", delay_ms // 10
            ) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x80 | size_field])
        out += table.tobytes()
        min_code = bits
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, idx.reshape(-1))
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
