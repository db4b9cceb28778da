"""Pure-stdlib/numpy baseline JPEG codec (ITU-T T.81 / JFIF): marker
parse, Huffman entropy decode with byte-stuffing and restart markers,
dequantize + dezigzag, exact separable IDCT (DCT-III matrix — the
mathematical inverse, not a fast approximation), YCbCr->RGB (BT.601
full-range JFIF), and chroma upsampling for arbitrary (h,v) sampling
factors.  No libjpeg/PIL — the container has none, and the multimodal
stages need a REAL decode path for the web's dominant image format.

Supported: baseline sequential DCT (SOF0), 8-bit, grayscale and YCbCr
(any sampling factors incl. 4:4:4/4:2:2/4:2:0), restart intervals.
Rejected with a clear error: progressive (SOF2), arithmetic coding,
12-bit, hierarchical.

The encoder exists for fixtures and the resize stage's re-encode:
baseline, 4:4:4 or grayscale, the T.81 Annex-K example quantization
tables (quality-scaled per the IJG rule) and Annex-K typical Huffman
tables.  JPEG is lossy: roundtrips are near, not bit-exact; tests pin
closed-form cases (flat blocks, single-coefficient streams) exactly.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# orthonormal 8-point DCT-II matrix; IDCT = C.T @ block @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0] *= 1.0 / np.sqrt(2.0)


def _idct2(coef: np.ndarray) -> np.ndarray:
    """Exact 2-D inverse DCT of one 8x8 coefficient block."""
    return _C.T @ coef @ _C


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    stuffing; stops at any real marker (returns it via .marker)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None:
                # past a marker: feed 1-bits (T.81 F.2.2.5 padding rule)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            if self.pos >= len(d):
                self.marker = 0xD9  # treat EOF as EOI
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                self.marker = nxt  # real marker: stop consuming
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and realign.  The reader may or may
        not have OBSERVED the marker yet: with enough bits buffered the
        previous segment never triggered a fill, so the FF Dn bytes are
        still unconsumed at ``pos`` — handle both states."""
        self.acc = 0
        self.nbits = 0
        m = self.marker
        if m is not None:
            if 0xD0 <= m <= 0xD7:
                self.pos += 2  # skip FF Dn (pos still points at the FF)
                self.marker = None
            return
        d = self.data
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _Huff:
    """Canonical JPEG Huffman table -> (code-length, value) decode via a
    (maxlen) lookup of first-codes (T.81 F.2.2.3 DECODE procedure)."""

    def __init__(self, counts: list[int], values: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += n
            self.maxcode[ln] = code - 1 if n else -1
            k += n
            code <<= 1
        self.values = values
        # 8-bit prefix fast table: lut[peek8] = (value, code_length) for
        # every code of length <= 8 (covers ~all symbols in practice);
        # longer codes fall through to the sequential walk
        self.lut: list[tuple[int, int] | None] = [None] * 256
        k = 0
        code = 0
        for ln in range(1, 9):
            for _ in range(counts[ln - 1]):
                base = code << (8 - ln)
                for suffix in range(1 << (8 - ln)):
                    self.lut[base | suffix] = (values[k], ln)
                k += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        # fast path: one 8-bit peek + table hit (bit-identical to the
        # sequential walk; padding past markers is 1-bits, so a peek
        # never under-runs)
        if br.nbits < 8:
            br._fill()
        hit = self.lut[(br.acc >> (br.nbits - 8)) & 0xFF]
        if hit is not None:
            v, ln = hit
            br.nbits -= ln
            br.acc &= (1 << br.nbits) - 1
            return v
        code = br.bits(1)
        ln = 1
        while True:
            mx = self.maxcode[ln]
            if mx >= 0 and code <= mx:
                return self.values[self.valptr[ln] + code - self.mincode[ln]]
            ln += 1
            if ln > 16:
                raise JpegError("invalid Huffman code")
            code = (code << 1) | br.bits(1)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 (h, w) grayscale or (h, w, 3) RGB."""
    try:
        return _decode_jpeg(data)
    except JpegError:
        raise
    except (IndexError, KeyError, struct.error, ValueError) as e:
        raise JpegError(f"truncated/malformed JPEG: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hf: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.int32)
                    i += 64
                else:
                    tab = np.frombuffer(seg[i : i + 128], ">u2").astype(np.int32)
                    i += 128
                qt[tq] = tab
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                nv = sum(counts)
                hf[(tc, th)] = _Huff(counts, seg[i + 17 : i + 17 + nv])
                i += 17 + nv
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline(+ext seq)
            prec = seg[0]
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{m:02X} (progressive/arithmetic/hierarchical)")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tds = seg[1 + 2 * c : 3 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs), None)
                if comp is None:
                    raise JpegError(f"SOS references unknown component {cs}")
                scomp.append((comp, tds >> 4, tds & 0xF))
            # MJPEG streams legitimately omit DHT: decoders supply the
            # Annex K.3 typical tables (id 0 = luminance, 1 = chrominance)
            for tc, defaults in ((0, (_DC_L, _DC_C)), (1, (_AC_L, _AC_C))):
                for th in (0, 1):
                    if (tc, th) not in hf:
                        hf[(tc, th)] = _Huff(*defaults[th])
            for comp, td, ta in scomp:
                if (0, td) not in hf or (1, ta) not in hf:
                    raise JpegError(f"missing Huffman table {td}/{ta}")
            return _decode_scan(
                data, pos + 2 + seglen, frame, scomp, qt, hf, restart_interval
            )
        # APPn/COM/etc: skip
        pos += 2 + seglen
    raise JpegError("no SOS found")


def _decode_scan(data, pos, frame, scomp, qt, hf, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scomp]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component pixel planes at component resolution
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    ]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, (c, td, ta) in enumerate(scomp):
                dq = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, np.int32)
                        t = hf[(0, td)].decode(br)
                        diff = _extend(br.bits(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = hf[(1, ta)].decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC index out of range")
                            coef[k] = _extend(br.bits(s), s)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[_ZIGZAG] = coef * dq
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, 0), rx, 1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise JpegError(f"unsupported component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4 / grayscale, Annex-K tables)

# T.81 Annex K.1 example quantization tables (luminance, chrominance)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32)

# Annex K.3 typical Huffman tables: (bits counts, values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         bytes(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         bytes(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]))
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]))


def _enc_codes(counts, values):
    """Canonical code assignment: value -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """The IJG quality rule over an Annex-K table."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h,w) grayscale or (h,w,3) RGB -> baseline JFIF bytes.
    ``subsample=True`` emits 4:2:0 (2x2 luma per MCU, box-mean chroma);
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs —
    both exist chiefly so the DECODER's sampling/restart paths get real
    roundtrip coverage."""
    a = np.asarray(arr, np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise JpegError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 4:2:0 — box-mean chroma at half resolution
            def half(p):
                H2, W2 = (p.shape[0] + 1) // 2, (p.shape[1] + 1) // 2
                pp = np.empty((H2 * 2, W2 * 2))
                pp[: p.shape[0], : p.shape[1]] = p
                pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
                pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0

            planes = [y, half(cb), half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    qtabs = [ql] + ([] if gray else [qc, qc])
    dc_codes = [_enc_codes(*_DC_L)] + ([] if gray else [_enc_codes(*_DC_C)] * 2)
    ac_codes = [_enc_codes(*_AC_L)] + ([] if gray else [_enc_codes(*_AC_C)] * 2)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad every plane (edge replication) to its MCU-aligned block grid
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        H, W = mcuy * sv * 8, mcux * sh * 8
        pp = np.empty((H, W))
        ph, pw = p.shape
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[-1:, :]
        pp[:, pw:] = pp[:, pw - 1 : pw]
        padded.append(pp)

    # batched transform: all 8x8 blocks of a plane through ONE
    # broadcasted C @ B @ C.T + quantize + zigzag (numpy batched matmul
    # is bit-identical to the per-block product; asserted by the
    # encoder-equality tests)
    qz_all = []
    for ci, (pp, (sh, sv)) in enumerate(zip(padded, samp)):
        rows, cols = pp.shape[0] // 8, pp.shape[1] // 8
        blocks = (pp - 128.0).reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)
        coef = _C @ blocks @ _C.T
        qnat = np.round(coef / qtabs[ci].reshape(8, 8)).astype(np.int32)
        qz_all.append(qnat.reshape(rows, cols, 64)[:, :, _ZIGZAG])

    bw = _BitWriter()
    pred = [0] * len(planes)

    def put_block(ci, zz):
        dc = int(zz[0])
        diff = dc - pred[ci]
        pred[ci] = dc
        t = (diff if diff >= 0 else -diff).bit_length()
        code, ln = dc_codes[ci][t]
        if t:
            # one put per symbol: huffman code and magnitude bits are
            # MSB-first concatenated, so fusing them is bit-identical
            bw.put((code << t) | ((diff if diff >= 0 else diff + (1 << t) - 1) & ((1 << t) - 1)), ln + t)
        else:
            bw.put(code, ln)
        run = 0
        ac = ac_codes[ci]
        put = bw.put
        nz = np.flatnonzero(zz[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac[0xF0]
                put(code, ln)
                run -= 16
            s = (v if v >= 0 else -v).bit_length()
            code, ln = ac[(run << 4) | s]
            put((code << s) | ((v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1)), ln + s)
            run = 0
        if last < 63:
            code, ln = ac[0x00]
            put(code, ln)

    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            for ci, (sh, sv) in enumerate(samp):
                qz = qz_all[ci]
                for by in range(sv):
                    for bx in range(sh):
                        put_block(ci, qz[my * sv + by, mx * sh + bx])
            mcu_count += 1
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT carries the table in ZIGZAG order (T.81 B.2.4.1)
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in ql[_ZIGZAG]))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qc[_ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for tc, th, (counts, values) in (
        [(0, 0, _DC_L), (1, 0, _AC_L)] + ([] if gray else [(0, 1, _DC_C), (1, 1, _AC_C)])
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + values)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the SOF marker, no entropy
    decode — the cheap metadata path."""
    try:
        return _jpeg_meta(data)
    except JpegError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise JpegError(f"truncated/malformed JPEG: {e}") from e


def _jpeg_meta(data: bytes) -> tuple[int, int, int]:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        m = data[pos + 1]
        if m == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            seg = data[pos + 4 : pos + 2 + seglen]
            h, w = struct.unpack(">HH", seg[1:5])
            return w, h, seg[5]
        if m == 0xDA:
            break
        pos += 2 + seglen
    raise JpegError("no SOF found")
