"""Pure-stdlib container-metadata parsers for the two media families
whose DECODE genuinely needs ffmpeg: MP3 (MPEG audio framing) and MP4
(ISO BMFF).  A 100-TB crawl triages media long before it decodes it —
duration / dimensions / codec routing come from container headers, so
this layer makes the metadata half of the mp3/mp4 story REAL while the
sample-decode half stays an honest stub.

MP3: ID3v2 skip (syncsafe size, footer flag), frame-header walk across
all MPEG versions (1 / 2 / 2.5) and layers (I / II / III) with the spec
bitrate/samplerate tables, padding arithmetic, free-format rejection,
and the Xing/Info VBR header (version+mode-dependent side-info offset)
for frame counts; duration = frames x samples-per-frame / samplerate.

MP4: size/type box walk (32-bit, 64-bit ``largesize`` and to-EOF
sizes), ``ftyp`` major brand, ``mvhd`` timescale/duration (v0 and v1),
``tkhd`` presentation dims (16.16 fixed point), ``hdlr`` track types.

Both carry spec-shaped fixture WRITERS (valid framing around silent /
empty payloads) so tests pin the parsers against hand-computable
expectations; fuzzers feed truncations and random bytes.
"""

from __future__ import annotations

import struct


class Mp3Error(ValueError):
    pass


class Mp4Error(ValueError):
    pass


# bitrate tables, kbps; index 0 = free format (rejected), 15 = invalid
_BR = {
    # (version_group, layer): 14 rates
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if data[3] == 0xFF or data[4] == 0xFF or any(b & 0x80 for b in data[6:10]):
        raise Mp3Error("malformed ID3v2 header")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size + (10 if data[5] & 0x10 else 0)  # footer flag


def _parse_frame_header(data: bytes, pos: int):
    """-> (frame_bytes, samples_per_frame, samplerate, bitrate_bps,
    channels, version_bits, layer_num) or raises Mp3Error."""
    hdr = data[pos : pos + 4]
    if len(hdr) < 4:
        raise Mp3Error("truncated frame header")
    b0, b1, b2, b3 = hdr
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise Mp3Error(f"lost sync at {pos}")
    ver = (b1 >> 3) & 0x3  # 0=2.5, 2=2, 3=1; 1 reserved
    layer_bits = (b1 >> 1) & 0x3  # 1=III, 2=II, 3=I
    if ver == 1 or layer_bits == 0:
        raise Mp3Error("reserved version/layer")
    layer = 4 - layer_bits  # 1, 2, 3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx == 0:
        raise Mp3Error("free-format bitrate unsupported")
    if br_idx == 15 or sr_idx == 3:
        raise Mp3Error("invalid bitrate/samplerate index")
    vgroup = 1 if ver == 3 else 2
    bitrate = _BR[(vgroup, layer)][br_idx - 1] * 1000
    sr = _SR[ver][sr_idx]
    padding = (b2 >> 1) & 1
    channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
    if layer == 1:
        frame = (12 * bitrate // sr + padding) * 4
        spf = 384
    else:
        spf = 1152 if (layer == 2 or ver == 3) else 576
        frame = spf // 8 * bitrate // sr + padding
    return frame, spf, sr, bitrate, channels, ver, layer


def mp3_meta(data: bytes) -> dict:
    """MP3 bytes -> {"n_frames", "duration_ms", "sample_rate",
    "channels", "bitrate_kbps" (mean over frames), "layer", "mpeg25",
    "vbr", "id3_bytes"} by walking every frame (Xing/Info frame-count
    cross-checked when present)."""
    try:
        return _mp3_meta(data)
    except Mp3Error:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise Mp3Error(f"truncated/malformed MP3: {e}") from e


def _mp3_meta(data: bytes) -> dict:
    pos = _id3v2_size(data)
    if pos >= len(data):
        raise Mp3Error("no audio frames after ID3 tag")
    first = _parse_frame_header(data, pos)
    _, spf, sr, _, channels, ver, layer = first

    # Xing/Info VBR header: side-info offset depends on version + mode
    xing_frames = None
    if layer == 3:
        side = (17 if channels == 1 else 32) if ver == 3 else (9 if channels == 1 else 17)
        tagpos = pos + 4 + side
        tag = data[tagpos : tagpos + 4]
        if tag in (b"Xing", b"Info"):
            flags = struct.unpack_from(">I", data, tagpos + 4)[0]
            if flags & 1:
                xing_frames = struct.unpack_from(">I", data, tagpos + 8)[0]

    n_frames = 0
    bitrate_sum = 0
    distinct_br = set()
    while pos + 4 <= len(data):
        try:
            frame, spf_i, sr_i, br, _ch, _v, _l = _parse_frame_header(data, pos)
        except Mp3Error:
            if n_frames == 0:
                raise
            break  # trailing garbage / ID3v1 tag: stop at last good frame
        if pos + frame > len(data):
            if n_frames == 0:
                raise Mp3Error("first frame truncated")
            break
        if sr_i != sr:
            raise Mp3Error("samplerate change mid-stream")
        n_frames += 1
        bitrate_sum += br
        distinct_br.add(br)
        pos += frame
    if n_frames == 0:
        raise Mp3Error("no frames")
    # real encoders may exclude the Xing header frame from the count, so
    # n_frames-1 is also in agreement; anything else means truncation
    if xing_frames is not None and xing_frames not in (n_frames, n_frames - 1):
        raise Mp3Error(
            f"Xing frame count {xing_frames} != walked {n_frames} (truncated?)"
        )
    return {
        "n_frames": n_frames,
        "duration_ms": n_frames * spf * 1000 // sr,
        "sample_rate": sr,
        "channels": channels,
        "bitrate_kbps": bitrate_sum // n_frames // 1000,
        "layer": layer,
        "mpeg25": ver == 0,
        "vbr": len(distinct_br) > 1 or xing_frames is not None,
        "id3_bytes": _id3v2_size(data),
    }


_BR_REV = {
    (vg, l): {r: i + 1 for i, r in enumerate(rates)} for (vg, l), rates in _BR.items()
}


def write_mp3_frames(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    layer: int = 3,
    id3: bytes | None = None,
    xing: bool = False,
) -> bytes:
    """Spec-valid MPEG audio framing around zero payloads (silence-ish;
    this is a FIXTURE writer for the parser, not an encoder)."""
    ver = {44100: 3, 48000: 3, 32000: 3, 22050: 2, 24000: 2, 16000: 2,
           11025: 0, 12000: 0, 8000: 0}.get(sample_rate)
    if ver is None:
        raise Mp3Error(f"unsupported sample rate {sample_rate}")
    sr_idx = _SR[ver].index(sample_rate)
    vgroup = 1 if ver == 3 else 2
    br_idx = _BR_REV[(vgroup, layer)].get(bitrate_kbps)
    if br_idx is None:
        raise Mp3Error(f"invalid bitrate {bitrate_kbps} for v{vgroup} L{layer}")
    layer_bits = 4 - layer
    mode = 3 if channels == 1 else 0
    hdr = bytes(
        [
            0xFF,
            0xE0 | (ver << 3) | (layer_bits << 1) | 1,  # no CRC
            (br_idx << 4) | (sr_idx << 2),
            mode << 6,
        ]
    )
    bitrate = bitrate_kbps * 1000
    if layer == 1:
        frame = (12 * bitrate // sample_rate) * 4
        spf = 384
    else:
        spf = 1152 if (layer == 2 or ver == 3) else 576
        frame = spf // 8 * bitrate // sample_rate
    body = bytearray(hdr) + bytes(frame - 4)
    if xing and layer == 3:
        side = (17 if channels == 1 else 32) if ver == 3 else (9 if channels == 1 else 17)
        at = 4 + side
        body[at : at + 4] = b"Xing"
        body[at + 4 : at + 8] = struct.pack(">I", 1)  # frames flag
        body[at + 8 : at + 12] = struct.pack(">I", n_frames)
    out = bytearray()
    if id3 is not None:
        size = len(id3)
        out += b"ID3\x04\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += id3
    out += body
    plain = bytes(hdr) + bytes(frame - 4)
    out += plain * (n_frames - 1)
    return bytes(out)


# --- MP4 / ISO BMFF --------------------------------------------------------


def _walk_boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4Error(f"bad box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def mp4_meta(data: bytes) -> dict:
    """MP4 bytes -> {"brand", "duration_ms", "timescale", "width",
    "height", "track_types"} from the ftyp/moov box tree (no sample
    decode — that is the genuine ffmpeg slot)."""
    try:
        return _mp4_meta(data)
    except Mp4Error:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise Mp4Error(f"truncated/malformed MP4: {e}") from e


def _mp4_meta(data: bytes) -> dict:
    if len(data) < 8:
        raise Mp4Error("too short for a box")
    brand = ""
    timescale = duration = 0
    width = height = 0
    track_types: list[str] = []
    saw_ftyp = saw_moov = False
    for btype, body, bend in _walk_boxes(data, 0, len(data)):
        if btype == b"ftyp":
            brand = data[body : body + 4].decode("ascii", "replace").strip()
            saw_ftyp = True
        elif btype == b"moov":
            saw_moov = True
            for b2, s2, e2 in _walk_boxes(data, body, bend):
                if b2 == b"mvhd":
                    v = data[s2]
                    if v == 1:
                        timescale = struct.unpack_from(">I", data, s2 + 20)[0]
                        duration = struct.unpack_from(">Q", data, s2 + 24)[0]
                    else:
                        timescale = struct.unpack_from(">I", data, s2 + 12)[0]
                        duration = struct.unpack_from(">I", data, s2 + 16)[0]
                elif b2 == b"trak":
                    for b3, s3, e3 in _walk_boxes(data, s2, e2):
                        if b3 == b"tkhd":
                            v = data[s3]
                            off = s3 + (88 if v == 1 else 76)
                            w = struct.unpack_from(">I", data, off)[0] >> 16
                            h = struct.unpack_from(">I", data, off + 4)[0] >> 16
                            width, height = max(width, w), max(height, h)
                        elif b3 == b"mdia":
                            for b4, s4, _e4 in _walk_boxes(data, s3, e3):
                                if b4 == b"hdlr":
                                    track_types.append(
                                        data[s4 + 8 : s4 + 12].decode(
                                            "ascii", "replace"
                                        )
                                    )
    if not saw_ftyp or not saw_moov:
        raise Mp4Error("missing ftyp/moov box")
    if timescale == 0:
        raise Mp4Error("missing/zero mvhd timescale")
    return {
        "brand": brand,
        "duration_ms": duration * 1000 // timescale,
        "timescale": timescale,
        "width": width,
        "height": height,
        "track_types": sorted(track_types),
    }


def write_mp4(
    duration_ms: int = 1000,
    timescale: int = 600,
    width: int = 640,
    height: int = 360,
    tracks: tuple[str, ...] = ("vide", "soun"),
    brand: str = "isom",
    largesize_mdat: bool = False,
) -> bytes:
    """Minimal spec-valid ISO BMFF tree (FIXTURE writer for the
    parser): ftyp + moov(mvhd + trak(tkhd + mdia(hdlr))*) + mdat."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    duration = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + bytes(80),
    )
    traks = b""
    for i, tt in enumerate(tracks):
        # tkhd v0 body: width @76, height @80 (16.16 fixed point)
        tkhd = bytearray(b"\x00\x00\x00\x07" + bytes(84))
        if tt == "vide":
            tkhd[76:80] = struct.pack(">I", width << 16)
            tkhd[80:84] = struct.pack(">I", height << 16)
        hdlr = box(
            b"hdlr", b"\x00\x00\x00\x00" + b"\x00\x00\x00\x00" + tt.encode() + bytes(13)
        )
        mdia = box(b"mdia", hdlr)
        traks += box(b"trak", box(b"tkhd", bytes(tkhd)) + mdia)
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", brand.encode() + struct.pack(">I", 0) + b"isom")
    payload = b"\x00" * 32
    if largesize_mdat:
        mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    else:
        mdat = box(b"mdat", payload)
    return ftyp + moov + mdat
