"""Pure-stdlib AVI (RIFF) container codec for MJPEG video — the VIDEO
leg of the multimodal stack made real: Motion-JPEG is just a sequence of
baseline JPEG frames in RIFF chunks, and the repo already carries a
from-scratch T.81 JPEG codec (``functions/jpeg.py``), so container
parsing (plain struct walking) is all that separates "video is a stub"
from real decoded video frames.  Inter-coded formats (mp4/h264/webm)
remain the honest ffmpeg stub — they need a motion-compensation decoder,
not a container walk.

Supported: 'RIFF AVI ' with LIST hdrl (avih + one or more LIST strl of
strh/strf), LIST movi holding '##dc'/'##db' video chunks directly or
nested in 'LIST rec ' groups, JUNK/padding chunks, odd-size word
alignment, optional idx1 (ignored — frames stream in chunk order).  The
encoder writes spec-shaped MJPEG AVIs (avih, vids strh with
scale/rate = 1/fps, BITMAPINFOHEADER strf with 'MJPG', idx1) from numpy
frames via ``encode_jpeg`` for fixtures and roundtrip tests.

Reference parity note: the Grawler reference has no video path at all
(fou3fou3/Grawler handles html/pdf only — src/parsers); this module is
part of the beyond-reference LLM-data-pipeline surface.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import JpegError, decode_jpeg, encode_jpeg


class AviError(ValueError):
    pass


def _u32(data: bytes, pos: int) -> int:
    if pos + 4 > len(data):
        raise AviError("truncated u32")
    return struct.unpack_from("<I", data, pos)[0]


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in [pos, end);
    LIST chunks yield ('LIST:' + list_type, ...) over their payload."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = _u32(data, pos + 4)
        body = pos + 8
        if body + size > len(data):
            raise AviError(f"truncated chunk {cid!r}")
        yield cid, body, size
        pos = body + size + (size & 1)


def avi_meta(data: bytes) -> dict:
    """AVI bytes -> {"width", "height", "n_frames", "fps_milli",
    "codec"} from the hdrl headers (no frame decode)."""
    try:
        return _avi_meta(data)
    except AviError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise AviError(f"truncated/malformed AVI: {e}") from e


def _check_riff(data: bytes) -> int:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not an AVI (bad RIFF/AVI header)")
    return min(12 + _u32(data, 4) - 4, len(data))


def _avi_meta(data: bytes) -> dict:
    end = _check_riff(data)
    width = height = n_frames = 0
    fps_milli = 0
    codec = ""
    saw_hdrl = False
    for cid, body, size in _walk_chunks(data, 12, end):
        if cid != b"LIST" or data[body : body + 4] != b"hdrl":
            continue
        saw_hdrl = True
        for c2, b2, s2 in _walk_chunks(data, body + 4, body + size):
            if c2 == b"avih" and s2 >= 40:
                usec, _mbps, _pad, _flags, total = struct.unpack_from(
                    "<IIIII", data, b2
                )
                n_frames = total
                width = _u32(data, b2 + 32)
                height = _u32(data, b2 + 36)
                if usec > 0:
                    fps_milli = 1_000_000_000 // usec
            elif c2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                for c3, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                    if c3 == b"strh" and s3 >= 56:
                        if data[b3 : b3 + 4] == b"vids":
                            codec = (
                                data[b3 + 4 : b3 + 8].decode("ascii", "replace").strip()
                            )
                            scale = _u32(data, b3 + 20)
                            rate = _u32(data, b3 + 24)
                            if scale > 0:
                                fps_milli = rate * 1000 // scale
    if not saw_hdrl:
        raise AviError("missing hdrl list")
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "fps_milli": int(fps_milli),
        "codec": codec,
    }


def _iter_video_chunks(data: bytes):
    """Yield raw video frame bytes ('##dc'/'##db' chunks) in stream
    order, recursing one level into 'LIST rec ' groups."""
    end = _check_riff(data)
    for cid, body, size in _walk_chunks(data, 12, end):
        if cid != b"LIST" or data[body : body + 4] != b"movi":
            continue
        for c2, b2, s2 in _walk_chunks(data, body + 4, body + size):
            if c2 == b"LIST" and data[b2 : b2 + 4] == b"rec ":
                for c3, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                    if c3[2:4] in (b"dc", b"db"):
                        yield data[b3 : b3 + s3]
            elif c2[2:4] in (b"dc", b"db"):
                yield data[b2 : b2 + s2]


def decode_avi(
    data: bytes, stride: int = 1, max_frames: int | None = None
) -> list[dict]:
    """AVI bytes -> list of ``{"frame_idx": i, "image": (h, w, c)
    uint8}`` — every ``stride``-th MJPEG frame, ACTUALLY decoded through
    the from-scratch JPEG codec.  Raises AviError for a non-AVI /
    truncated container or a non-MJPEG frame payload."""
    try:
        out = []
        for i, frame in enumerate(_iter_video_chunks(data)):
            if i % stride:
                continue
            if not frame.startswith(b"\xff\xd8"):
                raise AviError(f"frame {i} is not MJPEG (codec needs ffmpeg)")
            try:
                img = decode_jpeg(frame)
            except JpegError as e:
                raise AviError(f"frame {i}: {e}") from e
            out.append({"frame_idx": i, "image": img})
            if max_frames is not None and len(out) >= max_frames:
                break
        return out
    except AviError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        raise AviError(f"truncated/malformed AVI: {e}") from e


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """numpy frames (h, w[, 3]) -> MJPEG AVI bytes (avih + vids strl +
    movi '00dc' chunks + idx1)."""
    if not frames:
        raise AviError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise AviError("frames must share dimensions")
        jpegs.append(encode_jpeg(f, quality=quality))
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # usec per frame
        max_size * fps,  # max bytes/sec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(jpegs),
        0,  # initial frames
        1,  # streams
        max_size,
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0,  # flags, priority, language
            0,  # initial frames
            1, fps,  # scale, rate -> fps
            0, len(jpegs),  # start, length
            max_size, 0xFFFFFFFF, 0,  # buffer, quality, sample size
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0
    )  # BITMAPINFOHEADER, biCompression='MJPG'

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = bytearray(b"movi")
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body) - 4 + 4, len(j))
        movi_body += chunk(b"00dc", j)
    movi = chunk(b"LIST", bytes(movi_body))
    idx1 = chunk(b"idx1", bytes(idx))

    payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload
