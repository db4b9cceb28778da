"""PDF text extraction (S8, utils.ReadPdfFromBytes src/utils/utils.go:100-121).

Unreachable in the reference pipeline: ``documentAllowed`` admits only
text/html and text/plain (src/crawler.go:275) and nothing ever calls
``ReadPdfFromBytes`` — it is dead code there.  Still part of the API
surface, so implemented for real here with a pure-stdlib extractor
(zlib is in the standard library):

- walks every ``<< dict >> stream ... endstream`` object; applies
  /FlateDecode when declared (anything else is skipped — no CMaps, no
  encryption, no object streams);
- runs a tiny content-stream tokenizer over the text operators the
  reference's library also reduces to: ``Tj`` / ``'`` / ``"`` (show
  string), ``TJ`` (array of strings + kerns), with ``Td/TD/T*`` treated
  as line breaks;
- literal ``( )`` strings decode the standard escapes (\\n, \\t, octal,
  line continuation, nested parens); ``<hex>`` strings decode hex bytes;
  output bytes are decoded latin-1 (single-byte fonts; multi-byte CID
  text is out of scope and comes out garbled, as it does in most
  plain-text extractors without CMap support).

A ``pypdf`` fast path is used when the wheel exists (not in this
container); outputs of the two paths are not guaranteed identical.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
# text-showing + line ops inside a content stream
_TOKEN_RE = re.compile(
    rb"""
    \((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<litop>Tj|'|")   # (string) Tj / ' / "
  | <(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hexop>Tj|'|")       # <hex> Tj / ' / "
  | \[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ                    # [ ... ] TJ
  | (?P<nl>T\*|Td|TD)                                   # line moves
    """,
    re.VERBOSE | re.DOTALL,
)
_ARR_STR_RE = re.compile(rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>")

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _decode_literal(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i]
        if c in _ESCAPES:
            out += _ESCAPES[c]
            i += 1
        elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j - i < 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif c in (0x0A, 0x0D):  # line continuation
            i += 1
            if c == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


def _decode_hex(raw: bytes) -> bytes:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"  # PDF spec: odd final digit implies trailing 0
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _content_text(stream: bytes) -> str:
    parts: list[str] = []
    for m in _TOKEN_RE.finditer(stream):
        if m.group("litop"):
            parts.append(_decode_literal(m.group("lit")).decode("latin-1"))
            if m.group("litop") in (b"'", b'"'):
                parts.append("\n")
        elif m.group("hexop"):
            parts.append(_decode_hex(m.group("hex")).decode("latin-1"))
            if m.group("hexop") in (b"'", b'"'):
                parts.append("\n")
        elif m.group("arr") is not None:
            for s in _ARR_STR_RE.finditer(m.group("arr")):
                if s.group("lit") is not None:
                    parts.append(_decode_literal(s.group("lit")).decode("latin-1"))
                else:
                    parts.append(_decode_hex(s.group("hex")).decode("latin-1"))
        elif m.group("nl"):
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
    return "".join(parts)


def extract_pdf_text(data: bytes) -> str:
    """Concatenated text runs of every decodable content stream, in file
    order — the shape of ledongthuc/pdf's page-concatenated GetPlainText
    (utils.go:108-119)."""
    out: list[str] = []
    for m in _STREAM_RE.finditer(data):
        d, body = m.group(1), m.group(2)
        # honor the declared /Length (the spec's byte count) — stripping
        # EOLs instead corrupts compressed bodies whose deflate bytes end
        # in 0x0a/0x0d (~0.6% of real streams); indirect lengths
        # (/Length 5 0 R) don't match and fall back to the strip
        mlen = re.search(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)", d)
        if mlen is not None and int(mlen.group(1)) <= len(body):
            body = body[: int(mlen.group(1))]
        else:
            body = body.strip(b"\r\n")
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif re.search(rb"/Filter", d):
            continue  # unsupported filter (DCT, LZW, ...)
        if b"BT" not in body:
            continue  # not a text content stream
        txt = _content_text(body)
        if txt:
            out.append(txt)
    return "".join(out)


def read_pdf_from_bytes(b: bytes, fake: bool = False) -> str:
    """Plain text of a PDF body (↔ ReadPdfFromBytes).  ``fake=True`` keeps
    the old deterministic stand-in for plumbing tests."""
    if fake:
        return " ".join(f"page{i}" for i in range(max(1, len(b) // 1024)))
    try:
        import pypdf
        from io import BytesIO

        reader = pypdf.PdfReader(BytesIO(b))
        return "".join(page.extract_text() or "" for page in reader.pages)
    except ImportError:
        pass
    return extract_pdf_text(b)


def build_simple_pdf(text: str, flate: bool = False, hex_encode: bool = False) -> bytes:
    """Fixture writer: a minimal one-stream PDF whose extracted text is
    EXACTLY ``text`` (single Tj, literal escaping or hex encoding,
    optional FlateDecode) — the differential-oracle counterpart of
    write_warc/write_sitemap.  Latin-1-encodable text only."""
    raw = text.encode("latin-1")
    if hex_encode:
        s = b"<" + raw.hex().encode("ascii") + b">"
    else:
        esc = (
            raw.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(")
            .replace(b")", b"\\)")
        )
        s = b"(" + esc + b")"
    content = b"BT /F1 12 Tf 72 700 Td " + s + b" Tj ET"
    if flate:
        body = zlib.compress(content)
        d = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
    else:
        body = content
        d = b"<< /Length %d >>" % len(body)
    return (
        b"%PDF-1.4\n1 0 obj\n" + d + b"\nstream\n" + body + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
