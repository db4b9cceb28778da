"""Go-compatible scalar text primitives.

These reproduce, byte-for-byte, the text semantics of the reference Go
crawler (fou3fou3/Grawler):

- ``process_text``      <-> ``parsers.ProcessText``     (src/parsers/text.go:8-14)
- ``words_freq``        <-> ``parsers.TextWordsFreq``   (src/parsers/text.go:16-29)
- ``go_trim_space``     <-> ``strings.TrimSpace``       (used in src/parsers/html.go:88,111)
- ``to_valid_utf8``     <-> ``strings.ToValidUTF8(s,"")`` (src/crawler.go:287)
- ``go_json_str``       <-> Go encoding/json invalid-UTF-8 handling at the
                            Couchbase sink (src/db/db.go:64): each invalid
                            byte becomes one U+FFFD
- ``byte_prefix``       <-> Go string byte-slicing ``s[:min(n,len(s))]``
                            (src/utils/utils.go:125,129)

All functions operate on ``bytes`` where Go operates on raw (possibly
invalid-UTF-8) strings, and on ``str`` where the value is known valid.
"""

from __future__ import annotations

import re

# Go's unicode.IsSpace == Unicode White_Space property. Python's str.strip()
# default set additionally strips \x1c-\x1f (FS/GS/RS/US), which Go does NOT
# consider space — so we always pass this explicit charset.
GO_SPACE = (
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)

# Go regexp is RE2: \w and \b are ASCII ([0-9A-Za-z_]).  Python needs re.ASCII
# to match (its default \w is Unicode).  src/parsers/text.go:18
_WORD_RE = re.compile(r"\b\w+\b", re.ASCII)


def go_trim_space(s: str) -> str:
    """strings.TrimSpace — trim Unicode White_Space from both ends."""
    return s.strip(GO_SPACE)


def process_text(text: str) -> str:
    """parsers.ProcessText: remove ALL \\n and \\r (not replaced by a space),
    then trim ASCII spaces only (strings.Trim(text, " "))."""
    text = text.replace("\n", "").replace("\r", "")
    return text.strip(" ")


def words_freq(text: str) -> dict[str, int]:
    """parsers.TextWordsFreq: ASCII \\b\\w+\\b tokens, lowercased AFTER the
    match, counted into a dict (insertion order = first occurrence order)."""
    freq: dict[str, int] = {}
    for word in _WORD_RE.findall(text):
        word = word.lower()
        freq[word] = freq.get(word, 0) + 1
    return freq


def to_valid_utf8(b: bytes) -> str:
    """strings.ToValidUTF8(s, "") — drop every invalid byte.  With an empty
    replacement this is exactly Python's errors="ignore" decode."""
    return b.decode("utf-8", errors="ignore")


def go_json_str(b: bytes) -> str:
    """Decode bytes the way Go's encoding/json marshals an invalid-UTF-8
    string: utf8.DecodeRune consumes exactly ONE byte per invalid sequence and
    yields U+FFFD for it (so a truncated 3-byte sequence at end-of-string
    becomes TWO replacement chars, where Python's errors="replace" would emit
    one).  Needed for the byte-truncated metadata fallbacks
    (src/utils/utils.go:125,129) flowing into the JSON sink."""
    out: list[str] = []
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c < 0x80:
            out.append(chr(c))
            i += 1
            continue
        # determine sequence length from the lead byte
        if 0xC2 <= c <= 0xDF:
            need, lo, hi = 1, 0x80, 0xBF
        elif c == 0xE0:
            need, lo, hi = 2, 0xA0, 0xBF
        elif 0xE1 <= c <= 0xEC or c == 0xEE or c == 0xEF:
            need, lo, hi = 2, 0x80, 0xBF
        elif c == 0xED:
            need, lo, hi = 2, 0x80, 0x9F
        elif c == 0xF0:
            need, lo, hi = 3, 0x90, 0xBF
        elif 0xF1 <= c <= 0xF3:
            need, lo, hi = 3, 0x80, 0xBF
        elif c == 0xF4:
            need, lo, hi = 3, 0x80, 0x8F
        else:
            out.append("�")
            i += 1
            continue
        seq = b[i + 1 : i + 1 + need]
        ok = len(seq) == need and lo <= seq[0] <= hi and all(
            0x80 <= x <= 0xBF for x in seq[1:]
        )
        if not ok:
            out.append("�")
            i += 1
            continue
        out.append(b[i : i + 1 + need].decode("utf-8"))
        i += 1 + need
    return "".join(out)


def byte_prefix(s: str, n: int) -> bytes:
    """Go s[:min(n, len(s))] — a BYTE slice of the UTF-8 encoding (may split a
    multi-byte rune; callers sanitize with go_json_str at the sink)."""
    return s.encode("utf-8")[:n]


def sha256_hex(text: str) -> str:
    """utils.HashSHA256 (src/utils/utils.go:83-88) — unused helper in the
    reference; kept for API parity (the seen set uses xxhash64 instead)."""
    import hashlib

    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def is_valid_utf8(b: bytes) -> bool:
    """utf8.ValidString (src/utils/utils.go:182).  Go rejects surrogates and
    overlong encodings; Python's strict utf-8 decoder rejects the same set."""
    try:
        b.decode("utf-8", errors="strict")
        return True
    except UnicodeDecodeError:
        return False


# --- charset detection (WHATWG encoding sniffing, the subset a crawler
# needs; the reference assumes UTF-8 — Go x/net/html does too unless the
# caller transcodes — so this is an addition, not parity) ------------------

# WHATWG label -> Python codec for the labels that differ from their
# Python namesake.  The load-bearing rule: latin-1/iso-8859-1/ascii all
# mean windows-1252 on the web (https://encoding.spec.whatwg.org §4.2).
_CHARSET_LABELS = {
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "unicode-1-1-utf-8": "utf-8",
    "utf8": "utf-8",
    "iso-8859-15": "iso-8859-15",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""", re.I
)


def _norm_charset(label: str) -> str | None:
    import codecs

    label = label.strip().lower()
    label = _CHARSET_LABELS.get(label, label)
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def detect_charset(content_type: str, body: bytes) -> str:
    """Detected encoding name for a fetched page, by WHATWG priority:
    BOM (utf-8 / utf-16 le/be — certain, overrides everything) > the
    Content-Type header's charset= parameter > a <meta charset> /
    http-equiv declaration inside the first 1024 bytes (the spec's
    prescan window) > utf-8 default.  Unknown labels fall through to the
    next source; returned names are Python codec names."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if body[:2] == b"\xff\xfe":
        return "utf-16-le"
    if body[:2] == b"\xfe\xff":
        return "utf-16-be"
    for part in (content_type or "").split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset":
            enc = _norm_charset(v.strip().strip('"').strip("'"))
            if enc:
                return enc
    m = _META_CHARSET_RE.search(body[:1024])
    if m:
        enc = _norm_charset(m.group(1).decode("ascii", "replace"))
        if enc:
            return enc
    return "utf-8"


def decode_page(body: bytes, content_type: str = "") -> tuple[str, str]:
    """(decoded text, detected charset).  BOM bytes are stripped before
    decoding; undecodable bytes become U+FFFD (errors='replace' — the
    same per-byte replacement discipline as to_valid_utf8)."""
    enc = detect_charset(content_type, body)
    if enc == "utf-8" and body[:3] == b"\xef\xbb\xbf":
        body = body[3:]
    elif enc in ("utf-16-le", "utf-16-be") and body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        body = body[2:]
    return body.decode(enc, errors="replace"), enc


# WHATWG MIME-sniffing §7 pattern subset (https://mimesniff.spec.whatwg.org):
# the signatures a text crawler needs to catch header lies.  Order matters —
# first match wins, HTML tag patterns are whitespace-tolerant + case-insensitive.
_HTML_TAGS = (
    b"<!DOCTYPE HTML", b"<HTML", b"<HEAD", b"<SCRIPT", b"<IFRAME", b"<H1",
    b"<DIV", b"<FONT", b"<TABLE", b"<A", b"<STYLE", b"<TITLE", b"<B",
    b"<BODY", b"<BR", b"<P", b"<!--",
)
_MAGIC = (
    (b"%PDF-", "application/pdf"),
    (b"%!PS-Adobe-", "application/postscript"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b\x08", "application/x-gzip"),
)
# §5 binary data bytes: anything in this set forces a binary type
_BINARY_BYTES = frozenset(
    range(0x00, 0x09)
) | {0x0B} | frozenset(range(0x0E, 0x1B)) | frozenset(range(0x1C, 0x20))


def sniff_content_type(body: bytes) -> str:
    """Sniffed MIME type from the first 512 bytes (the spec's resource
    header), independent of what the server claimed: HTML tag patterns
    (whitespace-skipped, case-insensitive, terminated by space or '>'),
    then magic numbers, then the binary-byte check -> text/plain or
    application/octet-stream.  A crawler compares this against the
    Content-Type header: mismatches are mislabeled resources that would
    otherwise corrupt the extract stage (the reference trusts the header
    unconditionally, src/crawler.go:257)."""
    head = body[:512]
    stripped = head.lstrip(b"\t\n\x0c\r ")
    up = stripped.upper()
    for tag in _HTML_TAGS:
        if up.startswith(tag) and len(up) > len(tag) and up[len(tag)] in b" >":
            return "text/html"
    for magic, mime in _MAGIC:
        if head.startswith(magic):
            return mime
    if any(b in _BINARY_BYTES for b in head):
        return "application/octet-stream"
    return "text/plain"
