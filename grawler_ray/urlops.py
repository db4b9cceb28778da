"""Go-compatible URL primitives + canonicalization + xxhash64.

Reproduces the URL semantics of the reference Go crawler:

- ``extract_url_components``  <-> ``utils.ExtractUrlComponents`` (net/url
  ``url.Parse``; src/utils/utils.go:47-53).  Returns (scheme, host, path) or
  raises ``UrlError``.  Matches Go behavior on the cases the crawl exercises:
  scheme lowercased, host includes the port and excludes userinfo, path is
  percent-DECODED (so ``/robots%2etxt`` hits the ``/robots.txt`` block in
  ``urlAllowed``, src/crawler.go:207), errors on ASCII control characters, on
  invalid %-escapes, on invalid host bytes, and on ``://`` (missing scheme).
- ``go_query_unescape``       <-> ``url.QueryUnescape`` (src/utils/utils.go:55-62):
  '+' becomes ' ', '%xx' decoded, malformed escape => error.
- ``child_url_allowed``       <-> ``utils.childUrlAllowed`` (src/utils/utils.go:161-183).
- ``url_allowed``             <-> ``urlAllowed`` (src/crawler.go:204-220).
- ``canonical_url`` / ``xxhash64``: seen-set keying (our scale addition — the
  reference keys its seen map by the exact raw URL string, src/crawler.go:191;
  strict-conformance mode hashes the raw string instead).
"""

from __future__ import annotations

import struct

from .textops import is_valid_utf8

_HEX = "0123456789abcdefABCDEF"


class UrlError(ValueError):
    """Equivalent of a non-nil error from Go net/url."""


def _has_ctl(s: str) -> bool:
    # net/url rejects ASCII control characters anywhere in the URL
    return any(ord(c) < 0x20 or ord(c) == 0x7F for c in s)


def _unescape_component(s: str, plus_to_space: bool) -> str:
    """Percent-decode one component, Go ``unescape`` semantics: every '%' must
    be followed by two hex digits, else error.  Decoding happens at the BYTE
    level (the result may be invalid UTF-8; we keep it as a str of the decoded
    bytes via latin-1 round-trip internally and re-decode, mirroring Go's
    byte-string model — callers that need UTF-8 validity check it separately).
    """
    if "%" not in s and (not plus_to_space or "+" not in s):
        return s
    out = bytearray()
    raw = s.encode("utf-8")
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        if b == 0x25:  # '%'
            if i + 2 >= n or chr(raw[i + 1]) not in _HEX or chr(raw[i + 2]) not in _HEX:
                raise UrlError(f"invalid URL escape {s[i:i+3]!r}")
            out.append(int(raw[i + 1 : i + 3].decode(), 16))
            i += 3
        elif plus_to_space and b == 0x2B:  # '+'
            out.append(0x20)
            i += 1
        else:
            out.append(b)
            i += 1
    # Go strings are byte strings; surface the decoded bytes as a str using
    # surrogateescape so invalid UTF-8 survives until the validity check.
    return out.decode("utf-8", errors="surrogateescape")


def go_query_unescape(s: str) -> str:
    """url.QueryUnescape: '+' -> ' ', %xx decoded, malformed => UrlError."""
    return _unescape_component(s, plus_to_space=True)


# RFC 3986 reg-name + sub-delims + ':' (port) — what Go's parseHost accepts
# for a non-bracketed host (net/url shouldEscape(c, encodeHost)).
_HOST_OK = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-._~!$&'()*+,;=:%[]<>\""
)
# NOTE: Go's encodeHost set genuinely admits <>" (historical quirk of
# net/url); space and other bytes error with "invalid character ... in host".


def extract_url_components(link: str) -> tuple[str, str, str]:
    """Go utils.ExtractUrlComponents: url.Parse(link) -> (Scheme, Host, Path).

    Raises UrlError where url.Parse returns an error.
    """
    if _has_ctl(link):
        raise UrlError("net/url: invalid control character in URL")

    rest = link
    # strip fragment first (Go: Parse strips #frag before parsing)
    frag = rest.find("#")
    if frag >= 0:
        rest = rest[:frag]

    # scheme: [a-zA-Z][a-zA-Z0-9+-.]* ':'
    scheme = ""
    for i, c in enumerate(rest):
        if c.isalpha() and c.isascii():
            continue
        if i > 0 and (c.isdigit() or c in "+-."):
            continue
        if c == ":":
            if i == 0:
                raise UrlError("missing protocol scheme")
            scheme = rest[:i].lower()
            rest = rest[i + 1 :]
        break

    # query split (kept, unused — crawl only needs scheme/host/path)
    q = rest.find("?")
    if q >= 0:
        rest = rest[:q]

    host = ""
    if rest.startswith("//"):
        authority = rest[2:]
        slash = len(authority)
        for j, c in enumerate(authority):
            if c == "/":
                slash = j
                break
        rest = authority[slash:]
        authority = authority[:slash]
        # userinfo
        at = authority.rfind("@")
        if at >= 0:
            authority = authority[at + 1 :]
        host = authority
        if host.startswith("["):
            end = host.find("]")
            if end < 0:
                raise UrlError("missing ']' in host")
        else:
            for c in host:
                if c not in _HOST_OK:
                    raise UrlError(f"invalid character {c!r} in host name")
            # validate %-escapes in host
            _unescape_component(host, plus_to_space=False)
    elif scheme and not rest.startswith("/"):
        # opaque URL (mailto:foo@bar) — Go sets Opaque, Path stays ""
        return scheme, "", ""

    path = _unescape_component(rest, plus_to_space=False)
    return scheme, host, path


def url_allowed(
    scheme: str,
    host: str,
    path: str,
    allowed_schemes: tuple[str, ...] = ("http", "https"),
    blocked_paths: tuple[str, ...] = ("/robots.txt",),
) -> bool:
    """urlAllowed (src/crawler.go:204-220): scheme allow-list, (empty) host
    blocklist is the caller's job, path blocklist.  The reference hardwires
    the literals; they are config here (CrawlConfig.allowed_schemes /
    blocked_paths) with the reference values as defaults."""
    if scheme not in allowed_schemes:
        return False
    if path in blocked_paths:
        return False
    return True


def child_url_allowed(url: str, base_url: str) -> str | None:
    """utils.childUrlAllowed (src/utils/utils.go:161-183): returns the
    normalized child URL to enqueue, or None if the child is dropped.

    Order of operations exactly as in Go: empty check; QueryUnescape (error =>
    drop); first-char '#' or '?' => drop; first-char '/' => BaseUrl + url;
    finally utf8.ValidString must hold.
    """
    if url == "":
        return None
    try:
        url = go_query_unescape(url)
    except UrlError:
        return None
    c0 = url[0]
    if c0 == "#" or c0 == "?":
        return None
    if c0 == "/":
        url = base_url + url
    # utf8.ValidString on the decoded bytes
    b = url.encode("utf-8", errors="surrogateescape")
    if not is_valid_utf8(b):
        return None
    return url


def canonical_url(url: str) -> str:
    """Canonicalization for seen-set keying (our addition, per the north rule):
    lowercase scheme and host, strip default port, drop fragment.  The
    reference uses raw-string equality (src/crawler.go:191); strict-conformance
    mode passes the raw URL here instead (see CrawlConfig.canonicalize)."""
    try:
        scheme, host, path = extract_url_components(url)
    except UrlError:
        return url
    host = host.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    if path == "":
        path = "/"
    return f"{scheme}://{host}{path}"


# ---------------------------------------------------------------------------
# xxhash64 — XXH64 (https://github.com/Cyan4973/xxHash, public domain spec).
# Used to key the sharded seen-set (north rule: "canonicalized + xxhash64
# URLs").  The C `xxhash` wheel is used when installed (cluster images);
# this container lacks it, so a pure-Python implementation of the public
# algorithm is the fallback — bit-identical outputs (tests/test_urlops.py).
# ---------------------------------------------------------------------------

try:  # pragma: no cover - exercised only where the wheel exists
    from xxhash import xxh64_intdigest as _xxh64_c
except ImportError:
    _xxh64_c = None

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxhash64(data: bytes | str, seed: int = 0) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    if _xxh64_c is not None:
        return _xxh64_c(data, seed)
    return _xxhash64_py(data, seed)


def _xxhash64_py(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        nchunks = n // 32
        lanes = struct.unpack_from(f"<{nchunks * 4}Q", data)
        for i in range(0, nchunks * 4, 4):
            v1 = _round(v1, lanes[i])
            v2 = _round(v2, lanes[i + 1])
            v3 = _round(v3, lanes[i + 2])
            v4 = _round(v4, lanes[i + 3])
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
        i = nchunks * 32
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# --- vectorized batch XXH64 -------------------------------------------------
# The seen-set keys every frontier URL per round; at 10^8-row rounds the
# pure-Python per-URL loop above is the bottleneck (VERDICT r3 item 8).
# This batch variant runs the same public XXH64 algorithm across a whole
# batch with masked numpy uint64 ops: cost ~ (max_stripes*4 + 13) vector ops
# per batch instead of ~200 Python bytecodes per URL.  Bit-identical to
# xxhash64() (tests/test_urlops.py::TestXxhashBatch).

def xxhash64_batch(items, seed: int = 0):
    """XXH64 of every str/bytes in ``items`` -> np.ndarray[uint64]."""
    import sys

    import numpy as np

    bs = [x.encode("utf-8") if isinstance(x, str) else x for x in items]
    N = len(bs)
    if N == 0:
        return np.zeros(0, np.uint64)
    if _xxh64_c is not None:  # pragma: no cover - wheel absent here
        return np.fromiter((_xxh64_c(b, seed) for b in bs), np.uint64, N)
    if sys.byteorder != "little":  # pragma: no cover
        return np.fromiter((_xxhash64_py(b, seed) for b in bs), np.uint64, N)

    P1, P2, P3, P4, P5 = (np.uint64(p) for p in (_P1, _P2, _P3, _P4, _P5))
    u64 = np.uint64
    lens = np.fromiter((len(b) for b in bs), np.int64, N)
    maxlen = int(lens.max())
    # width: multiple of 8 with >=7 spare bytes so every masked read below
    # (q-word at i, dword at i, bytes at i..i+6) stays in bounds
    W = ((maxlen + 8) + 7) // 8 * 8
    # zero-pad every string to W in C (bytes.ljust + join), view as a row
    # matrix — read-only is fine, the kernel never writes the buffer
    buf = np.frombuffer(
        b"".join(b.ljust(W, b"\0") for b in bs), np.uint8
    ).reshape(N, W)
    q = buf.view(np.uint64)   # (N, W//8) little-endian q-words
    d = buf.view(np.uint32)   # (N, W//4) dwords
    rows = np.arange(N)

    def rotl(x, r):
        return (x << u64(r)) | (x >> u64(64 - r))

    def rnd(acc, inp):
        return rotl(acc + inp * P2, 31) * P1

    sd = u64(seed)
    nstripes = lens // 32
    maxs = int(nstripes.max())
    v1 = np.full(N, u64((seed + _P1 + _P2) & _M64), u64)
    v2 = np.full(N, u64((seed + _P2) & _M64), u64)
    v3 = np.full(N, sd, u64)
    v4 = np.full(N, u64((seed - _P1) & _M64), u64)
    for j in range(maxs):
        m = nstripes > j
        c = 4 * j
        v1[m] = rnd(v1[m], q[m, c])
        v2[m] = rnd(v2[m], q[m, c + 1])
        v3[m] = rnd(v3[m], q[m, c + 2])
        v4[m] = rnd(v4[m], q[m, c + 3])
    h_big = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
    for v in (v1, v2, v3, v4):
        h_big = (h_big ^ rnd(np.zeros(N, u64), v)) * P1 + P4
    h = np.where(nstripes > 0, h_big, np.full(N, sd + P5, u64))
    h = h + lens.astype(u64)
    i = nstripes * 32
    for _ in range(3):  # tail q-words: at most 3 in a <32-byte tail
        m = i + 8 <= lens
        if not m.any():
            break
        val = q[rows[m], (i[m] >> 3)]
        h[m] = (rotl(h[m] ^ rnd(np.zeros(int(m.sum()), u64), val), 27) * P1) + P4
        i[m] += 8
    m = i + 4 <= lens
    if m.any():
        val32 = d[rows[m], (i[m] >> 2)].astype(u64)
        h[m] = (rotl(h[m] ^ (val32 * P1), 23) * P2) + P3
        i[m] += 4
    for _ in range(7):  # tail bytes
        m = i < lens
        if not m.any():
            break
        byte = buf[rows[m], i[m]].astype(u64)
        h[m] = rotl(h[m] ^ (byte * P5), 11) * P1
        i[m] += 1
    h ^= h >> u64(33)
    h *= P2
    h ^= h >> u64(29)
    h *= P3
    h ^= h >> u64(32)
    return h
