"""Real PDF text extraction (S8): hand-crafted minimal PDFs, uncompressed
and FlateDecode, literal/hex/TJ strings, escapes, and graceful fallbacks."""

import zlib

from grawler_ray.functions.pdf import extract_pdf_text, read_pdf_from_bytes


def _pdf_with_stream(content: bytes, flate: bool = False) -> bytes:
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


CONTENT = (
    b"BT /F1 12 Tf 72 700 Td (Hello World) Tj T* (second line) Tj ET\n"
)


def test_uncompressed_stream():
    assert extract_pdf_text(_pdf_with_stream(CONTENT)) == "Hello World\nsecond line"


def test_flate_stream():
    assert extract_pdf_text(_pdf_with_stream(CONTENT, flate=True)) == "Hello World\nsecond line"


def test_tj_array_and_hex():
    c = b"BT [ (Wor) -120 (ld) ] TJ <48495821> Tj ET"
    assert extract_pdf_text(_pdf_with_stream(c)) == "WorldHIX!"


def test_escapes_and_octal():
    c = rb"BT (a\(b\)c\\d\164e\n) Tj ET"
    # \164 is octal for 't'; \n escape decodes to newline
    assert extract_pdf_text(_pdf_with_stream(c)) == "a(b)c\\dte\n"


def test_quote_operator_newline():
    c = b"BT (one) ' (two) ' ET"
    assert extract_pdf_text(_pdf_with_stream(c)) == "one\ntwo\n"


def test_multiple_streams_concatenate():
    p1 = _pdf_with_stream(b"BT (A) Tj ET")
    # append a second object with its own stream
    extra = b"2 0 obj\n<< /Length 12 >>\nstream\nBT (B) Tj ET\nendstream\nendobj\n"
    data = p1.replace(b"trailer", extra + b"trailer")
    assert extract_pdf_text(data) == "AB"


def test_non_text_and_broken_streams_skipped():
    # image-ish stream (no BT), unsupported filter, corrupt flate
    data = (
        _pdf_with_stream(b"raw image bytes no text op")
        + b"3 0 obj\n<< /Filter /DCTDecode /Length 4 >>\nstream\n\xff\xd8\xff\xd9\nendstream\nendobj\n"
        + b"4 0 obj\n<< /Filter /FlateDecode /Length 4 >>\nstream\nnope\nendstream\nendobj\n"
    )
    assert extract_pdf_text(data) == ""


def test_read_pdf_from_bytes_real_and_fake():
    pdf = _pdf_with_stream(CONTENT, flate=True)
    assert "Hello World" in read_pdf_from_bytes(pdf)
    assert read_pdf_from_bytes(b"x" * 3000, fake=True) == "page0 page1"


def test_length_honored_over_eol_strip():
    """A FlateDecode body whose compressed bytes END in 0x0a must survive:
    /Length is the byte count, trailing-EOL stripping would truncate it."""
    import itertools

    from grawler_ray.functions.pdf import build_simple_pdf

    # find a text whose deflate output ends with \n (brute-force suffix)
    for n in itertools.count():
        txt = "padpad" * 3 + "x" * (n % 17) + f" tail{n}"
        content = b"BT /F1 12 Tf 72 700 Td (" + txt.encode() + b") Tj ET"
        if zlib.compress(content).endswith((b"\n", b"\r")):
            break
    data = build_simple_pdf(txt, flate=True)
    assert extract_pdf_text(data) == txt
    # indirect /Length reference falls back to the strip heuristic
    data2 = _pdf_with_stream(CONTENT).replace(
        b"<< /Length %d >>" % len(CONTENT), b"<< /Length 5 0 R >>"
    )
    assert extract_pdf_text(data2) == "Hello World\nsecond line"
