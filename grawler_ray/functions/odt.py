"""Pure-stdlib ODT (OpenDocument Text, ODF 1.2) text extraction — the
third office-document leg next to PDF and DOCX.  An .odt is a ZIP whose
``content.xml`` holds ``office:body/office:text`` with ``text:p`` /
``text:h`` paragraphs; unlike OOXML, character data sits DIRECTLY in
paragraph/span elements (text + tails), whitespace is collapsed by
consumers, and explicit whitespace travels as ``<text:tab/>``,
``<text:line-break/>`` and ``<text:s text:c="n"/>`` (a run of n
spaces).  stdlib ``zipfile`` + ``xml.etree`` suffice.

Extraction: paragraphs/headings in document order join with "\\n";
within one, a recursive walk concatenates element text/tails and
substitutes tab -> "\\t", line-break -> "\\n", ``text:s`` -> its space
run.  The fixture writer emits spec-shaped content (space runs >= 2
encoded via ``text:s`` exactly as real ODF writers do) that round-trips
arbitrary XML-representable text byte-for-byte, so the driver's DuckDB
oracle checks the whole loop with ``length(text)`` / ``md5(text)``.
"""

from __future__ import annotations

import io
import struct
import zipfile
from xml.etree import ElementTree
from xml.sax.saxutils import escape

OFFICE_NS = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"


class OdtError(ValueError):
    pass


def extract_odt_text(data: bytes) -> str:
    """ODT bytes -> plain text (paragraphs joined with newlines)."""
    try:
        return _extract(data)
    except OdtError:
        raise
    except (
        zipfile.BadZipFile,
        KeyError,
        ElementTree.ParseError,
        IndexError,
        struct.error,
        ValueError,
        EOFError,
        OSError,
    ) as e:
        raise OdtError(f"truncated/malformed ODT: {e}") from e


def _collect(el, parts: list) -> None:
    """Recursive in-paragraph walk: text, special elements, tails."""
    tag = el.tag
    if tag == f"{{{TEXT_NS}}}tab":
        parts.append("\t")
    elif tag == f"{{{TEXT_NS}}}line-break":
        parts.append("\n")
    elif tag == f"{{{TEXT_NS}}}s":
        n = el.get(f"{{{TEXT_NS}}}c", "1")
        try:
            parts.append(" " * max(1, int(n)))
        except ValueError:
            parts.append(" ")
    elif tag == f"{{{TEXT_NS}}}note":
        return  # footnote bodies are not running text
    else:
        if el.text:
            parts.append(el.text)
        for child in el:
            _collect(child, parts)
            if child.tail:
                parts.append(child.tail)


def _extract(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        try:
            xml = z.read("content.xml")
        except KeyError:
            raise OdtError("no content.xml (not an ODT)") from None
    root = ElementTree.fromstring(xml)
    body = root.find(f"{{{OFFICE_NS}}}body")
    if body is None:
        raise OdtError("content.xml has no office:body")
    office_text = body.find(f"{{{OFFICE_NS}}}text")
    if office_text is None:
        raise OdtError("office:body has no office:text")
    paras: list[str] = []
    p_tag, h_tag = f"{{{TEXT_NS}}}p", f"{{{TEXT_NS}}}h"

    def walk(el) -> None:
        for child in el:
            if child.tag == f"{{{TEXT_NS}}}note":
                continue  # footnote bodies are not running text
            if child.tag in (p_tag, h_tag):
                parts: list = []
                if child.text:
                    parts.append(child.text)
                for sub in child:
                    _collect(sub, parts)
                    if sub.tail:
                        parts.append(sub.tail)
                paras.append("".join(parts))
            else:
                walk(child)

    walk(office_text)
    return "\n".join(paras)


def build_odt(text: str, use_spans: bool = False) -> bytes:
    """Plain text -> minimal valid ODT whose extraction round-trips the
    text EXACTLY: one ``text:p`` per line, tabs as ``<text:tab/>``,
    space runs >= 2 as ``<text:s text:c=.../>`` (the real ODF writer
    convention); ``use_spans=True`` wraps line halves in ``text:span``
    so the tail-walk path gets exercised."""
    for ch in text:
        o = ord(ch)
        if o < 0x20 and ch not in "\t\n\r" or 0xD800 <= o <= 0xDFFF or o in (0xFFFE, 0xFFFF):
            raise OdtError(f"text contains XML-unrepresentable character U+{o:04X}")

    def esc(s: str) -> str:
        out = escape(s, {"\r": "&#13;"})
        # encode space runs >= 2: one literal space + text:s for the rest
        res = []
        i = 0
        while i < len(out):
            if out[i] == " ":
                j = i
                while j < len(out) and out[j] == " ":
                    j += 1
                run = j - i
                if run == 1:
                    res.append(" ")
                else:
                    res.append(f' <text:s text:c="{run - 1}"/>')
                i = j
            else:
                res.append(out[i])
                i += 1
        return "".join(res)

    body = []
    for line in text.split("\n"):
        segs = []
        for i, seg in enumerate(line.split("\t")):
            if i > 0:
                segs.append("<text:tab/>")
            if use_spans and len(seg) > 3:
                mid = len(seg) // 2
                segs.append(
                    f"<text:span>{esc(seg[:mid])}</text:span>"
                    f"<text:span>{esc(seg[mid:])}</text:span>"
                )
            else:
                segs.append(esc(seg))
        body.append("<text:p>" + "".join(segs) + "</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{OFFICE_NS}" xmlns:text="{TEXT_NS}">'
        "<office:body><office:text>"
        + "".join(body)
        + "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        # per ODF spec the mimetype entry comes first, STORED
        z.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/vnd.oasis.opendocument.text",
        )
        z.writestr("content.xml", content)
    return buf.getvalue()
