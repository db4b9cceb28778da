"""Pure-stdlib DOCX (OOXML WordprocessingML) text extraction — the
second office-document leg of the ingest surface next to PDF
(``functions/pdf.py``; reference parity note: fou3fou3/Grawler parses
html+pdf only — src/parsers — so office formats are part of the
beyond-reference ingest surface).  A .docx is a ZIP holding
``word/document.xml``; text lives in ``<w:t>`` runs inside ``<w:p>``
paragraphs, with ``<w:tab/>`` / ``<w:br/>`` as explicit whitespace
elements.  stdlib ``zipfile`` + ``xml.etree`` (expat) suffice — no
python-docx, no lxml.  Python 3.11's expat carries billion-laughs
amplification limits; external entities are never fetched.

Extraction rules (the common-denominator every converter agrees on):
``<w:t>`` text concatenates in document order within a paragraph;
``<w:tab/>`` -> "\\t"; ``<w:br/>`` and ``<w:cr/>`` -> "\\n";
paragraphs join with "\\n"; everything else (formatting, tables'
non-text, bookmarks) contributes nothing.  The fixture writer
round-trips arbitrary text exactly (one ``<w:p>`` per line, tabs as
``<w:tab/>``, XML-escaped), which is what lets the driver's DuckDB
oracle check the whole build-zip-parse-extract loop with
``length(text)`` / ``md5(text)`` — the same shape as ``pdf_ingest``.
"""

from __future__ import annotations

import io
import struct
import zipfile
from xml.etree import ElementTree
from xml.sax.saxutils import escape

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


class DocxError(ValueError):
    pass


def extract_docx_text(data: bytes) -> str:
    """DOCX bytes -> plain text (paragraphs joined with newlines)."""
    try:
        return _extract(data)
    except DocxError:
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
        raise DocxError(f"truncated/malformed DOCX: {e}") from e


def _extract(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        try:
            xml = z.read("word/document.xml")
        except KeyError:
            raise DocxError("no word/document.xml (not a DOCX)") from None
    root = ElementTree.fromstring(xml)
    body = root.find(f"{{{W_NS}}}body")
    if body is None:
        raise DocxError("document.xml has no w:body")
    paras = []
    for p in body.iter(f"{{{W_NS}}}p"):
        parts = []
        for el in p.iter():
            tag = el.tag
            if tag == f"{{{W_NS}}}t":
                parts.append(el.text or "")
            elif tag == f"{{{W_NS}}}tab":
                parts.append("\t")
            elif tag in (f"{{{W_NS}}}br", f"{{{W_NS}}}cr"):
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras)


def build_docx(text: str, split_runs: bool = False) -> bytes:
    """Plain text -> minimal valid DOCX whose extraction round-trips the
    text EXACTLY: one ``<w:p>`` per line, tabs emitted as ``<w:tab/>``
    elements, XML special characters escaped; ``split_runs=True`` breaks
    each line into multiple ``<w:r>`` runs (including empty ones) so the
    parser's run-concatenation path gets exercised."""
    # XML 1.0 cannot represent most control characters AT ALL (not even
    # as character references) — a DOCX genuinely cannot store them
    for ch in text:
        o = ord(ch)
        if o < 0x20 and ch not in "\t\n\r" or 0xD800 <= o <= 0xDFFF or o in (0xFFFE, 0xFFFF):
            raise DocxError(f"text contains XML-unrepresentable character U+{o:04X}")
    body = []
    for line in text.split("\n"):
        runs = []
        # tabs become explicit <w:tab/> elements between text runs
        for i, seg in enumerate(line.split("\t")):
            if i > 0:
                runs.append("<w:tab/>")
            # literal \r would be newline-normalized by any XML parser;
            # the character reference survives exactly
            esc = lambda s: escape(s, {"\r": "&#13;"})
            if split_runs and len(seg) > 3:
                mid = len(seg) // 2
                runs.append(
                    f'<w:r><w:t xml:space="preserve">{esc(seg[:mid])}</w:t>'
                    f"</w:r><w:r><w:t/></w:r>"
                    f'<w:r><w:t xml:space="preserve">{esc(seg[mid:])}</w:t></w:r>'
                )
            else:
                runs.append(
                    f'<w:r><w:t xml:space="preserve">{esc(seg)}</w:t></w:r>'
                )
        body.append("<w:p>" + "".join(runs) + "</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", rels)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()
