"""Pure-stdlib EPUB (OCF/OPF) text extraction — the ebook leg of the
document-ingest surface.  An .epub is a ZIP: ``META-INF/container.xml``
points at the OPF package file, whose ``<manifest>`` maps ids to hrefs
and whose ``<spine>`` fixes reading order; chapters are XHTML documents.
Chapter text runs through the SAME Go-parity HTML extraction the crawl
uses (``htmlparse.extract_html`` + ``textops.process_text``), so ebook
text normalizes identically to crawled web text — one text pipeline for
every format.

Supported: container.xml rootfile resolution, OPF metadata
(dc:title/creator/language), manifest+spine ordering, hrefs relative to
the OPF directory, percent-encoded hrefs, nav/ncx items skipped unless
spined.  The fixture writer emits spec-shaped books for round-trip and
ordering tests.
"""

from __future__ import annotations

import io
import posixpath
import re
import struct
import zipfile
from urllib.parse import unquote
from xml.etree import ElementTree
from xml.sax.saxutils import escape

CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
OPF_NS = "http://www.idpf.org/2007/opf"
DC_NS = "http://purl.org/dc/elements/1.1/"


class EpubError(ValueError):
    pass


def extract_epub(data: bytes) -> dict:
    """EPUB bytes -> {"title", "creator", "language",
    "chapters": [(idref, text), ...] in spine order} — chapter text via
    the crawl's Go-parity HTML extraction."""
    try:
        return _extract(data)
    except EpubError:
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
        raise EpubError(f"truncated/malformed EPUB: {e}") from e


def _extract(data: bytes) -> dict:
    from ..htmlparse import extract_html
    from ..textops import process_text, to_valid_utf8

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())
        if "META-INF/container.xml" not in names:
            raise EpubError("no META-INF/container.xml (not an EPUB)")
        croot = ElementTree.fromstring(z.read("META-INF/container.xml"))
        rootfile = None
        for rf in croot.iter(f"{{{CONTAINER_NS}}}rootfile"):
            rootfile = rf.get("full-path")
            break
        if not rootfile or rootfile not in names:
            raise EpubError(f"container rootfile missing: {rootfile!r}")
        opf = ElementTree.fromstring(z.read(rootfile))
        opf_dir = posixpath.dirname(rootfile)

        title = creator = language = ""
        meta = opf.find(f"{{{OPF_NS}}}metadata")
        if meta is not None:
            for tag, slot in (("title", "t"), ("creator", "c"), ("language", "l")):
                el = meta.find(f"{{{DC_NS}}}{tag}")
                if el is not None and el.text:
                    if slot == "t":
                        title = el.text
                    elif slot == "c":
                        creator = el.text
                    else:
                        language = el.text

        manifest: dict[str, str] = {}
        man = opf.find(f"{{{OPF_NS}}}manifest")
        if man is None:
            raise EpubError("OPF has no manifest")
        for item in man.iter(f"{{{OPF_NS}}}item"):
            iid, href = item.get("id"), item.get("href")
            if iid and href:
                manifest[iid] = href
        spine = opf.find(f"{{{OPF_NS}}}spine")
        if spine is None:
            raise EpubError("OPF has no spine")

        chapters: list[tuple[str, str]] = []
        for ref in spine.iter(f"{{{OPF_NS}}}itemref"):
            idref = ref.get("idref")
            href = manifest.get(idref or "")
            if href is None:
                raise EpubError(f"spine idref {idref!r} not in manifest")
            path = posixpath.normpath(posixpath.join(opf_dir, unquote(href)))
            if path not in names:
                raise EpubError(f"spine document missing: {path}")
            body = z.read(path)
            joined, _hrefs, _meta = extract_html(to_valid_utf8(body))
            chapters.append((idref, process_text(joined)))
    return {
        "title": title,
        "creator": creator,
        "language": language,
        "chapters": chapters,
    }


def build_epub(
    title: str,
    chapters: list[tuple[str, str]],
    creator: str = "",
    language: str = "en",
    subdir: str = "OEBPS",
) -> bytes:
    """(title, [(chapter_title, chapter_text)]) -> minimal valid EPUB:
    mimetype (stored, first), container.xml, OPF with manifest + spine
    in the given order, one XHTML per chapter (one <p> per line)."""

    def xml_ok(s: str) -> None:
        for ch in s:
            o = ord(ch)
            if o < 0x20 and ch not in "\t\n\r":
                raise EpubError(f"text contains XML-unrepresentable U+{o:04X}")

    items, refs, files = [], [], []
    for i, (ctitle, ctext) in enumerate(chapters):
        xml_ok(ctitle)
        xml_ok(ctext)
        cid = f"chap{i}"
        href = f"text/chapter{i}.xhtml"
        paras = "".join(
            f"<p>{escape(line, {chr(13): '&#13;'})}</p>"
            for line in ctext.split("\n")
        )
        # chapter titles live in the OPF metadata, not the XHTML head —
        # the Go-parity extractor reads <title> as page text, and ebook
        # chapter text should be the body alone
        doc = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f'<head data-title="{escape(ctitle, {chr(34): "&quot;"})}"/>'
            f"<body>{paras}</body></html>"
        )
        items.append(
            f'<item id="{cid}" href="{href}" media-type="application/xhtml+xml"/>'
        )
        refs.append(f'<itemref idref="{cid}"/>')
        files.append((f"{subdir}/{href}", doc))
    xml_ok(title)
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{OPF_NS}" version="3.0" unique-identifier="uid">'
        f'<metadata xmlns:dc="{DC_NS}">'
        f"<dc:title>{escape(title)}</dc:title>"
        f"<dc:creator>{escape(creator)}</dc:creator>"
        f"<dc:language>{escape(language)}</dc:language>"
        '<dc:identifier id="uid">urn:uuid:0</dc:identifier>'
        "</metadata>"
        f"<manifest>{''.join(items)}</manifest>"
        f"<spine>{''.join(refs)}</spine></package>"
    )
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<container version="1.0" xmlns="{CONTAINER_NS}"><rootfiles>'
        f'<rootfile full-path="{subdir}/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(zipfile.ZipInfo("mimetype"), "application/epub+zip")
        z.writestr("META-INF/container.xml", container)
        z.writestr(f"{subdir}/content.opf", opf)
        for path, doc in files:
            z.writestr(path, doc)
    return buf.getvalue()
