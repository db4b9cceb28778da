"""DOCX text extraction (grawler_ray/functions/docx.py): exact
round-trips through build_docx (incl. runs/tabs/breaks/escaping/\\r),
hand-built document.xml corners the writer doesn't emit (w:br, w:cr,
tables, missing body), and typed errors on truncation / non-zip /
zip-without-document bytes."""

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grawler_ray.functions.docx import (
    W_NS,
    DocxError,
    build_docx,
    extract_docx_text,
)


def _zip_with_document(doc_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc_xml)
    return buf.getvalue()


class TestRoundtrip:
    CASES = [
        "hello world",
        "line1\nline2\n\nline4",
        "tabs\there\tand\there",
        'xml <chars> & "quotes" \'apostrophes\'',
        "",
        "unicode: čžš 中文 🎉",
        "trailing newline\n",
        "  leading/trailing spaces  \n  more  ",
        "carriage\rreturn",
    ]

    @pytest.mark.parametrize("split", [False, True])
    @pytest.mark.parametrize("text", CASES)
    def test_exact(self, split, text):
        assert extract_docx_text(build_docx(text, split_runs=split)) == text

    @given(
        st.text(
            # XML 1.0 valid set: tab/newline/cr + >= 0x20, no surrogates
            alphabet=st.characters(
                blacklist_categories=("Cs",),
                blacklist_characters="".join(
                    chr(c) for c in range(0x20) if chr(c) not in "\t\n\r"
                )
                + "￾￿",
            ),
            max_size=300,
        )
    )
    @settings(max_examples=150, deadline=None)
    def test_property_roundtrip(self, text):
        assert extract_docx_text(build_docx(text)) == text

    def test_unrepresentable_control_chars_raise(self):
        for bad in ("\x0b", "a\x00b", "\x1f"):
            with pytest.raises(DocxError):
                build_docx(bad)


class TestHandBuiltCorners:
    def test_br_cr_and_tables(self):
        doc = (
            f'<w:document xmlns:w="{W_NS}"><w:body>'
            "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t><w:cr/><w:t>c</w:t></w:r></w:p>"
            "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
            "</w:body></w:document>"
        )
        # table paragraphs are still w:p descendants of the body
        assert extract_docx_text(_zip_with_document(doc)) == "a\nb\nc\ncell"

    def test_no_body(self):
        doc = f'<w:document xmlns:w="{W_NS}"/>'
        with pytest.raises(DocxError):
            extract_docx_text(_zip_with_document(doc))

    def test_formatting_elements_contribute_nothing(self):
        doc = (
            f'<w:document xmlns:w="{W_NS}"><w:body>'
            '<w:p><w:pPr><w:jc w:val="center"/></w:pPr>'
            "<w:r><w:rPr><w:b/></w:rPr><w:t>bold</w:t></w:r></w:p>"
            "</w:body></w:document>"
        )
        assert extract_docx_text(_zip_with_document(doc)) == "bold"


class TestErrors:
    def test_typed_errors(self):
        d = build_docx("some document text")
        with pytest.raises(DocxError):
            extract_docx_text(b"PK\x03\x04 not a zip")
        with pytest.raises(DocxError):
            extract_docx_text(b"")
        # a zip without word/document.xml
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("other.txt", "x")
        with pytest.raises(DocxError):
            extract_docx_text(buf.getvalue())
        # malformed XML inside a valid zip
        with pytest.raises(DocxError):
            extract_docx_text(_zip_with_document("<w:document><unclosed"))

    @given(st.integers(1, 10_000), st.floats(0.01, 0.99))
    @settings(max_examples=60, deadline=None)
    def test_truncations_raise_typed(self, seed, frac):
        d = build_docx(f"document {seed} body text\nwith lines")
        cut = max(1, int(len(d) * frac))
        try:
            extract_docx_text(d[:cut])
        except DocxError:
            pass  # typed error is the only acceptable failure

    @given(st.binary(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_random_bytes_raise_typed(self, data):
        try:
            extract_docx_text(data)
        except DocxError:
            pass
