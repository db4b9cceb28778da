"""ODT text extraction (grawler_ray/functions/odt.py): exact
round-trips through build_odt (spans/tabs/space-runs/escaping/\\r),
hand-built content.xml corners the writer doesn't emit (headings,
line-breaks, footnote exclusion, text:s defaults), and typed errors."""

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grawler_ray.functions.odt import (
    OFFICE_NS,
    TEXT_NS,
    OdtError,
    build_odt,
    extract_odt_text,
)


def _zip_with_content(content_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("content.xml", content_xml)
    return buf.getvalue()


def _doc(body_inner: str) -> str:
    return (
        f'<office:document-content xmlns:office="{OFFICE_NS}" '
        f'xmlns:text="{TEXT_NS}"><office:body><office:text>'
        + body_inner
        + "</office:text></office:body></office:document-content>"
    )


class TestRoundtrip:
    CASES = [
        "hello world",
        "line1\nline2\n\nline4",
        "tabs\there\tand\there",
        'xml <chars> & "quotes"',
        "",
        "unicode: čžš 中文 🎉",
        "  two  spaces   three and    four    runs",
        "trailing  \nleading   x",
        "carriage\rreturn",
    ]

    @pytest.mark.parametrize("spans", [False, True])
    @pytest.mark.parametrize("text", CASES)
    def test_exact(self, spans, text):
        assert extract_odt_text(build_odt(text, use_spans=spans)) == text

    @given(
        st.text(
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
        assert extract_odt_text(build_odt(text)) == text

    def test_mimetype_entry_first_and_stored(self):
        with zipfile.ZipFile(io.BytesIO(build_odt("x"))) as z:
            first = z.infolist()[0]
            assert first.filename == "mimetype"
            assert first.compress_type == zipfile.ZIP_STORED
            assert z.read("mimetype") == b"application/vnd.oasis.opendocument.text"


class TestHandBuiltCorners:
    def test_headings_line_breaks_and_s_default(self):
        body = (
            "<text:h>Title</text:h>"
            "<text:p>a<text:line-break/>b<text:s/>c<text:s text:c=\"3\"/>d</text:p>"
        )
        assert extract_odt_text(_zip_with_content(_doc(body))) == "Title\na\nb c   d"

    def test_footnote_body_excluded(self):
        body = (
            "<text:p>before<text:note><text:note-body><text:p>note text"
            "</text:p></text:note-body></text:note>after</text:p>"
        )
        # the footnote paragraph is skipped both inline and as a paragraph
        assert extract_odt_text(_zip_with_content(_doc(body))) == "beforeafter"

    def test_nested_spans_with_tails(self):
        body = "<text:p>a<text:span>b<text:span>c</text:span>d</text:span>e</text:p>"
        assert extract_odt_text(_zip_with_content(_doc(body))) == "abcde"

    def test_missing_body_or_text(self):
        with pytest.raises(OdtError):
            extract_odt_text(
                _zip_with_content(
                    f'<office:document-content xmlns:office="{OFFICE_NS}"/>'
                )
            )
        with pytest.raises(OdtError):
            extract_odt_text(
                _zip_with_content(
                    f'<office:document-content xmlns:office="{OFFICE_NS}">'
                    "<office:body/></office:document-content>"
                )
            )


class TestErrors:
    def test_typed_errors(self):
        with pytest.raises(OdtError):
            extract_odt_text(b"not a zip")
        with pytest.raises(OdtError):
            build_odt("\x0c")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("other.xml", "<x/>")
        with pytest.raises(OdtError):
            extract_odt_text(buf.getvalue())

    @given(st.integers(1, 10_000), st.floats(0.01, 0.99))
    @settings(max_examples=60, deadline=None)
    def test_truncations_raise_typed(self, seed, frac):
        d = build_odt(f"document {seed}\nwith  spaces\tand tabs")
        cut = max(1, int(len(d) * frac))
        try:
            extract_odt_text(d[:cut])
        except OdtError:
            pass

    @given(st.binary(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_random_bytes_raise_typed(self, data):
        try:
            extract_odt_text(data)
        except OdtError:
            pass
