"""EPUB extraction (grawler_ray/functions/epub.py): container/OPF/spine
resolution pinned with hand-built packages (rootfile paths, relative +
percent-encoded hrefs, spine vs manifest order, missing pieces),
chapter text through the crawl's Go-parity HTML extraction, and typed
errors on malformed archives."""

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grawler_ray.functions.epub import (
    CONTAINER_NS,
    OPF_NS,
    EpubError,
    build_epub,
    extract_epub,
)


class TestRoundtrip:
    def test_metadata_and_chapter_order(self):
        b = build_epub(
            "T & T", [("c1", "alpha beta"), ("c2", "gamma"), ("c3", "delta  x")],
            creator="Ann <A>", language="de",
        )
        m = extract_epub(b)
        assert (m["title"], m["creator"], m["language"]) == ("T & T", "Ann <A>", "de")
        assert [c[0] for c in m["chapters"]] == ["chap0", "chap1", "chap2"]
        assert [c[1] for c in m["chapters"]] == ["alpha beta", "gamma", "delta  x"]

    def test_multiline_paragraph_join(self):
        # one <p> per line; Go-parity extraction joins block texts with
        # single spaces and trims each node
        b = build_epub("t", [("c", "  line one  \nline two\n\nline four")])
        assert extract_epub(b)["chapters"][0][1] == "line one line two line four"

    def test_mimetype_first_stored(self):
        with zipfile.ZipFile(io.BytesIO(build_epub("t", [("c", "x")]))) as z:
            info = z.infolist()[0]
            assert info.filename == "mimetype"
            assert info.compress_type == zipfile.ZIP_STORED

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",),
                    blacklist_characters="".join(
                        chr(c) for c in range(0x20) if chr(c) not in "\t\n\r"
                    )
                    + "￾￿",
                ),
                max_size=80,
            ),
            min_size=1,
            max_size=4,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_property_chapter_count_stable(self, texts):
        b = build_epub("t", [(f"c{i}", tx) for i, tx in enumerate(texts)])
        m = extract_epub(b)
        assert len(m["chapters"]) == len(texts)


def _epub_from(parts: dict[str, str | bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, body in parts.items():
            z.writestr(name, body)
    return buf.getvalue()


_CONTAINER = (
    f'<container xmlns="{CONTAINER_NS}"><rootfiles>'
    '<rootfile full-path="book/pkg.opf" media-type="application/oebps-package+xml"/>'
    "</rootfiles></container>"
)


def _opf(manifest: str, spine: str) -> str:
    return (
        f'<package xmlns="{OPF_NS}"><metadata/>'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )


class TestHandBuilt:
    def test_relative_and_percent_encoded_hrefs(self):
        parts = {
            "META-INF/container.xml": _CONTAINER,
            "book/pkg.opf": _opf(
                '<item id="a" href="text/ch%201.xhtml" media-type="application/xhtml+xml"/>'
                '<item id="b" href="./other.xhtml" media-type="application/xhtml+xml"/>',
                '<itemref idref="b"/><itemref idref="a"/>',
            ),
            "book/text/ch 1.xhtml": "<html><body><p>space file</p></body></html>",
            "book/other.xhtml": "<html><body><p>dot href</p></body></html>",
        }
        m = extract_epub(_epub_from(parts))
        # spine order wins over manifest order
        assert [(c[0], c[1]) for c in m["chapters"]] == [
            ("b", "dot href"), ("a", "space file"),
        ]

    def test_spine_missing_pieces(self):
        base = {
            "META-INF/container.xml": _CONTAINER,
            "book/pkg.opf": _opf(
                '<item id="a" href="x.xhtml" media-type="application/xhtml+xml"/>',
                '<itemref idref="nope"/>',
            ),
            "book/x.xhtml": "<html/>",
        }
        with pytest.raises(EpubError):
            extract_epub(_epub_from(base))
        base["book/pkg.opf"] = _opf(
            '<item id="a" href="gone.xhtml" media-type="application/xhtml+xml"/>',
            '<itemref idref="a"/>',
        )
        with pytest.raises(EpubError):
            extract_epub(_epub_from(base))

    def test_missing_container_or_rootfile(self):
        with pytest.raises(EpubError):
            extract_epub(_epub_from({"mimetype": "application/epub+zip"}))
        with pytest.raises(EpubError):
            extract_epub(
                _epub_from({"META-INF/container.xml": _CONTAINER})  # no opf
            )


class TestErrors:
    @given(st.binary(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_random_bytes_raise_typed(self, data):
        try:
            extract_epub(data)
        except EpubError:
            pass

    @given(st.integers(1, 10_000), st.floats(0.01, 0.99))
    @settings(max_examples=60, deadline=None)
    def test_truncations_raise_typed(self, seed, frac):
        d = build_epub("t", [("c", f"chapter body {seed}\nmore text")])
        cut = max(1, int(len(d) * frac))
        try:
            extract_epub(d[:cut])
        except EpubError:
            pass
