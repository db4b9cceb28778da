"""Unit tests for Go net/url-compatible URL primitives (SURVEY §2.2 M1/M2/M12/M14)."""

import pytest

from grawler_ray.urlops import (
    UrlError,
    canonical_url,
    child_url_allowed,
    extract_url_components,
    go_query_unescape,
    url_allowed,
    xxhash64,
)


class TestExtractUrlComponents:
    def test_basic(self):
        assert extract_url_components("https://www.Example.com:8080/A%20b?q=1#f") == (
            "https", "www.Example.com:8080", "/A b",
        )

    def test_scheme_lowercased_host_not(self):
        assert extract_url_components("HTTPS://WWW.A.com/P")[0] == "https"
        assert extract_url_components("HTTPS://WWW.A.com/P")[1] == "WWW.A.com"

    def test_opaque_and_relative(self):
        assert extract_url_components("mailto:a@b.com") == ("mailto", "", "")
        assert extract_url_components("foo.html") == ("", "", "foo.html")
        assert extract_url_components("../up") == ("", "", "../up")

    def test_userinfo_stripped(self):
        assert extract_url_components("https://u:p@h.com/p")[1] == "h.com"

    def test_path_percent_decoded(self):
        _, _, p = extract_url_components("https://a.com/robots%2Etxt")
        assert p == "/robots.txt"

    def test_errors(self):
        with pytest.raises(UrlError):
            extract_url_components("https://a.com/\x01x")  # control char
        with pytest.raises(UrlError):
            extract_url_components("https://bad host.com/")  # space in host
        with pytest.raises(UrlError):
            extract_url_components("https://a.com/%zz")  # bad escape
        with pytest.raises(UrlError):
            extract_url_components("://a.com")  # missing scheme


class TestUrlAllowed:
    def test_schemes(self):
        assert url_allowed("https", "a.com", "/x")
        assert url_allowed("http", "a.com", "/x")
        assert not url_allowed("ftp", "a.com", "/x")
        assert not url_allowed("", "", "foo.html")  # unresolved relative child

    def test_robots_path_blocked_even_encoded(self):
        s, h, p = extract_url_components("https://a.com/robots%2Etxt")
        assert not url_allowed(s, h, p)
        assert not url_allowed("https", "a.com", "/robots.txt")


class TestChildUrlAllowed:
    BASE = "https://a.com"

    def test_reference_rules(self):
        # src/utils/utils.go:161-183, in order
        assert child_url_allowed("", self.BASE) is None
        assert child_url_allowed("%zz", self.BASE) is None  # decode error
        assert child_url_allowed("#frag", self.BASE) is None
        assert child_url_allowed("?q=1", self.BASE) is None
        assert child_url_allowed("%23frag", self.BASE) is None  # decodes to '#'
        assert child_url_allowed("/x/y", self.BASE) == "https://a.com/x/y"
        assert child_url_allowed("https://b.com/z", self.BASE) == "https://b.com/z"

    def test_relative_passes_through_unresolved(self):
        # dies later at urlAllowed (empty scheme) — reproduce exactly
        assert child_url_allowed("foo.html", self.BASE) == "foo.html"

    def test_plus_becomes_space(self):
        # QueryUnescape semantics: '+' -> ' '
        assert child_url_allowed("/a+b", self.BASE) == "https://a.com/a b"

    def test_invalid_utf8_after_decode_dropped(self):
        assert child_url_allowed("/a%ff", self.BASE) is None


def test_go_query_unescape():
    assert go_query_unescape("a+b%20c%41") == "a b cA"
    with pytest.raises(UrlError):
        go_query_unescape("%g1")
    with pytest.raises(UrlError):
        go_query_unescape("100%")


def test_canonical_url():
    assert canonical_url("HTTPS://WWW.A.com:443/Path") == "https://www.a.com/Path"
    assert canonical_url("http://A.com:80") == "http://a.com/"
    assert canonical_url("https://a.com/p#frag") == "https://a.com/p"


def test_xxhash64_published_vectors():
    # xxHash sanity-check vectors (public spec)
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"\x00") == 0xE934A84ADB052768

    def fill(n):  # the spec's PRNG-filled sanity buffer
        g, out = 2654435761, bytearray()
        for _ in range(n):
            out.append((g >> 56) & 0xFF)
            g = (g * 11400714785074694797) & 0xFFFFFFFFFFFFFFFF
        return bytes(out)

    assert xxhash64(fill(222)) == 0xB641AE8CB691C174  # exercises the 32B main loop
    assert xxhash64("abc") == xxhash64(b"abc")


class TestXxhashBatch:
    """xxhash64_batch must be bit-identical to the scalar xxhash64 for
    every XXH64 length regime (stripes, tail q-words, dword, bytes)."""

    def test_all_length_classes(self):
        import random

        import numpy as np

        from grawler_ray.urlops import xxhash64, xxhash64_batch

        random.seed(7)
        cases = [bytes(random.randrange(256) for _ in range(L))
                 for L in list(range(0, 101)) + [127, 128, 129, 255, 256, 1000]]
        got = xxhash64_batch(cases)
        exp = np.array([xxhash64(c) for c in cases], np.uint64)
        assert (got == exp).all()

    def test_strings_and_seed(self):
        import numpy as np

        from grawler_ray.urlops import xxhash64, xxhash64_batch

        urls = [f"https://sité{i}.test/päge/{i}?q={i*31}" for i in range(64)] + ["", "a"]
        for seed in (0, 1, 12345):
            got = xxhash64_batch(urls, seed=seed)
            exp = np.array([xxhash64(u, seed) for u in urls], np.uint64)
            assert (got == exp).all(), seed

    def test_empty_batch(self):
        from grawler_ray.urlops import xxhash64_batch

        assert len(xxhash64_batch([])) == 0
