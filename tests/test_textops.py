"""Unit tests for Go-compatible scalar text primitives (SURVEY §2.8)."""

from grawler_ray.textops import (
    GO_SPACE,
    byte_prefix,
    go_json_str,
    go_trim_space,
    is_valid_utf8,
    process_text,
    to_valid_utf8,
    words_freq,
)


def test_go_space_set_matches_unicode_is_space():
    # Go unicode.IsSpace accepts exactly these runes (White_Space property)
    expected = {
        0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680,
        *range(0x2000, 0x200B), 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
    }
    assert {ord(c) for c in GO_SPACE} == expected


def test_trim_space_does_not_strip_fs_gs_rs_us():
    # \x1c-\x1f are Python-space but NOT Go-space
    assert go_trim_space("\x1c a \x1f") == "\x1c a \x1f"
    assert go_trim_space("　 x  ") == "x"


def test_process_text_removes_newlines_without_space():
    # src/parsers/text.go:8-14 — \n and \r removed, NOT replaced by space
    assert process_text("a\nb") == "ab"
    assert process_text("\r\n  x  \r\n") == "x"  # spaces become outer, trimmed
    assert process_text("  a b  ") == "a b"
    assert process_text("\ta\t") == "\ta\t"  # tabs NOT trimmed (Trim(s," "))


def test_words_freq_ascii_word_class():
    # Go regexp = RE2: \w and \b are ASCII — é/ö are not word chars
    assert words_freq("Hello wörld_9 café Hello") == {
        "hello": 2, "w": 1, "rld_9": 1, "caf": 1,
    }
    assert words_freq("") == {}
    assert words_freq("C'est l'été 42") == {"c": 1, "est": 1, "l": 1, "t": 1, "42": 1}


def test_words_freq_lowercase_after_match():
    assert words_freq("ABC abc AbC") == {"abc": 3}


def test_to_valid_utf8_drops_invalid_bytes():
    # strings.ToValidUTF8(s, "") with empty replacement drops every bad byte
    assert to_valid_utf8(b"a\xffb") == "ab"
    assert to_valid_utf8("héllo".encode()) == "héllo"
    assert to_valid_utf8(b"\xe2\x82") == ""  # truncated sequence fully dropped


def test_go_json_str_one_fffd_per_invalid_byte():
    # Go encoding/json: utf8.DecodeRune consumes 1 byte per invalid sequence
    assert go_json_str(b"ab\xe2\x82") == "ab��"
    assert go_json_str(b"\xff\xfe") == "��"
    assert go_json_str(b"\xed\xa0\x80") == "���"  # surrogate
    assert go_json_str(b"\xc0\xaf") == "��"  # overlong
    assert go_json_str("é€𐍈".encode()) == "é€𐍈"


def test_byte_prefix_may_split_runes():
    assert byte_prefix("aé", 2) == b"a\xc3"
    assert go_json_str(byte_prefix("aé", 2)) == "a�"
    assert byte_prefix("abc", 60) == b"abc"


def test_is_valid_utf8():
    assert is_valid_utf8("é€".encode())
    assert not is_valid_utf8(b"\xff")
    assert not is_valid_utf8(b"\xed\xa0\x80")  # surrogate rejected like Go


class TestCharsetDetection:
    """WHATWG sniffing subset: BOM > header charset > meta prescan >
    utf-8; latin-1 labels mean windows-1252 on the web (encoding spec
    §4.2 — 0x80 decodes to the euro sign, not U+0080)."""

    def test_priority_and_labels(self):
        from grawler_ray.textops import detect_charset

        cases = [
            (("text/html", "caf\xe9".encode("latin-1")), "utf-8"),
            (("text/html; charset=latin-1", b"caf\xe9"), "cp1252"),
            (("text/html; charset=UTF-8", b"x"), "utf-8"),
            (("", b"\xef\xbb\xbfhi"), "utf-8"),
            (("", b"\xff\xfeh\x00i\x00"), "utf-16-le"),
            (("", b"\xfe\xff\x00h\x00i"), "utf-16-be"),
            (("text/html", b'<meta charset="windows-1251">'), "cp1251"),
            (("text/html",
              b'<meta http-equiv="Content-Type" '
              b'content="text/html; charset=iso-8859-1">'), "cp1252"),
            # unknown labels fall through to the next source
            (("text/html; charset=bogus", b'<meta charset="utf-8">'), "utf-8"),
            # BOM beats a lying header
            (("text/html; charset=latin-1", b"\xef\xbb\xbfx"), "utf-8"),
            # meta outside the 1024-byte prescan window is ignored
            (("text/html", b" " * 1024 + b'<meta charset="cp1251">'), "utf-8"),
        ]
        for (ct, b), want in cases:
            assert detect_charset(ct, b) == want, (ct, b)

    def test_decode_page(self):
        from grawler_ray.textops import decode_page

        t, e = decode_page(b"caf\xe9 \x80", "text/html; charset=latin-1")
        assert (t, e) == ("café €", "cp1252")
        t, e = decode_page(b"\xff\xfeh\x00i\x00")
        assert (t, e) == ("hi", "utf-16-le")
        t, e = decode_page(b"\xef\xbb\xbfhey")
        assert t == "hey" and e == "utf-8"
        t, e = decode_page("мир".encode("cp1251"),
                           "text/html; charset=windows-1251")
        assert t == "мир"
        # undecodable bytes become U+FFFD, never raise
        t, e = decode_page(b"\xff\xff\xff", "text/html; charset=utf-8")
        assert "�" in t


def test_sniff_content_type_patterns():
    """WHATWG §7 subset: whitespace-skipped case-insensitive HTML tags
    terminated by space/'>', magic numbers, binary-byte fallback."""
    from grawler_ray.textops import sniff_content_type as s

    assert s(b"  <!doctype html><html>") == "text/html"
    assert s(b"<HTML>") == "text/html" and s(b"\n\t<p>hi") == "text/html"
    assert s(b"<pxyz") == "text/plain"   # tag must end at space or '>'
    assert s(b"<b>x") == "text/html" and s(b"<br>") == "text/html"
    assert s(b"%PDF-1.4 xxx") == "application/pdf"
    assert s(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert s(b"GIF89a....") == "image/gif"
    assert s(b"PK\x03\x04zip") == "application/zip"
    assert s(b"plain words here") == "text/plain"
    assert s(b"bin\x00ary") == "application/octet-stream"
    assert s(b"") == "text/plain"
    # a mislabeled resource: server says text/plain, body is HTML
    assert s(b"<script>alert(1)</script>") == "text/html"
