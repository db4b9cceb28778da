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
