"""Unit tests for the one-pass HTML extractor (SURVEY §2.2 M5-M11)."""

from grawler_ray.htmlparse import extract_html, parse_page

BASE = "https://h.com"
HOST = "h.com"


def pp(body: bytes, ct: str = "text/html"):
    return parse_page(body, ct, f"{BASE}/p", BASE, HOST)


class TestHtmlText:
    def test_skip_tags_and_join(self):
        t, _, _ = extract_html(
            "<html><head><title>My Page</title><script>var x=1;</script>"
            "<style>a{}</style></head><body><p> Hello </p>"
            "<noscript>ns text</noscript><iframe>if text</iframe>"
            "<svg><text>vector</text></svg><div>World</div></body></html>"
        )
        assert t == "My Page Hello World"

    def test_per_node_trim_preserves_inner_whitespace(self):
        # one text node 'x \n y' -> TrimSpace keeps the inner run
        t, _, _ = extract_html("<p>x \n y</p><p>z</p>")
        assert t == "x \n y z"

    def test_entities_decoded_incl_win1252_remap(self):
        t, _, _ = extract_html("<p>a &amp; b &#151;</p>")
        assert t == "a & b —"

    def test_comments_doctype_excluded(self):
        t, _, _ = extract_html("<!DOCTYPE html>a<!-- c -->b")
        assert t == "a b"

    def test_rcdata_textarea_contributes_decoded(self):
        t, _, _ = extract_html("<textarea>in &lt;ta&gt;</textarea>")
        assert t == "in <ta>"

    def test_xmp_rawtext_contributes_undecoded(self):
        # xmp is rawtext for the tokenizer but NOT in the HtmlText skip list
        t, _, _ = extract_html("<xmp>a &amp; <b></xmp>ok")
        assert t == "a &amp; <b> ok"

    def test_nested_svg(self):
        t, _, _ = extract_html("<svg>a<svg>b</svg>c</svg>after")
        assert t == "after"

    def test_unclosed_script_swallows_rest(self):
        t, _, _ = extract_html("<p>before</p><script>var x;<p>inside</p>")
        assert t == "before"


class TestHtmlUrls:
    def test_document_order_duplicates_kept(self):
        _, h, _ = extract_html(
            '<a href="/a">1</a><b><a href="/b&amp;c">2</a></b><a href="/a">3</a>'
        )
        assert h == ["/a", "/b&c", "/a"]

    def test_rawtext_links_invisible_svg_links_visible(self):
        # Go: noscript/iframe content are text nodes (no <a> elements), but
        # HtmlUrls traverses svg subtrees (only HtmlText skips svg)
        _, h, _ = extract_html(
            '<noscript><a href="/ns">x</a></noscript>'
            '<iframe><a href="/if">y</a></iframe>'
            '<svg><a href="/svga">z</a></svg>'
        )
        assert h == ["/svga"]

    def test_href_without_value(self):
        _, h, _ = extract_html("<a href>x</a>")
        assert h == [""]


class TestHtmlMetaData:
    def test_first_wins_and_attr_order(self):
        t, h, m = extract_html(
            '<head><link href="/early.ico" rel="icon">'       # href before rel: NOT captured
            '<link rel="shortcut icon" href="/fav.ico">'      # captured
            '<meta name="description" content="first desc">'
            '<meta property="og:description" content="second desc">'
            '<meta property="og:site_name" content="MySite">'
            "<title>T1</title><title>T2</title></head>"
        )
        assert m["icon_link"] == "/fav.ico"
        assert m["description"] == "first desc"
        assert m["site_name"] == "MySite"
        assert m["title"] == "T1"

    def test_og_description_fallback(self):
        _, _, m = extract_html('<meta property="og:description" content="og d">')
        assert m["description"] == "og d"

    def test_empty_title_does_not_lock(self):
        _, _, m = extract_html("<title></title><title>T2</title>")
        assert m["title"] == "T2"

    def test_whitespace_title_locks(self):
        _, _, m = extract_html("<title> </title><title>T2</title>")
        assert m["title"] == " "


class TestParsePage:
    def test_html_end_to_end(self):
        body = (
            '<html><body><a href="/child">c</a><a href="#x">f</a>'
            '<a href="%zz">bad</a>Some content here</body></html>'
        ).encode()
        d = pp(body)
        assert d["content"] == "c f bad Some content here"
        assert d["child_urls"] == ["https://h.com/child"]
        assert d["meta_title"] == "c f bad Some content here"
        assert d["meta_description"] == "c f bad Some content here"
        assert d["meta_site_name"] == "h.com"
        assert d["words"] == {"c": 1, "f": 1, "bad": 1, "some": 1, "content": 1, "here": 1}

    def test_title_fallback_byte_truncation_splits_rune(self):
        body = ("<body>" + "a" + "é" * 40 + "</body>").encode()
        d = pp(body)
        # 60-byte prefix = 'a' + 29 full é + 1 dangling lead byte -> U+FFFD
        assert d["meta_title"] == "a" + "é" * 29 + "�"

    def test_description_fallback_160_bytes(self):
        content = "x" * 200
        d = pp(f"<body>{content}</body>".encode())
        assert d["meta_description"] == "x" * 160

    def test_invalid_utf8_dropped_before_parse(self):
        d = pp(b"<body>caf\xc3\xa9 \xff\xfe ok</body>")
        assert d["content"] == "café  ok"

    def test_icon_resolved_against_base(self):
        d = pp(b'<link rel="icon" href="/f.ico"><body>xyz</body>')
        assert d["meta_icon_link"] == "https://h.com/f.ico"

    def test_absolute_icon_untouched(self):
        d = pp(b'<link rel="icon" href="https://cdn.x/f.ico"><body>xyz</body>')
        assert d["meta_icon_link"] == "https://cdn.x/f.ico"

    def test_text_plain(self):
        d = pp(b"line1\nline2\r  spaced  ", "text/plain")
        assert d["content"] == "line1line2  spaced"
        assert d["child_urls"] == []
        assert d["meta_title"] == "line1line2  spaced"
        assert d["meta_site_name"] == "h.com"
        assert d["words"] == {"line1line2": 1, "spaced": 1}

    def test_text_plain_invalid_utf8_fffd_per_byte(self):
        # plain branch has NO ToValidUTF8; bytes reach the JSON sink raw
        d = pp(b"ab\xe2\x82", "text/plain")
        assert d["content"] == "ab��"
