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


class TestWhatwgTreeConstruction:
    """Hand-derived WHATWG HTML5 tree-construction expectations (VERDICT r3
    item 5) — the cases where Go's html.Parse builds a tree the flat
    tokenizer scan must still match on extracted text/links.  Each expected
    value is worked out from the spec's insertion modes (cited inline), NOT
    from the code under test.  html5lib is not installable here."""

    # --- implied end tags: tree re-parents, text order unchanged ---------
    def test_implied_p_end_tags(self):
        # spec "in body": a <p> start tag closes an open p element in
        # button scope -> tree body>p(a),p(b); HtmlText DFS = "a b"
        t, _, _ = extract_html("<p>a<p>b")
        assert t == "a b"

    def test_implied_li_end_tags(self):
        # spec "in body" <li>: pops open li -> ul>li(a),li(b) -> "a b"
        t, _, _ = extract_html("<ul><li>a<li>b</ul>")
        assert t == "a b"

    # --- adoption agency: elements cloned, text order unchanged ----------
    def test_adoption_agency_text_order(self):
        # spec 13.2.6.4.7 "in body" </b> with <i> open: AAA re-parents to
        # b(bold, i(both)), i(italic) -> DFS text "bold both italic"
        t, _, _ = extract_html("<b>bold<i>both</b>italic</i>")
        assert t == "bold both italic"

    def test_adoption_agency_href_clone_parity(self):
        # FORMER pinned delta, now implemented: Go's AAA clones the <a>
        # across the block boundary -> DOM has TWO <a href="1"> elements;
        # the extractor's open-elements emulation reproduces the clone.
        # Text order identical: body a("x"), div(a("y"), "z") -> "x y z".
        t, hrefs, _ = extract_html('<a href="1">x<div>y</a>z</div>')
        assert t == "x y z"
        assert hrefs == ["1", "1"]  # == Go's DOM walk

    def test_adoption_agency_nested_blocks_one_clone_per_block(self):
        # each outer-loop iteration appends one clone into the next
        # furthest block (browser-verified DOM shape)
        t, hrefs, _ = extract_html('<a href="1">x<div><div>y</a>z</div></div>')
        assert t == "x y z"
        assert hrefs == ["1", "1", "1"]

    def test_formatting_reconstruction_after_p_close(self):
        # the classic real-web shape: a link spanning paragraphs — </p>
        # pops the <a> from the open stack but it stays ACTIVE, so the
        # next paragraph's text reconstructs it (new element, new href)
        t, hrefs, _ = extract_html('<p><a href="1">x</p><p>y</a>z')
        assert t == "x y z"
        assert hrefs == ["1", "1"]

    def test_a_in_a_with_block_clones_then_switches(self):
        # second <a> start runs the agency for the first (clone into the
        # open div), then the new anchor reconstructs after </div>
        t, hrefs, _ = extract_html('<a href="1">x<div>y<a href="2">z</div>w')
        assert t == "x y z w"
        assert hrefs == ["1", "1", "2", "2"]

    def test_block_start_closing_p_pops_anchor(self):
        # <div> closes the open <p>, popping the <a>; reconstruction then
        # clones it inside the div AND after it
        t, hrefs, _ = extract_html('<p><a href="1">x<div>y</div>z')
        assert t == "x y z"
        assert hrefs == ["1", "1", "1"]

    def test_anchor_wrapping_block_is_one_element(self):
        # card-link pattern: the parser nests the div INSIDE the open <a>
        # (no agency run) — exactly one element, one href
        t, hrefs, _ = extract_html('<a href="1"><div>x</div></a>y')
        assert t == "x y"
        assert hrefs == ["1"]

    def test_end_a_inside_cell_out_of_scope_ignored(self):
        # </a> inside a td cannot close an <a> opened outside the table
        # (td is a scope barrier + formatting-list marker)
        t, hrefs, _ = extract_html(
            '<a href="1">x<table><tr><td>c</a>d</td></tr></table>y</a>'
        )
        assert t == "x c d y"
        assert hrefs == ["1"]

    # --- table foster parenting: content re-parented BEFORE the table ----
    def test_foster_div_only_content(self):
        # spec "in table" anything-else -> foster parent: div moves before
        # the table -> body div(x), table -> "x"
        t, _, _ = extract_html("<table><div>x</div></table>")
        assert t == "x"

    def test_foster_text_after_row(self):
        # spec "in table text": non-whitespace pending text -> foster.
        # "x" re-parents before the table -> body "x", table(c) -> "x c"
        t, _, _ = extract_html("<table><tr><td>c</td></tr>x</table>")
        assert t == "x c"

    def test_foster_div_after_row(self):
        t, _, _ = extract_html("<table><tr><td>c</td></tr><div>y</div></table>")
        assert t == "y c"

    def test_foster_text_before_rows_and_surroundings(self):
        # "b" fosters before the table; it already precedes the cells in
        # document order, so the join order is a b c d on both sides
        t, _, _ = extract_html("a<table>b<tr><td>c</td></tr></table>d")
        assert t == "a b c d"

    def test_foster_whitespace_left_in_place(self):
        # spec "in table text": ALL-whitespace token inserts in place (no
        # foster); TrimSpace then drops it on both sides
        t, _, _ = extract_html("<table> <tr> <td>c</td> </tr> </table>")
        assert t == "c"

    def test_foster_anchor_href_order(self):
        # the fostered <a> moves before the table with its text; its href
        # must precede the in-cell one in HtmlUrls document order
        t, hrefs, _ = extract_html(
            '<table><a href="u">x</a><tr><td><a href="v">c</a></td></tr></table>'
        )
        assert t == "x c"
        assert hrefs == ["u", "v"]

    def test_foster_nested_table_in_cell(self):
        # inner "z" fosters before the INNER table (inside the outer td);
        # outer "q" (after </tr>, "in table body" mode) fosters before the
        # OUTER table -> DFS: q, z, w
        t, _, _ = extract_html(
            "<table><tr><td><table>z<tr><td>w</td></tr></table></td></tr>q</table>"
        )
        assert t == "q z w"

    def test_cell_content_not_fostered(self):
        t, _, _ = extract_html("<table><caption>cap</caption><tr><td>c</td></tr></table>")
        assert t == "cap c"

    def test_text_between_cells_fostered(self):
        # after </td> the mode is "in row": non-ws text fosters -> "y" and
        # "x" both move before the table, arrival order kept: "x y a b"
        t, _, _ = extract_html("<table><tr>x<td>a</td>y<td>b</td></tr></table>")
        assert t == "x y a b"


def test_extract_anchors_semantics():
    """Anchor-text extraction corners: nested inline markup, implied close
    on a new <a>, rawtext skip, entities, named anchors (no href), EOF
    unclosed, whitespace collapse, svg subtree skip."""
    from grawler_ray.htmlparse import extract_anchors

    cases = [
        ('<a href="/x">hello <b>world</b></a>', [("/x", "hello world")]),
        ('<a href="/1">one<a href="/2">two</a>', [("/1", "one"), ("/2", "two")]),
        ('<a href="/s"><script>var a=1;</script>text</a>', [("/s", "text")]),
        ('<a href="/e">a &amp; b</a>', [("/e", "a & b")]),
        ('<a name="top">skip</a><a href="/k">keep</a>', [("/k", "keep")]),
        ('<a href="/u">unclosed at eof', [("/u", "unclosed at eof")]),
        ('<a href="/w">  lots\n of   space </a>', [("/w", "lots of space")]),
        ("<p>no links</p>", []),
        ('<a href="/svg"><svg><text>icon</text></svg>go</a>', [("/svg", "go")]),
        ('<a href="">empty href kept</a>', [("", "empty href kept")]),
        ('<a href="/d">x</a><a href="/d">x</a>',
         [("/d", "x"), ("/d", "x")]),  # duplicates kept, like extract_html
    ]
    for html, want in cases:
        assert extract_anchors(html) == want, html


class TestRobotsMetaChannels:
    """extract_html_ex's robots channels (meta name=robots directives and
    per-href rel=nofollow flags) — the pinned text/href/meta outputs are
    asserted identical to extract_html in every case."""

    def _ex(self, html):
        from grawler_ray.htmlparse import extract_html, extract_html_ex

        t, h, m, d, nf = extract_html_ex(html)
        t2, h2, m2 = extract_html(html)
        assert (t, h, m) == (t2, h2, m2)
        return t, h, m, d, nf

    def test_directives_union_and_none(self):
        html = ('<meta name="robots" content="NOINDEX">'
                '<meta name="Robots" content="noarchive, nofollow">x')
        _, _, _, d, _ = self._ex(html)
        assert d == {"noindex", "noarchive", "nofollow"}
        _, _, _, d2, _ = self._ex('<meta name="robots" content="none">x')
        assert d2 == {"noindex", "nofollow"}

    def test_non_robots_meta_ignored(self):
        _, _, _, d, _ = self._ex('<meta name="googlebot" content="noindex">x')
        assert d == frozenset()

    def test_rel_nofollow_token_match(self):
        html = ('<a href="/a" rel="nofollow">a</a>'
                '<a rel="external NOFOLLOW" href="/b">b</a>'
                '<a href="/c" rel="nofollower">c</a>'
                '<a href="/d">d</a>')
        _, h, _, _, nf = self._ex(html)
        assert h == ["/a", "/b", "/c", "/d"]
        assert nf == [True, True, False, False]

    def test_foster_parented_flag_alignment(self):
        # the fostered link moves BEFORE the table; its flag must move too
        html = ('<a href="/pre" rel="nofollow">p</a>'
                "<table><a href=\"/fostered\">f</a>"
                "<tr><td><a href=\"/cell\" rel=\"nofollow\">c</a></td></tr></table>")
        _, h, _, _, nf = self._ex(html)
        assert h == ["/pre", "/fostered", "/cell"]
        assert nf == [True, False, True]

    def test_parse_page_respect_nofollow(self):
        from grawler_ray.htmlparse import parse_page

        body = ('<html><body><meta name="robots" content="noindex">'
                '<a href="/x">x</a><a rel="nofollow" href="/y">y</a>'
                "text</body></html>").encode()
        base = "https://h.test"
        d_on = parse_page(body, "text/html", f"{base}/p", base, "h.test",
                          respect_nofollow=True)
        d_off = parse_page(body, "text/html", f"{base}/p", base, "h.test")
        assert d_on["noindex"] and not d_off["noindex"]
        assert d_on["child_urls"] == [f"{base}/x"]
        assert d_off["child_urls"] == [f"{base}/x", f"{base}/y"]
        assert d_on["content"] == d_off["content"]

    def test_page_nofollow_drops_all_children(self):
        from grawler_ray.htmlparse import parse_page

        body = ('<html><body><meta name="robots" content="nofollow">'
                '<a href="/x">x</a>text</body></html>').encode()
        base = "https://h.test"
        d = parse_page(body, "text/html", f"{base}/p", base, "h.test",
                       respect_nofollow=True)
        assert d["child_urls"] == [] and not d["noindex"]
