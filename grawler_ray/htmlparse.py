"""HTML extraction reproducing the reference's parser semantics.

The reference parses with Go x/net/html (WHATWG HTML5) and then runs three
independent DFS extractions over the tree:

- ``parsers.HtmlUrls``     (src/parsers/html.go:69-82): every ``href`` attr of
  every ``<a>`` element, in document order (duplicates kept).
- ``parsers.HtmlMetaData`` (src/parsers/html.go:10-67): first-wins icon /
  title / description / site_name.
- ``parsers.HtmlText``     (src/parsers/html.go:84-116): TrimSpace each text
  node, skip {script, style, noscript, svg, iframe} subtrees, join non-empty
  child results with single spaces, TrimSpace at each element.

Because every text leaf is trimmed before joining, the nested trim-join is
associative: the result equals ``' '.join(trimmed non-empty text nodes in
document order, excluding skipped subtrees)``.  That lets us extract in ONE
streaming pass over the token stream (stdlib ``html.parser``) with no DOM at
all — the hot-path cost is one tokenizer scan per document.

Tokenizer parity notes (vs x/net/html, which follows the HTML5 spec):
- rawtext elements (content is a single text node, no entity decoding, no
  child elements): script, style, iframe, xmp, noembed, noframes, and
  noscript (x/net/html parses with scripting enabled by default).
- RCDATA elements (text content, entities decoded): title, textarea.
- Entity references in normal text and in attribute values are decoded with
  the HTML5 named/numeric tables by both sides.
- Adjacent text chunks are coalesced into one logical text node (Go's
  ``addText`` appends to the previous text sibling), flushed at every tag /
  comment / doctype boundary — required because TrimSpace applies per NODE.

WHATWG tree-construction cases reproduced without a tree (hand-derived from
the HTML5 spec "in table"/"in row"/"in cell" insertion modes; pinned by
tests/test_htmlparse.py::TestWhatwgTreeConstruction):
- Implied end tags (``<p>a<p>b``, ``<li>a<li>b``): the tree re-parents but
  text/hrefs keep document order — the flat scan is already equivalent.
- Adoption agency text (``<b>bold<i>both</b>italic</i>``): formatting
  elements are cloned/re-parented but text nodes keep document order —
  flat scan equivalent.
- Table FOSTER PARENTING: non-whitespace text (and flow content such as
  ``<a href>``) hit while inside ``<table>`` but NOT inside a cell/caption
  is re-parented immediately BEFORE the table, so Go's HtmlText emits it
  before any cell text.  Reproduced by recording an insert point per open
  table and inserting fostered text parts / hrefs there (in order) instead
  of appending.  Whitespace-only text is left in place by the spec ("in
  table text": all-whitespace inserts in place) — TrimSpace drops it on
  both sides, so it never matters.
- Adoption agency <a> CLONING (r5): Go's parser duplicates <a> elements
  across block boundaries and its HtmlUrls walk reports every copy.  A
  lightweight open-elements emulation (tag stack + the single active
  formatting <a>) reproduces the three observable mechanisms: one clone
  per special element crossed by ``</a>`` (outer-loop iterations), the
  agency run triggered by a second ``<a>`` start, and reconstruction of
  the active <a> after an enclosing end tag / p-closing block start pops
  it.  Markers (td/caption/...) gate reconstruction and scope exactly as
  the formatting-list rules require.  Only <a> is tracked — b/i/em clones
  carry no observable attribute.  Browser-DOM-verified fixtures in
  TestWhatwgTreeConstruction pin every shape; text order was already
  identical.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

from .textops import (
    byte_prefix,
    go_json_str,
    go_trim_space,
    process_text,
    to_valid_utf8,
    words_freq,
)
from .urlops import child_url_allowed

# HtmlText skip list — src/parsers/html.go:98
_TEXT_SKIP = {"script", "style", "noscript", "svg", "iframe"}
# HTML5 rawtext / RCDATA element sets (x/net/html tokenizer behavior)
_RAWTEXT = ("script", "style", "iframe", "xmp", "noembed", "noframes", "noscript")
_RCDATA = ("title", "textarea")

_ICON_RELS = ("icon", "icon shortcut", "shortcut icon")

# HTML5 void elements (never pushed on the open-elements emulation)
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
# the spec "special" category (13.2.4.2) — furthest-block candidates for
# the adoption agency, and end-tag walk barriers
_SPECIAL = {
    "address", "applet", "area", "article", "aside", "base", "basefont",
    "bgsound", "blockquote", "body", "br", "button", "caption", "center",
    "col", "colgroup", "dd", "details", "dir", "div", "dl", "dt", "embed",
    "fieldset", "figcaption", "figure", "footer", "form", "frame",
    "frameset", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hgroup", "hr", "html", "iframe", "img", "input", "keygen", "li",
    "link", "listing", "main", "marquee", "menu", "meta", "nav", "noembed",
    "noframes", "noscript", "object", "ol", "p", "param", "plaintext",
    "pre", "script", "section", "select", "source", "style", "summary",
    "table", "tbody", "td", "template", "textarea", "tfoot", "th",
    "thead", "title", "tr", "track", "ul", "wbr", "xmp",
}
# start tags whose "in body" handler closes an open <p> in button scope
_CLOSES_P = {
    "address", "article", "aside", "blockquote", "center", "details",
    "dialog", "dir", "div", "dl", "dd", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hgroup", "hr", "li", "listing", "main", "menu", "nav",
    "ol", "p", "plaintext", "pre", "section", "summary", "table", "ul",
    "xmp",
}
_BUTTON_SCOPE_BARRIERS = {
    "html", "table", "td", "th", "caption", "applet", "object", "marquee",
    "template", "button",
}
# active-formatting-list markers (13.2.4.3): reconstruction and the
# adoption agency never cross these
_AFE_MARKERS = {"td", "th", "caption", "applet", "object", "marquee", "template"}
# void start tags whose in-body handler still reconstructs formatting
_RECONSTRUCT_VOIDS = {"br", "img", "input", "embed", "area", "wbr", "keygen"}


class _Extractor(HTMLParser):
    """One-pass extraction of text parts, hrefs and metadata."""

    CDATA_CONTENT_ELEMENTS = _RAWTEXT + _RCDATA

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.text_parts: list[str] = []
        self.hrefs: list[str] = []
        # robots metadata (our addition; the reference ignores it) — the
        # pinned outputs above are untouched: these are EXTRA channels
        # consumed only via extract_html_ex under respect_nofollow
        self.href_nofollow: list[bool] = []  # parallel to hrefs
        self.robots_directives: set[str] = set()
        self.icon_link = ""
        self.title = ""
        self._title_set = False
        self.description = ""
        self.site_name = ""
        self._buf: list[str] = []  # pending text chunks of the current node
        self._buf_ctx: str | None = None  # cdata_elem at buffer time
        self._svg_depth = 0
        self._in_title = False
        self._title_buf: list[str] = []
        # foster-parenting state: one frame per open <table> — the insert
        # positions recorded at table start (fostered content lands there,
        # i.e. immediately BEFORE the table) and whether we are inside a
        # cell/caption (normal insertion) vs table/row context (foster)
        self._tables: list[dict] = []
        # HTML5 open-elements emulation for <a>-clone parity (Go's
        # adoption agency duplicates <a> elements across block
        # boundaries, src/parsers/html.go:69-82 walks the PARSED tree):
        # a tag-name stack plus the single active formatting <a> (the
        # spec allows at most one).  _a_state: href/nofollow of the
        # element, whether it is on the open stack (vs active-only,
        # awaiting reconstruction), its stack index, and the marker
        # count at activation (reconstruction never crosses markers).
        self._stack: list[str] = []
        self._a_state: dict | None = None

    def _foster(self):
        """The innermost table frame if content hit now would be
        foster-parented (in table/row context, not in a cell), else None."""
        if self._tables and self._tables[-1]["cell"] == 0:
            return self._tables[-1]
        return None

    def _emit_text(self, part: str) -> None:
        f = self._foster()
        if f is None:
            self.text_parts.append(part)
        else:
            self.text_parts.insert(f["t_idx"], part)
            f["t_idx"] += 1

    def _emit_href(self, href: str, nofollow: bool = False) -> None:
        f = self._foster()
        if f is None:
            self.hrefs.append(href)
            self.href_nofollow.append(nofollow)
        else:
            self.hrefs.insert(f["h_idx"], href)
            self.href_nofollow.insert(f["h_idx"], nofollow)
            f["h_idx"] += 1

    # -- <a>-clone parity helpers (adoption agency + reconstruction) -------
    def _mc(self) -> int:
        return sum(1 for t in self._stack if t in _AFE_MARKERS)

    def _pop_to(self, i: int) -> None:
        """Pop stack[i:] — an <a> popped this way stays ACTIVE (spec:
        popping the open-elements stack never edits the formatting list),
        unless a marker above its activation point was popped (the
        clear-to-marker rule)."""
        a = self._a_state
        if a and a["open"] and a["idx"] >= i:
            a["open"] = False
        del self._stack[i:]
        if self._a_state and self._a_state["mc"] > self._mc():
            self._a_state = None

    def _close_in_scope(self, targets, barriers) -> None:
        for i in range(len(self._stack) - 1, -1, -1):
            t = self._stack[i]
            if t in targets:
                self._pop_to(i)
                return
            if t in barriers:
                return

    def _reconstruct_a(self) -> None:
        """Reconstruct the active formatting <a> (spec 13.2.4.3): a NEW
        element is created — Go's HtmlUrls reports its href again."""
        a = self._a_state
        if a is None or a["open"] or self._mc() != a["mc"]:
            return
        if a["href"] is not None:
            self._emit_href(a["href"], a["nofollow"])
        self._stack.append("a")
        a["idx"] = len(self._stack) - 1
        a["open"] = True

    def _aaa_close(self) -> None:
        """The adoption agency run for subject "a" (</a>, or an <a> start
        while one is active).  One CLONE per special element deeper than
        the <a> on the open stack (each outer-loop iteration appends a
        clone into the next furthest block — verified against browser
        DOMs), capped at the spec's 8 iterations; the blocks stay open."""
        a = self._a_state
        if a is None:
            return
        if not a["open"]:
            self._a_state = None  # step: not in open stack -> just remove
            return
        if self._mc() != a["mc"]:
            return  # not in scope (e.g. </a> inside a cell) -> ignored
        self._a_state = None
        idx = a["idx"]
        n_special = sum(1 for t in self._stack[idx + 1 :] if t in _SPECIAL)
        if n_special:
            if a["href"] is not None:
                for _ in range(min(n_special, 7)):
                    self._emit_href(a["href"], a["nofollow"])
            del self._stack[idx]  # the furthest blocks remain open
        else:
            self._pop_to(idx)

    # -- text node handling -------------------------------------------------
    def _flush_text(self) -> None:
        if not self._buf:
            return
        data = "".join(self._buf)
        self._buf.clear()
        if self._in_title:
            # RCDATA: entities decoded (cdata mode suppresses convert_charrefs)
            self._title_buf.append(_html.unescape(data))
        ctx = self._buf_ctx
        self._buf_ctx = None
        if self._svg_depth > 0:
            return
        if ctx in ("title", "textarea"):
            data = _html.unescape(data)
        elif ctx is not None and ctx in _TEXT_SKIP:
            return  # script/style/iframe/noscript raw content
        # xmp/noembed/noframes rawtext is NOT in the HtmlText skip list, so it
        # contributes raw (entities undecoded), matching Go's DOM text node.
        trimmed = go_trim_space(data)
        if trimmed:
            self._emit_text(trimmed)

    def handle_data(self, data: str) -> None:
        # "in body" character tokens reconstruct the active formatting
        # elements (even whitespace); rawtext/RCDATA and foreign content
        # use text modes that don't.  In table-non-cell context only
        # non-whitespace fosters (and reconstructs) — whitespace inserts
        # in place ("in table text").
        if (
            self.cdata_elem is None
            and self._svg_depth == 0
            and self._a_state is not None
            and not self._a_state["open"]
            and (self._foster() is None or data.strip())
        ):
            self._reconstruct_a()
        if self._buf and self._buf_ctx != self.cdata_elem:
            self._flush_text()
        self._buf_ctx = self.cdata_elem
        self._buf.append(data)

    # -- structure ----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush_text()
        # --- open-elements emulation (the <a>-clone observables) ---
        if tag in _CLOSES_P:
            self._close_in_scope({"p"}, _BUTTON_SCOPE_BARRIERS)
        if tag == "li":
            self._close_in_scope(
                {"li"}, _SPECIAL - {"address", "div", "p"} - {"li"}
            )
        elif tag in ("dd", "dt"):
            self._close_in_scope(
                {"dd", "dt"}, _SPECIAL - {"address", "div", "p"} - {"dd", "dt"}
            )
        if tag in ("td", "th", "caption", "tr", "tbody", "thead", "tfoot"):
            # a new cell/row implies closing any open cell (cells don't nest)
            self._close_in_scope({"td", "th"}, {"table"})
        if tag == "a":
            self._aaa_close()  # a-in-a: agency runs for the previous <a>
        elif tag not in _SPECIAL or tag in _RECONSTRUCT_VOIDS:
            # phrasing-content start tags reconstruct active formatting
            self._reconstruct_a()
        if tag not in _VOID:
            self._stack.append(tag)
        if tag == "table":
            # record the foster insert point: content re-parented out of
            # this table lands immediately before it, in arrival order
            self._tables.append(
                {"t_idx": len(self.text_parts), "h_idx": len(self.hrefs), "cell": 0}
            )
        elif self._tables:
            if tag in ("td", "th", "caption"):
                # cells don't nest: a new cell implies closing any open one
                self._tables[-1]["cell"] = 1
            elif tag in ("tr", "tbody", "thead", "tfoot"):
                # row/section start implies the end of any open cell —
                # content after it (outside a new cell) fosters again
                self._tables[-1]["cell"] = 0
        if tag == "svg":
            self._svg_depth += 1
        elif tag == "a":
            # rel scanned first (attr order must not matter for the flag,
            # unlike <link>'s pinned rel-before-href rule below)
            nofollow = any(
                k == "rel" and v is not None and "nofollow" in v.lower().split()
                for k, v in attrs
            )
            first_href = None
            for k, v in attrs:
                if k == "href":
                    v = v if v is not None else ""
                    if first_href is None:
                        first_href = v
                    self._emit_href(v, nofollow)
            # this <a> becomes THE active formatting anchor (clones use
            # the first href, as Go's clone copies the element's attrs)
            self._a_state = {
                "href": first_href,
                "nofollow": nofollow,
                "open": True,
                "idx": len(self._stack) - 1,
                "mc": self._mc(),
            }
        elif tag == "link":
            # src/parsers/html.go:21-34 — rel must precede href in attr order
            rel = ""
            for k, v in attrs:
                v = v if v is not None else ""
                if k == "rel":
                    rel = v
                elif k == "href":
                    if rel in _ICON_RELS and self.icon_link == "":
                        self.icon_link = v
        elif tag == "meta":
            # src/parsers/html.go:40-57 — collect attrs, then first-wins checks
            name = prop = content = ""
            for k, v in attrs:
                v = v if v is not None else ""
                if k == "name":
                    name = v
                elif k == "property":
                    prop = v
                elif k == "content":
                    content = v
            if (name == "description" or prop == "og:description") and self.description == "":
                self.description = content
            if prop == "og:site_name" and self.site_name == "":
                self.site_name = content
            if name.lower() == "robots":
                # union across multiple tags = most restrictive wins;
                # "none" is the REP shorthand for noindex+nofollow
                for tok in content.lower().split(","):
                    tok = tok.strip()
                    if tok == "none":
                        self.robots_directives.update(("noindex", "nofollow"))
                    elif tok:
                        self.robots_directives.add(tok)
        elif tag == "title":
            self._in_title = True
            self._title_buf = []

    def handle_endtag(self, tag: str) -> None:
        self._flush_text()
        # --- open-elements emulation ---
        if tag == "a":
            self._aaa_close()
        elif tag in ("td", "th", "caption", "tr", "tbody", "thead", "tfoot", "table"):
            # table-structure end tags close through anything open inside
            for i in range(len(self._stack) - 1, -1, -1):
                if self._stack[i] == tag:
                    self._pop_to(i)
                    break
        elif tag not in _VOID:
            # "any other end tag": pop through the matching element, but a
            # SPECIAL element in between swallows the token entirely
            for i in range(len(self._stack) - 1, -1, -1):
                t = self._stack[i]
                if t == tag:
                    self._pop_to(i)
                    break
                if t in _SPECIAL:
                    break
        if tag == "table" and self._tables:
            self._tables.pop()
        elif tag in ("td", "th", "caption") and self._tables:
            self._tables[-1]["cell"] = 0
        if tag == "svg" and self._svg_depth > 0:
            self._svg_depth -= 1
        elif tag == "title" and self._in_title:
            self._in_title = False
            # Go: first <title> whose element has a FirstChild (>=1 text node)
            text = "".join(self._title_buf)
            if self._title_buf and not self._title_set:
                self.title = text
                self._title_set = True
            self._title_buf = []

    def handle_startendtag(self, tag: str, attrs) -> None:
        # foreign-content self-closing tags (<path/>), plus void elements
        self._flush_text()
        if tag == "a":
            for k, v in attrs:
                if k == "href":
                    self._emit_href(v if v is not None else "")
        elif tag in ("link", "meta"):
            self.handle_starttag(tag, attrs)

    def handle_comment(self, data: str) -> None:
        self._flush_text()

    def handle_decl(self, decl: str) -> None:
        self._flush_text()

    def handle_pi(self, data: str) -> None:
        self._flush_text()

    def close(self) -> None:
        super().close()
        self._flush_text()


def extract_html(content: str) -> tuple[str, list[str], dict[str, str]]:
    """Run the one-pass extractor.  Returns (joined_text, hrefs, metadata)
    where joined_text is the HtmlText equivalent (pre-ProcessText)."""
    joined, hrefs, meta, _, _ = extract_html_ex(content)
    return joined, hrefs, meta


def extract_html_ex(
    content: str,
) -> tuple[str, list[str], dict[str, str], frozenset, list[bool]]:
    """extract_html plus the robots channels: (joined_text, hrefs, meta,
    robots_directives, href_nofollow) — the last two feed
    ``parse_page(respect_nofollow=True)`` (meta name=robots content
    tokens, and a per-href rel=nofollow flag parallel to hrefs).  The
    first three outputs are byte-identical to :func:`extract_html` (the
    crawl e2e golden pins them)."""
    ex = _Extractor()
    ex.feed(content)
    ex.close()
    meta = {
        "icon_link": ex.icon_link,
        "title": ex.title,
        "description": ex.description,
        "site_name": ex.site_name,
    }
    return (
        " ".join(ex.text_parts),
        ex.hrefs,
        meta,
        frozenset(ex.robots_directives),
        ex.href_nofollow,
    )


class _AnchorExtractor(HTMLParser):
    """Anchor-text extraction: (href, link text) per ``<a href>``.

    Separate from :class:`_Extractor` on purpose — the Go-parity text
    extractor is pinned byte-identical by the crawl e2e golden and must
    not grow behavior.  The reference never extracts anchor text
    (src/parsers/html.go:69-82 takes hrefs only); this is the classic
    web-scale addition — anchor text is the strongest off-page relevance
    /label signal (Brin & Page, WWW 1998 §2.2 use it directly).

    Semantics (documented, not WHATWG-complete): link text is every text
    node between ``<a href>`` and its ``</a>`` — including nested inline
    markup — whitespace-collapsed; script/style/svg/iframe/noscript
    content is skipped; entities decode; a new ``<a>`` implies closing an
    open one (browsers auto-close; nested <a> is invalid HTML); an
    unclosed ``<a>`` at EOF still emits.  Anchors with no href attribute
    (named anchors) are ignored.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []
        self._href: str | None = None
        self._parts: list[str] = []
        self._skip_depth = 0

    def _close_a(self) -> None:
        if self._href is not None:
            self.anchors.append((self._href, " ".join("".join(self._parts).split())))
        self._href = None
        self._parts = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _TEXT_SKIP:
            self._skip_depth += 1
            return
        if tag == "a":
            self._close_a()
            for k, v in attrs:
                if k == "href":
                    self._href = v if v is not None else ""
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag in _TEXT_SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "a":
            self._close_a()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "a":  # <a ... /> — void form carries no text
            self._close_a()
            for k, v in attrs:
                if k == "href":
                    self.anchors.append((v if v is not None else "", ""))
                    break

    def handle_data(self, data: str) -> None:
        if self._href is not None and self._skip_depth == 0 and not self.cdata_elem:
            self._parts.append(data)

    def close(self) -> None:
        super().close()
        self._close_a()


def extract_anchors(content: str) -> list[tuple[str, str]]:
    """(href, collapsed link text) for every ``<a href>`` in document
    order, duplicates kept (same href policy as ``extract_html``)."""
    ex = _AnchorExtractor()
    ex.feed(content)
    ex.close()
    return ex.anchors


def _fill_meta(meta: dict[str, str], content_bytes: bytes, host: str, base_url: str) -> dict[str, str]:
    """utils.FillTextDocEmptyMetaData (src/utils/utils.go:123-141).

    Fallback truncations are BYTE slices of the content (may split a rune);
    the Go values hit the JSON sink which replaces each invalid byte with
    U+FFFD — reproduced by go_json_str.
    """
    out = dict(meta)
    if out["title"] == "":
        out["title"] = go_json_str(content_bytes[:60])
    if out["description"] == "":
        # ProcessText on the truncated prefix; content already has no \n/\r,
        # so only the ASCII-space trim applies (byte level).
        out["description"] = go_json_str(content_bytes[:160].strip(b" "))
    if out["site_name"] == "":
        out["site_name"] = host
    if out["icon_link"] != "" and out["icon_link"][0] == "/":
        out["icon_link"] = base_url + out["icon_link"]
    return out


def parse_page(
    body: bytes,
    content_type: str,
    url: str,
    base_url: str,
    host: str,
    charset_sniffing: bool = False,
    raw_content_type: str = "",
    strip_boilerplate: bool = False,
    respect_nofollow: bool = False,
) -> dict:
    """parseDocument (src/crawler.go:284-313) for one fetched page.

    Returns a dict with keys: content, meta_icon_link, meta_site_name,
    meta_title, meta_description, child_urls (normalized via
    utils.childUrlAllowed, ready to enqueue), words (dict word->freq).

    ``charset_sniffing=True`` (CrawlConfig.charset_sniffing; default off
    = reference parity) decodes HTML via WHATWG sniffing (BOM > the RAW
    Content-Type header's charset param > meta prescan; textops.
    decode_page) instead of assuming UTF-8 — non-UTF-8 pages extract
    real text instead of mojibake.  Undecodable bytes become U+FFFD
    under the flag (the WHATWG rule) where the parity path REMOVES them
    (Go ToValidUTF8 with an empty replacement).

    ``strip_boilerplate=True`` (CrawlConfig.strip_boilerplate; default off
    = reference parity) stores the CETR main-content text
    (functions/boilerplate.py) instead of the whole tree's text; words are
    counted over the stripped text, and meta defaults fill from it.  Link
    discovery always runs over the FULL page either way.

    ``respect_nofollow=True`` (CrawlConfig.respect_nofollow; default off =
    reference parity — src/crawler.go follows everything) honors the
    Robots Exclusion Protocol's page-level HTML controls: a
    ``<meta name="robots">`` containing ``nofollow`` (or ``none``)
    suppresses ALL child links, a per-link ``rel="nofollow"`` suppresses
    that link, and ``noindex`` (or ``none``) sets the returned
    ``noindex`` flag so the document/words sinks exclude the page (it is
    still fetched, seen-committed and link-followed — the standard
    crawler semantics)."""
    if content_type == "text/html":
        if charset_sniffing:
            from .textops import decode_page

            content, _enc = decode_page(body, raw_content_type or content_type)
        else:
            content = to_valid_utf8(body)  # strings.ToValidUTF8(s, "") src/crawler.go:287
        joined, hrefs, meta, directives, nofollow_flags = extract_html_ex(content)
        page_nofollow = respect_nofollow and "nofollow" in directives
        noindex = respect_nofollow and "noindex" in directives
        if strip_boilerplate:
            from .functions.boilerplate import extract_main_text

            joined = extract_main_text(content)
        content = process_text(joined)
        content_bytes = content.encode("utf-8")
        meta = _fill_meta(meta, content_bytes, host, base_url)
        children = []
        if not page_nofollow:
            for h, nf in zip(hrefs, nofollow_flags):
                if respect_nofollow and nf:
                    continue
                norm = child_url_allowed(h, base_url)
                if norm is not None:
                    children.append(norm)
        words = words_freq(content)
        return {
            "content": content,
            "meta_icon_link": meta["icon_link"],
            "meta_site_name": meta["site_name"],
            "meta_title": meta["title"],
            "meta_description": meta["description"],
            "child_urls": children,
            "words": words,
            "noindex": noindex,
        }
    elif content_type == "text/plain":
        # No UTF-8 sanitize in this branch (src/crawler.go:303-309): the raw
        # bytes flow through ProcessText and the byte-prefix fallbacks, and
        # become valid UTF-8 only at the JSON sink (go_json_str).
        content_b = body.replace(b"\n", b"").replace(b"\r", b"").strip(b" ")
        meta = {"icon_link": "", "title": "", "description": "", "site_name": ""}
        meta = _fill_meta(meta, content_b, host, base_url)
        content = go_json_str(content_b)
        words = words_freq(content)
        return {
            "content": content,
            "meta_icon_link": meta["icon_link"],
            "meta_site_name": meta["site_name"],
            "meta_title": meta["title"],
            "meta_description": meta["description"],
            "child_urls": [],  # plain text has no ChildUrls (parse sets none)
            "words": words,
            "noindex": False,  # no HTML meta channel in plain text
        }
    elif content_type in _OFFICE_EXTRACTORS or content_type == "application/pdf":
        # extended_doc_types mode (config.py): the same extractors the
        # *_ingest queries gate, run inline.  Malformed payloads extract
        # as empty text (web corpora demand it) — deterministic, so the
        # serial oracle reproduces it through this same function.
        text = extract_office_text(body, content_type)
        content = process_text(text)
        content_bytes = content.encode("utf-8")
        meta = {"icon_link": "", "title": "", "description": "", "site_name": ""}
        meta = _fill_meta(meta, content_bytes, host, base_url)
        words = words_freq(content)
        return {
            "content": content,
            "meta_icon_link": meta["icon_link"],
            "meta_site_name": meta["site_name"],
            "meta_title": meta["title"],
            "meta_description": meta["description"],
            "child_urls": [],  # no link channel in document formats
            "words": words,
            "noindex": False,
        }
    else:  # unreachable behind documentAllowed (src/crawler.go:274-282)
        raise ValueError(f"content type not parseable: {content_type}")


_OFFICE_EXTRACTORS = (
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.oasis.opendocument.text",
    "application/rtf",
    "text/rtf",
    "application/epub+zip",
)


def extract_office_text(body: bytes, content_type: str) -> str:
    """Document-format text extraction for the extended crawl mode:
    route by MIME to the pure-stdlib parsers; a typed parser error
    yields "" (the page still traces "fetched" with empty content —
    a crawl survives corrupt documents)."""
    try:
        if content_type == "application/pdf":
            from .functions.pdf import read_pdf_from_bytes

            return read_pdf_from_bytes(body)
        if content_type.endswith("wordprocessingml.document"):
            from .functions.docx import extract_docx_text

            return extract_docx_text(body)
        if content_type == "application/vnd.oasis.opendocument.text":
            from .functions.odt import extract_odt_text

            return extract_odt_text(body)
        if content_type in ("application/rtf", "text/rtf"):
            from .functions.rtf import extract_rtf_text

            return extract_rtf_text(body)
        if content_type == "application/epub+zip":
            from .functions.epub import extract_epub

            # chapter texts are each already process_text-normalized;
            # join with spaces (the outer process_text is a no-op then)
            return " ".join(
                c[1] for c in extract_epub(body)["chapters"] if c[1]
            )
    except ValueError:
        return ""  # every codec error type subclasses ValueError
    raise ValueError(f"no extractor for {content_type}")
