"""Property-based tests (SURVEY §5.3) — no Ray, hypothesis over the pure core."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from grawler_ray.config import CrawlConfig
from grawler_ray.htmlparse import extract_html, parse_page
from grawler_ray.oracle import run_oracle
from grawler_ray.urlops import UrlError, child_url_allowed, extract_url_components, url_allowed

ASCII_WORD = re.compile(r"^[0-9a-z_]+$")

html_text = st.text(
    alphabet=string.ascii_letters + string.digits + " \n\t<>&;/=\"'#?%.:-_é",
    max_size=400,
)


@given(html_text)
@settings(max_examples=150, deadline=None)
def test_parse_page_invariants(body):
    d = parse_page(body.encode(), "text/html", "https://h.test/p", "https://h.test", "h.test")
    # M9: extracted content never contains raw newlines / CRs
    assert "\n" not in d["content"] and "\r" not in d["content"]
    # A1: words are lowercase ASCII word-class tokens with positive counts
    for w, f in d["words"].items():
        assert ASCII_WORD.match(w), w
        assert f >= 1
    # M12 survivors: non-empty, not fragment/query-only
    for c in d["child_urls"]:
        assert c != ""
        assert c[0] not in "#?"


@given(html_text)
@settings(max_examples=100, deadline=None)
def test_extract_is_deterministic(body):
    assert extract_html(body) == extract_html(body)


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_url_parse_never_wrong_type(u):
    try:
        s, h, p = extract_url_components(u)
    except UrlError:
        return
    assert isinstance(s, str) and isinstance(h, str) and isinstance(p, str)
    # anything urlAllowed admits has an http(s) scheme and a non-robots path
    if url_allowed(s, h, p):
        assert s in ("http", "https")
        assert p != "/robots.txt"


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_child_url_survivors_are_valid_utf8(c):
    out = child_url_allowed(c, "https://base.test")
    if out is not None:
        out.encode("utf-8")  # must not raise
        assert out[0] not in "#?"


@st.composite
def tiny_web(draw):
    n_hosts = draw(st.integers(1, 3))
    pages = {}
    for hi in range(n_hosts):
        pages[f"https://h{hi}.test/robots.txt"] = {
            "html": b"User-agent: *\nAllow: /\n",
            "content_type": "text/plain",
            "status_code": 200,
        }
        n_pages = draw(st.integers(1, 4))
        for pi in range(n_pages):
            links = draw(
                st.lists(st.sampled_from([f"/p{j}" for j in range(4)] + ["#f", "?q"]), max_size=4)
            )
            body = "".join(f'<a href="{l}">x</a>' for l in links).encode()
            pages[f"https://h{hi}.test/p{pi}"] = {
                "html": body,
                "content_type": "text/html",
                "status_code": 200,
            }
    seeds = [f"https://h{hi}.test/p0" for hi in range(n_hosts)]
    return pages, seeds


@given(tiny_web(), st.integers(1, 3))
@settings(max_examples=40, deadline=None)
def test_oracle_invariants(web, quota):
    pages, seeds = web
    cfg = CrawlConfig(per_host_quota=quota, max_rounds=6)
    res = run_oracle(pages, seeds, cfg, {})
    # politeness: per round, at most `quota` URLs per host pass the slot gate
    per_round_host: dict = {}
    for t in res.trace:
        if t["action"] in ("fetched", "scheme-drop", "robots-drop", "fetch-miss", "type-drop"):
            key = (t["round"], t["url"].split("/")[2])
            per_round_host[key] = per_round_host.get(key, 0) + 1
    assert all(v <= quota for v in per_round_host.values())
    # every fetched url is in the seen set, exactly once in documents
    fetched = [t["url"] for t in res.trace if t["action"] == "fetched"]
    assert set(fetched) == res.seen
    assert len(fetched) == len(set(fetched)) == len(res.documents)
    # dedup idempotence: re-crawling the same seeds adds nothing new
    res2 = run_oracle(pages, seeds, cfg, {})
    assert res2.seen == res.seen


@given(tiny_web())
@settings(max_examples=20, deadline=None)
def test_oracle_deterministic(web):
    pages, seeds = web
    cfg = CrawlConfig(per_host_quota=2, max_rounds=5)
    a = run_oracle(pages, seeds, cfg, {})
    b = run_oracle(pages, seeds, cfg, {})
    assert a.trace == b.trace
    assert a.documents == b.documents


# --- round-2 kernels -------------------------------------------------------

words_text = st.text(
    alphabet=string.ascii_lowercase + string.ascii_uppercase + string.digits + " .,\n",
    max_size=300,
)


@given(words_text)
@settings(max_examples=100, deadline=None)
def test_shingles_deterministic_and_64bit(text):
    from grawler_ray.functions.dedup import shingles

    s1, s2 = shingles(text), shingles(text)
    assert s1 == s2
    assert all(0 <= h < (1 << 64) for h in s1)


@given(words_text, words_text)
@settings(max_examples=60, deadline=None)
def test_jaccard_symmetric_bounded(t1, t2):
    from grawler_ray.functions.dedup import jaccard, shingles

    a, b = shingles(t1), shingles(t2)
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(b, a)
    assert jaccard(a, a) == 1.0


@given(st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_pdf_literal_escape_roundtrip_never_crashes(raw):
    """The PDF string decoder must accept arbitrary escape garbage."""
    from grawler_ray.functions.pdf import _decode_hex, _decode_literal

    _decode_literal(raw)
    _decode_hex(raw)


@given(st.binary(max_size=500))
@settings(max_examples=60, deadline=None)
def test_pdf_extract_never_crashes(raw):
    from grawler_ray.functions.pdf import extract_pdf_text

    out = extract_pdf_text(b"%PDF-1.4\n" + raw)
    assert isinstance(out, str)


@given(
    st.binary(min_size=0, max_size=6000),
    st.sampled_from([(16, 64, 256), (64, 256, 1024), (32, 128, 128)]),
)
@settings(max_examples=80, deadline=None)
def test_cdc_boundaries_properties(data, sizes):
    """Gear-CDC invariants on arbitrary bytes: equals the per-byte serial
    walk, partitions the input exactly, respects min (except possibly the
    final tail) and max everywhere."""
    from grawler_ray.functions.dedup import _cdc_boundaries
    from tests.test_dedup_pipelines import _serial_cdc

    mn, av, mx = sizes
    cuts = _cdc_boundaries(data, mn, av, mx).tolist()
    assert cuts == _serial_cdc(data, mn, av, mx)
    if not data:
        assert cuts == []
        return
    assert cuts[-1] == len(data) and sorted(cuts) == cuts
    lens = [b - a for a, b in zip([0] + cuts[:-1], cuts)]
    assert all(1 <= ln <= mx for ln in lens)


@given(
    st.dictionaries(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=100_000),
)
@settings(max_examples=80, deadline=None)
def test_hamilton_serial_properties(weights, budget):
    """The exact-integer Hamilton rule (the serial mirror of
    apportion_budget's math): allocations sum to the budget and every
    key's share sits within floor/ceil of its exact quota."""
    import math

    W = sum(weights.values())
    base = {k: budget * w // W for k, w in weights.items()}
    rem = {k: budget * w % W for k, w in weights.items()}
    order = sorted(weights, key=lambda k: (-rem[k], k))
    L = budget - sum(base.values())
    assert 0 <= L < len(weights) or (L == 0 and len(weights) == 0) or L < len(weights) + 1
    alloc = {k: base[k] + (1 if order.index(k) < L else 0) for k in weights}
    assert sum(alloc.values()) == budget
    for k, w in weights.items():
        exact = budget * w / W
        assert math.floor(exact) <= alloc[k] <= math.ceil(exact)
