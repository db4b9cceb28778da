"""Deterministic synthetic web corpus (FIXTURES.md §1).

"Fetching" at benchmark scale is a lookup into a Parquet corpus of
Common-Crawl-style pages (BASELINE.json input_hint):

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string
    (+ content_type:string, status_code:int16 for the fetch-drop rules)

The corpus forms a CLOSED deterministic link graph: seeds -> children ->
grandchildren, plus cross-links, duplicate links, dead links (URLs absent
from the table), fragment/query/percent-encoded/relative hrefs, invalid
UTF-8 bodies, text/plain pages, 404/500 rows and application/pdf rows — one
of every drop rule the reference implements (SURVEY §3.2).

Physical layout — THE PARTITIONING ASSUMPTION THE FETCH JOIN RELIES ON:
``{out}/bucket={k}/part.parquet`` with ``k = xxhash64(url) % num_buckets``,
rows sorted by ``url`` within each bucket.  The per-round fetch reads only
the buckets its frontier touches, with an ``url in (...)`` predicate pushed
into the Parquet scan; sorting by url makes row-group min/max pruning
effective.  At 100 TB this is what keeps a round's fetch proportional to the
frontier, not to the corpus.

Everything is a pure function of (seed, host_idx, page_idx) — no wall clock,
no RNG state shared across pages — so generation parallelizes embarrassingly
and two runs at any scale are byte-identical.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..htmlparse import extract_html
from ..textops import process_text, to_valid_utf8
from ..urlops import xxhash64

WARC_TS_BASE_US = 1_722_470_400_000_000  # 2024-08-01 UTC, synthetic

PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("content_type", pa.string()),
        ("status_code", pa.int16()),
    ]
)

_WORDS = (
    "circuit resistor capacitor voltage current signal amplifier diode "
    "transistor sensor arduino solder breadboard oscillator frequency pcb "
    "inductor relay microcontroller firmware embedded analog digital power "
    "battery charger regulator schematic datasheet tutorial guide review"
).split()


DOCX_CT = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
ODT_CT = "application/vnd.oasis.opendocument.text"
RTF_CT = "application/rtf"
EPUB_CT = "application/epub+zip"


def host_name(host_idx: int) -> str:
    return f"site{host_idx}.test"


def page_url(host_idx: int, page_idx: int) -> str:
    return f"https://{host_name(host_idx)}/page/{page_idx}"


def _rng(seed: int, *parts) -> random.Random:
    return random.Random(f"{seed}:" + ":".join(str(p) for p in parts))


def _sentence(r: random.Random, n: int) -> str:
    return " ".join(r.choice(_WORDS) for _ in range(n))


def page_spec(
    seed: int,
    host_idx: int,
    page_idx: int,
    n_hosts: int,
    pages_per_host: int,
    office_mix: bool = False,
) -> dict:
    """Everything about one page, derived deterministically.
    ``office_mix=True`` diverts some of the html share to real
    DOCX/ODT/RTF bodies (and keeps PDF) for the extended-doc-types
    crawl mode; default False leaves every existing corpus byte-stable."""
    r = _rng(seed, host_idx, page_idx)
    url = page_url(host_idx, page_idx)

    # ~3% hard-error rows (status > 399 -> fetch drop, src/utils/utils.go:40-42)
    roll = r.random()
    if roll < 0.02:
        status = 404
    elif roll < 0.03:
        status = 500
    else:
        status = 200

    # content type mix: mostly html, some plain, a few pdf (type-drop)
    roll = r.random()
    if office_mix and roll >= 0.80 and roll < 0.90:
        ctype = (DOCX_CT, ODT_CT, RTF_CT, EPUB_CT)[int(roll * 100) % 4]
    elif roll < 0.90:
        ctype = "text/html"
    elif roll < 0.97:
        ctype = "text/plain"
    else:
        ctype = "application/pdf"

    # children: same-host chain + fan-out + cross-host + edge-case hrefs
    hrefs: list[str] = []
    fan = r.randint(4, 10)
    for _ in range(fan):
        tgt = r.randrange(pages_per_host)
        hrefs.append(f"/page/{tgt}")  # root-relative (resolved against base)
    if r.random() < 0.5:  # cross-host absolute link
        oh = r.randrange(n_hosts)
        hrefs.append(page_url(oh, r.randrange(pages_per_host)))
    if r.random() < 0.25:  # duplicate link
        hrefs.append(hrefs[0])
    if r.random() < 0.2:  # dead link (page index beyond the table)
        hrefs.append(f"/page/{pages_per_host + r.randrange(100)}")
    if r.random() < 0.15:  # fragment / query (dropped by childUrlAllowed)
        hrefs.append("#section")
        hrefs.append("?sort=asc")
    if r.random() < 0.15:  # percent-encoded (valid) — decodes then resolves
        hrefs.append(f"/page%2F{r.randrange(pages_per_host)}".replace("%2F", "/"))
    if r.random() < 0.08:  # invalid percent escape => dropped
        hrefs.append("/bad%zzpage")
    if r.random() < 0.08:  # bare relative => passes childUrlAllowed, dies at urlAllowed
        hrefs.append("other.html")
    if r.random() < 0.05:  # robots.txt path => blocked by urlAllowed
        hrefs.append("/robots.txt")

    return {
        "url": url,
        "status": status,
        "ctype": ctype,
        "hrefs": hrefs,
        "host_idx": host_idx,
        "page_idx": page_idx,
    }


def page_body(seed: int, spec: dict) -> bytes:
    """Render the page body bytes for a spec (pure function)."""
    r = _rng(seed, "body", spec["host_idx"], spec["page_idx"])
    hi, pi = spec["host_idx"], spec["page_idx"]
    if spec["ctype"] == "text/plain":
        txt = f"plain page {pi} of {host_name(hi)}\n" + "\n".join(
            _sentence(r, 8) for _ in range(r.randint(2, 6))
        )
        body = txt.encode()
        if r.random() < 0.1:  # invalid utf-8 in plain text
            body += b" \xfe\xff tail"
        return body
    if spec["ctype"] == "application/pdf":
        return b"%PDF-1.4 fake " + _sentence(r, 5).encode()
    if spec["ctype"] == DOCX_CT:
        from ..functions.docx import build_docx

        return build_docx(
            f"docx page {pi} of {host_name(hi)}\n"
            + "\n".join(_sentence(r, 7) for _ in range(r.randint(2, 5))),
            split_runs=pi % 2 == 0,
        )
    if spec["ctype"] == ODT_CT:
        from ..functions.odt import build_odt

        return build_odt(
            f"odt page {pi} of {host_name(hi)}\n"
            + "\n".join(_sentence(r, 7) for _ in range(r.randint(2, 5))),
            use_spans=pi % 2 == 0,
        )
    if spec["ctype"] == EPUB_CT:
        from ..functions.epub import build_epub

        chapters = [
            (f"ch{k}", _sentence(r, 9)) for k in range(1 + r.randint(0, 2))
        ]
        return build_epub(f"epub page {pi} of {host_name(hi)}", chapters)
    if spec["ctype"] == RTF_CT:
        from ..functions.rtf import build_rtf

        return build_rtf(
            f"rtf page {pi} of {host_name(hi)}\n"
            + "\n".join(_sentence(r, 7) for _ in range(r.randint(2, 5))),
            uc=pi % 3,
        )

    anchors = "".join(
        f'<a href="{h}">{_sentence(r, 1)}</a> ' for h in spec["hrefs"]
    )
    variant = r.random()
    title = f"<title>Page {pi} — {host_name(hi)}</title>" if variant > 0.15 else ""
    meta = (
        f'<meta name="description" content="{_sentence(r, 6)}">'
        f'<meta property="og:site_name" content="{host_name(hi)}">'
        if variant > 0.3
        else ""
    )
    icon = '<link rel="icon" href="/favicon.ico">' if variant > 0.5 else ""
    # realistic Common-Crawl-ish body weight (~20-50 KB of markup)
    paras = "".join(
        f"<p>{_sentence(r, r.randint(12, 28))}</p>" for _ in range(r.randint(80, 240))
    )
    noise = "<script>var q=1;</script><style>p{color:red}</style>"
    if r.random() < 0.1:
        noise += f"<svg><text>{_sentence(r, 3)}</text></svg>"
    if r.random() < 0.1:
        noise += "<iframe>inner frame text</iframe>"
    multi = "café — résumé" if r.random() < 0.3 else ""
    body = (
        f"<!DOCTYPE html><html><head>{title}{meta}{icon}</head>"
        f"<body><h1>Page {pi}</h1>{anchors}{paras}{noise}{multi}</body></html>"
    ).encode()
    if r.random() < 0.05:  # invalid UTF-8 bytes inside html (sanitized pre-parse)
        body = body.replace(b"<h1>", b"<h1>\xf0\x28\x8c\x28 ", 1)
    return body


def golden_text(body: bytes, ctype: str) -> str:
    """The corpus' golden ``text`` column: reference extraction semantics
    ProcessText(HtmlText(parse(ToValidUTF8(html)))) (src/crawler.go:287-298)."""
    if ctype == "text/html":
        joined, _, _ = extract_html(to_valid_utf8(body))
        return process_text(joined)
    if ctype == "text/plain":
        from ..textops import go_json_str

        return go_json_str(body.replace(b"\n", b"").replace(b"\r", b"").strip(b" "))
    if ctype in (DOCX_CT, ODT_CT, RTF_CT, EPUB_CT):
        from ..htmlparse import extract_office_text

        return process_text(extract_office_text(body, ctype))
    return ""


def robots_body(seed: int, host_idx: int) -> str | None:
    """robots.txt body for a host, or None (host serves no robots => every
    URL of that host is denied, reference deny-on-error semantics).
    Deterministic mix: allow-all / path disallows / grawler-specific rules."""
    r = _rng(seed, "robots", host_idx)
    roll = r.random()
    if roll < 0.08:
        return None  # no robots.txt anywhere => robots fetch miss => deny
    if roll < 0.55:
        return "User-agent: *\nAllow: /\n"
    if roll < 0.8:
        k = r.randrange(7)
        return f"User-agent: *\nDisallow: /page/{k}\nDisallow: /*.pdf$\n"
    if roll < 0.9:
        k = r.randrange(5)
        return f"User-agent: grawler\nDisallow: /page/{k}*\n\nUser-agent: *\nDisallow: /\n"
    return "User-agent: *\nDisallow: /\n"  # deny-all host


def build_rows(seed: int, specs: list[dict], n_hosts: int) -> pa.Table:
    """Materialize corpus rows (incl. per-host /robots.txt rows passed in as
    specs with page_idx == -1)."""
    urls, ts, htmls, texts, langs, ctypes, statuses = [], [], [], [], [], [], []
    for spec in specs:
        if spec["page_idx"] == -1:  # robots.txt row
            body_s = robots_body(seed, spec["host_idx"])
            if body_s is None:
                continue
            body = body_s.encode()
            ctype, status, text = "text/plain", 200, ""
        else:
            body = page_body(seed, spec)
            ctype = spec["ctype"]
            status = spec["status"]
            text = golden_text(body, ctype)
        urls.append(spec["url"])
        ts.append(WARC_TS_BASE_US + (xxhash64(spec["url"]) % 600_000_000_000))
        htmls.append(body)
        texts.append(text)
        langs.append("en")
        ctypes.append(ctype)
        statuses.append(status)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content_type": pa.array(ctypes, pa.string()),
            "status_code": pa.array(statuses, pa.int16()),
        }
    )
    return t.sort_by("url")


def all_specs(
    seed: int, n_hosts: int, pages_per_host: int, office_mix: bool = False
) -> list[dict]:
    specs = []
    for hi in range(n_hosts):
        specs.append({"url": f"https://{host_name(hi)}/robots.txt", "host_idx": hi, "page_idx": -1})
        for pi in range(pages_per_host):
            specs.append(
                page_spec(seed, hi, pi, n_hosts, pages_per_host, office_mix=office_mix)
            )
    return specs


def generate_corpus(
    out_dir: str,
    n_hosts: int = 4,
    pages_per_host: int = 10,
    seed: int = 42,
    num_buckets: int = 8,
    use_ray: bool = False,
    office_mix: bool = False,
) -> str:
    """Write the bucketed corpus.  ``use_ray=True`` renders buckets as Ray
    tasks (bench scale); serial otherwise (unit scale).  ``office_mix``
    adds real DOCX/ODT/RTF bodies for the extended-doc-types crawl."""
    os.makedirs(out_dir, exist_ok=True)
    specs = all_specs(seed, n_hosts, pages_per_host, office_mix=office_mix)
    buckets: dict[int, list[dict]] = {}
    for s in specs:
        buckets.setdefault(xxhash64(s["url"]) % num_buckets, []).append(s)

    def write_bucket(k: int, bucket_specs: list[dict]) -> None:
        t = build_rows(seed, bucket_specs, n_hosts)
        d = os.path.join(out_dir, f"bucket={k}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "part.parquet"), row_group_size=512)

    if use_ray:
        import ray

        @ray.remote
        def _w(k, bs):
            write_bucket(k, bs)

        ray.get([_w.remote(k, bs) for k, bs in buckets.items()])
    else:
        for k, bs in buckets.items():
            write_bucket(k, bs)
    return out_dir


def seed_urls(n_hosts: int, n_seeds: int = 3) -> list[str]:
    """Ordered seed list (order defines crawl-order conformance,
    src/crawler.go:61-93): page 0 of the first n_seeds hosts."""
    return [page_url(hi, 0) for hi in range(min(n_seeds, n_hosts))]


def generate_robots_cache(out_path: str, seed: int, n_hosts: int, now_us: int, stale_frac: float = 0.3) -> str:
    """robots.parquet cache table (host, robots, ts) — FIXTURES.md §3.
    A deterministic subset of hosts is pre-cached; some entries stale (older
    than the 45-day TTL) to exercise the re-fetch path (src/crawler.go:230)."""
    hosts, bodies, ts = [], [], []
    for hi in range(n_hosts):
        r = _rng(seed, "robotscache", hi)
        if r.random() < 0.5:
            continue  # not cached
        body = robots_body(seed, hi)
        if body is None:
            continue
        hosts.append(host_name(hi))
        bodies.append(body)
        if r.random() < stale_frac:
            ts.append(now_us - 60 * 86_400_000_000)  # 60 days old => stale
        else:
            ts.append(now_us - 86_400_000_000)  # 1 day old => fresh
    t = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "robots": pa.array(bodies, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(t, out_path)
    return out_path


def load_seed_list(path: str) -> list[str]:
    """jsonData.LoadSeedList equivalent (src/jsonData/jsonData.go:15-40):
    JSON file with key "seed_list"."""
    import json

    with open(path) as f:
        return json.load(f)["seed_list"]
