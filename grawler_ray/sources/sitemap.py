"""XML sitemap ingest (sitemaps.org protocol) — the crawl seed-discovery
source format: ``<urlset>`` page entries (loc, lastmod, changefreq,
priority) and ``<sitemapindex>`` child-sitemap listings, plain or gzipped
(the protocol's .xml.gz convention).

The reference crawls HTML-discovered links only (src/crawler.go); sitemaps
are how a production crawler seeds and re-crawls large sites, so this is a
first-class source here.  Shape: ``read_binary_files`` -> one stdlib
ElementTree parse per file inside ``map_batches`` — stateless, streaming,
no shuffle; sitemap files are protocol-capped at 50k URLs / 50 MB each, so
one file per task is the natural unit.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

import pyarrow as pa


def _local(tag: str) -> str:
    """Strip any XML namespace — real-world sitemaps mix namespaced,
    default-namespaced and bare tags."""
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_bytes(data: bytes) -> dict:
    """Parse one sitemap document.  Returns {"kind": "urlset"|"sitemapindex",
    "entries": [...]}: urlset entries are dicts with url (required loc),
    lastmod / changefreq (None when absent) and priority (float, None when
    absent); sitemapindex entries are dicts with url (the child sitemap
    loc) and lastmod.  Entries without a <loc> are dropped per the
    protocol.  Gzipped payloads are detected by magic bytes."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    root = ET.fromstring(data)
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document: root <{kind}>")
    entries = []
    for child in root:
        fields: dict[str, str] = {}
        for f in child:
            fields[_local(f.tag)] = (f.text or "").strip()
        loc = fields.get("loc")
        if not loc:
            continue
        if kind == "urlset":
            pr = fields.get("priority")
            entries.append(
                {
                    "url": loc,
                    "lastmod": fields.get("lastmod"),
                    "changefreq": fields.get("changefreq"),
                    "priority": float(pr) if pr not in (None, "") else None,
                }
            )
        else:
            entries.append({"url": loc, "lastmod": fields.get("lastmod")})
    return {"kind": kind, "entries": entries}


def read_sitemaps(paths, concurrency: int | None = None):
    """Sitemap file paths (urlset documents, .xml or .xml.gz) -> Dataset
    (url, lastmod, changefreq, priority:float64).  A sitemapindex file
    raises — resolving an index means FETCHING its children, which is the
    crawl pipeline's job (feed the child locs back as seeds), not the
    reader's."""
    import ray.data

    def parse(t: pa.Table) -> pa.Table:
        rows = []
        for data in t.column("bytes").to_pylist():
            doc = parse_sitemap_bytes(data)
            if doc["kind"] != "urlset":
                raise ValueError(
                    "read_sitemaps got a <sitemapindex>; resolve its child "
                    "locs via the crawl frontier instead"
                )
            rows.extend(doc["entries"])
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "lastmod": pa.array([r["lastmod"] for r in rows], pa.string()),
                "changefreq": pa.array(
                    [r["changefreq"] for r in rows], pa.string()
                ),
                "priority": pa.array(
                    [r["priority"] for r in rows], pa.float64()
                ),
            }
        )

    ds = ray.data.read_binary_files(paths)
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1, **kw)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
    )


def write_sitemap(
    path: str, entries: list[dict], kind: str = "urlset", gzipped: bool = False
) -> None:
    """Test/fixture writer: real spec XML (default namespace, escaped locs).
    urlset entries: url (+ optional lastmod/changefreq/priority); index
    entries: url (+ optional lastmod)."""
    tag = "url" if kind == "urlset" else "sitemap"
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        f'<{kind} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n',
    ]
    for e in entries:
        parts.append(f"  <{tag}>\n    <loc>{_esc(e['url'])}</loc>\n")
        if e.get("lastmod") is not None:
            parts.append(f"    <lastmod>{e['lastmod']}</lastmod>\n")
        if kind == "urlset":
            if e.get("changefreq") is not None:
                parts.append(
                    f"    <changefreq>{e['changefreq']}</changefreq>\n"
                )
            if e.get("priority") is not None:
                parts.append(f"    <priority>{e['priority']}</priority>\n")
        parts.append(f"  </{tag}>\n")
    parts.append(f"</{kind}>\n")
    data = "".join(parts).encode("utf-8")
    if gzipped:
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)
