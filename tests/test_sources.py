"""Source loaders + corpus generator invariants (no Ray)."""

import json

from grawler_ray.sources.corpus import (
    all_specs,
    golden_text,
    load_seed_list,
    page_body,
    page_spec,
    robots_body,
    seed_urls,
)


def test_load_seed_list(tmp_path):
    # jsonData.LoadSeedList (src/jsonData/jsonData.go:15-40): key "seed_list"
    p = tmp_path / "seed_list.json"
    p.write_text(json.dumps({"seed_list": ["https://a.test/", "https://b.test/"]}))
    assert load_seed_list(str(p)) == ["https://a.test/", "https://b.test/"]


def test_seed_urls_ordered():
    assert seed_urls(3, 2) == ["https://site0.test/page/0", "https://site1.test/page/0"]


def test_page_spec_deterministic():
    a = page_spec(42, 1, 2, 4, 10)
    b = page_spec(42, 1, 2, 4, 10)
    assert a == b
    assert page_body(42, a) == page_body(42, b)


def test_golden_text_matches_reference_semantics():
    spec = page_spec(42, 0, 0, 4, 10)
    body = page_body(42, spec)
    text = golden_text(body, spec["ctype"])
    if spec["ctype"] in ("text/html", "text/plain"):
        assert "\n" not in text and "\r" not in text


def test_robots_body_mix():
    bodies = [robots_body(42, i) for i in range(50)]
    assert any(b is None for b in bodies)  # some hosts serve no robots
    assert any(b and "Disallow: /" in b for b in bodies)
    assert any(b and "Allow: /" in b for b in bodies)
    assert bodies == [robots_body(42, i) for i in range(50)]  # deterministic


def test_all_specs_includes_robots_rows():
    specs = all_specs(7, 2, 3)
    robots_rows = [s for s in specs if s["page_idx"] == -1]
    page_rows = [s for s in specs if s["page_idx"] >= 0]
    assert len(robots_rows) == 2
    assert len(page_rows) == 6
    assert all(s["url"].endswith("/robots.txt") for s in robots_rows)


def test_csv_roundtrip_quoting(ray_session, tmp_path):
    """ray.data.read_csv with newlines_in_values survives embedded
    commas, quotes, and newlines written QUOTE_ALL (the csv_ingest
    fixture's format)."""
    import csv

    import pyarrow.csv as pacsv
    import ray.data

    rows = [
        (1, 'plain'),
        (2, 'comma, inside'),
        (3, 'quote " inside'),
        (4, 'newline\ninside'),
        (5, 'both ",\n" mixed'),
    ]
    p = tmp_path / "t.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_ALL, lineterminator="\n")
        w.writerow(["doc_id", "text"])
        w.writerows(rows)
    got = (
        ray.data.read_csv(
            [str(p)],
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(got["text"]) == [r[1] for r in rows]


def test_sitemap_parse_namespaced_bare_and_gzip(tmp_path):
    import gzip as _gzip

    from grawler_ray.sources.sitemap import parse_sitemap_bytes, write_sitemap

    # writer output (default-namespaced) round-trips, escapes &, keeps NULLs
    p = tmp_path / "s.xml"
    write_sitemap(
        str(p),
        [
            {"url": "http://a.test/?x=1&y=2", "lastmod": "2024-01-02",
             "changefreq": "daily", "priority": 0.8},
            {"url": "http://a.test/b"},  # all optionals omitted
        ],
    )
    doc = parse_sitemap_bytes(p.read_bytes())
    assert doc["kind"] == "urlset"
    assert doc["entries"][0] == {
        "url": "http://a.test/?x=1&y=2", "lastmod": "2024-01-02",
        "changefreq": "daily", "priority": 0.8,
    }
    assert doc["entries"][1] == {
        "url": "http://a.test/b", "lastmod": None,
        "changefreq": None, "priority": None,
    }
    # bare (un-namespaced) tags, entry without <loc> dropped, empty priority
    bare = b"""<?xml version="1.0"?><urlset>
      <url><loc>http://b.test/</loc><priority></priority></url>
      <url><lastmod>2024-01-01</lastmod></url>
    </urlset>"""
    doc2 = parse_sitemap_bytes(bare)
    assert len(doc2["entries"]) == 1
    assert doc2["entries"][0]["priority"] is None
    # gzip magic detection
    doc3 = parse_sitemap_bytes(_gzip.compress(bare))
    assert doc3["entries"] == doc2["entries"]
    # non-sitemap root raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap_bytes(b"<html></html>")


def test_sitemap_index_parse_and_reader_refusal(tmp_path, ray_session):
    from grawler_ray.sources.sitemap import (
        parse_sitemap_bytes,
        read_sitemaps,
        write_sitemap,
    )

    idx = tmp_path / "index.xml"
    write_sitemap(
        str(idx),
        [{"url": "http://c.test/s1.xml", "lastmod": "2024-02-01"},
         {"url": "http://c.test/s2.xml"}],
        kind="sitemapindex",
    )
    doc = parse_sitemap_bytes(idx.read_bytes())
    assert doc["kind"] == "sitemapindex"
    assert [e["url"] for e in doc["entries"]] == [
        "http://c.test/s1.xml", "http://c.test/s2.xml"
    ]
    import pytest as _pytest

    with _pytest.raises(Exception, match="sitemapindex"):
        read_sitemaps([str(idx)]).to_pandas()


def test_sitemap_reader_dataset(tmp_path, ray_session):
    from grawler_ray.sources.sitemap import read_sitemaps, write_sitemap

    paths = []
    for i in range(2):
        p = tmp_path / f"u{i}.xml"
        write_sitemap(
            str(p),
            [{"url": f"http://d.test/{i}/{j}", "priority": j / 10}
             for j in range(3)],
        )
        paths.append(str(p))
    df = read_sitemaps(paths).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 6
    assert df.url[0] == "http://d.test/0/0"
    assert df.priority.tolist() == [0.0, 0.1, 0.2, 0.0, 0.1, 0.2]
    assert df.lastmod.isna().all() and df.changefreq.isna().all()
