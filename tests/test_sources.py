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
