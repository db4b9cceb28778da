"""The `python -m grawler_ray` job-submit surface (grawler_ray/cli.py):
gen-corpus -> crawl -> report -> prep -> compact chained on a tiny corpus.
Under the session Ray fixture the CLI must reuse (and not shut down) the
existing session — the `ray job submit` contract."""

import json
import os

import pytest

from grawler_ray.cli import main


def _run(capsys, argv) -> dict:
    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("cli") / "corpus"
    out = main(["gen-corpus", "--out", str(d), "--hosts", "4", "--pages", "10", "--buckets", "8"])
    assert out == 0
    return str(d)


def test_cli_crawl_report_prep_compact(corpus, tmp_path, capsys, ray_session):
    import ray

    out_dir = str(tmp_path / "crawl")
    stats = _run(
        capsys,
        [
            "crawl", "--corpus", corpus, "--out", out_dir,
            "--auto-seeds", "2", "--fetch-buckets", "8",
            "--max-rounds", "4", "--seen-shards", "2",
        ],
    )
    assert ray.is_initialized()  # CLI must not tear down the session fixture
    assert stats["fetched"] > 0 and stats["rounds"] >= 1

    rep = _run(capsys, ["report", "--out", out_dir])
    assert rep["complete_rounds"] == rep["num_rounds"] >= 1
    assert rep["parsed_rows_total"] > 0
    assert rep["rounds"][0]["partitions"] >= 1  # lineage present

    prep_out = str(tmp_path / "prep")
    prep = _run(
        capsys,
        ["prep", "--docs", out_dir, "--out", prep_out, "--threshold", "0.9"],
    )
    assert os.path.isdir(os.path.join(prep_out, "split=train"))
    assert prep["summary"] and "stage_seconds" in prep

    dest = str(tmp_path / "compacted")
    comp = _run(capsys, ["compact", "--runs", out_dir, "--dest", dest, "--buckets", "4"])
    assert comp["rows"] > 0
    assert os.path.isdir(dest)


def test_cli_crawl_resume(corpus, tmp_path, capsys, ray_session):
    out_dir = str(tmp_path / "crawl_r")
    args = [
        "crawl", "--corpus", corpus, "--out", out_dir,
        "--auto-seeds", "2", "--fetch-buckets", "8", "--seen-shards", "2",
    ]
    full = _run(capsys, args + ["--max-rounds", "4"])
    assert full["fetched"] > 0
    # resume over a finished dir: nothing left to do, stats still coherent
    again = _run(capsys, args + ["--max-rounds", "4", "--resume"])
    assert again["rounds"] >= 1


def test_cli_seed_list_and_errors(corpus, tmp_path, capsys, ray_session):
    sl = tmp_path / "seeds.json"
    from grawler_ray.sources.corpus import seed_urls

    sl.write_text(json.dumps({"seed_list": seed_urls(4, 1)}))
    out_dir = str(tmp_path / "crawl_s")
    stats = _run(
        capsys,
        [
            "crawl", "--corpus", corpus, "--out", out_dir,
            "--seed-list", str(sl), "--fetch-buckets", "8",
            "--max-rounds", "2", "--seen-shards", "2", "--no-trace",
        ],
    )
    assert stats["fetched"] > 0
    with pytest.raises(SystemExit):
        main(["crawl", "--corpus", corpus, "--out", out_dir + "x", "--fetch-buckets", "8"])


def test_cli_export_jsonl_and_csv(tmp_path, capsys, ray_session):
    """export round-trip: parquet -> jsonl/csv shards, content-equal via
    DuckDB readback (the differential-oracle trick of jsonl_ingest)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ['plain', 'with "quotes"', 'multi\nline'],
            "score": [1.5, -2.0, 0.0],
        }
    )
    pq.write_table(t, src / "part.parquet")

    outj = str(tmp_path / "jsonl")
    res = _run(capsys, ["export", "--parquet", str(src), "--out", outj])
    assert res["format"] == "jsonl" and res["shards"] >= 1
    back = duckdb.sql(
        f"SELECT doc_id, text, score FROM read_json_auto('{outj}/*') ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(back, t.to_pandas(), check_dtype=False)

    outc = str(tmp_path / "csv")
    res = _run(
        capsys,
        ["export", "--parquet", str(src), "--out", outc, "--format", "csv",
         "--columns", "doc_id", "score"],
    )
    assert res["shards"] >= 1
    back = duckdb.sql(
        f"SELECT * FROM read_csv_auto('{outc}/*') ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(
        back, t.select(["doc_id", "score"]).to_pandas(), check_dtype=False
    )


def test_cli_plan_recrawl(corpus, tmp_path, capsys, ray_session):
    """Two crawl runs over the SAME corpus (identical payloads) -> every
    URL has n_changes == 0, per-host budget still apportions to the full
    amount; output parquet layout written."""
    import pyarrow.parquet as pq

    r1 = str(tmp_path / "run1")
    r2 = str(tmp_path / "run2")
    for out_dir in (r1, r2):
        _run(
            capsys,
            [
                "crawl", "--corpus", corpus, "--out", out_dir,
                "--auto-seeds", "2", "--fetch-buckets", "8",
                "--max-rounds", "3", "--seen-shards", "2",
            ],
        )
    plan_out = str(tmp_path / "plan")
    plan = _run(
        capsys,
        ["plan", "--runs", r1, r2, "--out", plan_out, "--budget", "100"],
    )
    assert plan["allocated"] == 100 and plan["urls"] > 0 and plan["hosts"] >= 1
    urls = pq.read_table(os.path.join(plan_out, "urls")).to_pandas()
    assert (urls.n_changes == 0).all() and (urls.n_intervals == 1).all()
    assert (urls.change_ratio == 0.0).all()
    hosts = pq.read_table(os.path.join(plan_out, "hosts")).to_pandas()
    assert hosts.alloc.sum() == 100
    # identical-run weights: every host's weight == its url count
    assert (hosts.weight == urls.url.str.split("/").str[2].value_counts()
            .reindex(hosts.host).to_numpy()).all()


def test_cli_plan_robots_filter(corpus, tmp_path, capsys, ray_session):
    """--robots-cache drops denied and UNCACHED hosts (deny-on-error)
    before budgeting; the budget still fully apportions over survivors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    r1 = str(tmp_path / "r1")
    _run(
        capsys,
        ["crawl", "--corpus", corpus, "--out", r1, "--auto-seeds", "3",
         "--fetch-buckets", "8", "--max-rounds", "3", "--seen-shards", "2"],
    )
    # cache: site0 allow-all, site1 deny-all; site2+ uncached => denied
    rc = str(tmp_path / "robots.parquet")
    pq.write_table(
        pa.table(
            {
                "host": ["site0.test", "site1.test"],
                "robots": ["User-agent: *\nAllow: /\n",
                           "User-agent: *\nDisallow: /\n"],
                "ts": pa.array([0, 0], pa.timestamp("us")),
            }
        ),
        rc,
    )
    out = str(tmp_path / "plan")
    plan = _run(
        capsys,
        ["plan", "--runs", r1, "--out", out, "--budget", "40",
         "--robots-cache", rc],
    )
    urls = pq.read_table(os.path.join(out, "urls")).to_pandas()
    hosts = pq.read_table(os.path.join(out, "hosts")).to_pandas()
    assert set(hosts.host) == {"site0.test"}
    assert urls.url.str.contains("site0.test").all()
    assert plan["allocated"] == 40 and hosts.alloc.sum() == 40


def test_cli_plan_harvests_sitemaps(corpus, tmp_path, capsys, ray_session):
    """--sitemaps-out with --robots-cache: Sitemap directives (absolute
    AND relative) harvested from cached robots bodies into a parquet the
    next crawl can seed from."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    r1 = str(tmp_path / "r1")
    _run(
        capsys,
        ["crawl", "--corpus", corpus, "--out", r1, "--auto-seeds", "2",
         "--fetch-buckets", "8", "--max-rounds", "2", "--seen-shards", "2"],
    )
    rc = str(tmp_path / "robots.parquet")
    pq.write_table(
        pa.table(
            {
                "host": ["site0.test", "site1.test"],
                "robots": [
                    "User-agent: *\nAllow: /\n"
                    "Sitemap: https://site0.test/sm.xml\n"
                    "Sitemap: relative/sm2.xml\n",
                    "User-agent: *\nAllow: /\n",  # no directives
                ],
                "ts": pa.array([0, 0], pa.timestamp("us")),
            }
        ),
        rc,
    )
    out = str(tmp_path / "plan")
    sm_out = str(tmp_path / "sitemaps")
    plan = _run(
        capsys,
        ["plan", "--runs", r1, "--out", out, "--budget", "20",
         "--robots-cache", rc, "--sitemaps-out", sm_out],
    )
    sm = pq.read_table(sm_out).to_pandas().sort_values("sitemap_url")
    assert plan["sitemaps"] == 2
    assert sm.sitemap_url.tolist() == [
        "http://site0.test/relative/sm2.xml",  # origin-resolved
        "https://site0.test/sm.xml",
    ]
    assert (sm.host == "site0.test").all()


def test_cli_crawl_seed_sitemap(corpus, tmp_path, capsys, ray_session):
    """--seed-sitemap: urlset locs seed the frontier highest-priority
    first; the crawl result equals the same seeds passed via --seeds."""
    from grawler_ray.sources.sitemap import write_sitemap

    sm = str(tmp_path / "seeds.xml")
    write_sitemap(
        sm,
        [
            {"url": "https://site1.test/page/0", "priority": 0.2},
            {"url": "https://site0.test/page/0", "priority": 0.9},
        ],
    )
    out_a = str(tmp_path / "via_sitemap")
    a = _run(
        capsys,
        ["crawl", "--corpus", corpus, "--out", out_a, "--seed-sitemap", sm,
         "--fetch-buckets", "8", "--max-rounds", "3", "--seen-shards", "2"],
    )
    out_b = str(tmp_path / "via_seeds")
    b = _run(
        capsys,
        ["crawl", "--corpus", corpus, "--out", out_b,
         "--seeds", "https://site0.test/page/0", "https://site1.test/page/0",
         "--fetch-buckets", "8", "--max-rounds", "3", "--seen-shards", "2"],
    )
    assert a["fetched"] == b["fetched"] > 0
    assert a["rounds"] == b["rounds"]


def test_cli_recrawl_loop_and_sitemap_export(corpus, tmp_path, capsys, ray_session):
    """The full continuous-crawl loop on the CLI: crawl -> plan ->
    crawl --seed-parquet (recrawl executes the plan's URL list); plus
    export --format sitemap round-trips through our own reader."""
    import gzip as _gzip

    import pyarrow.parquet as pq

    from grawler_ray.sources.sitemap import parse_sitemap_bytes

    r1 = str(tmp_path / "r1")
    _run(
        capsys,
        ["crawl", "--corpus", corpus, "--out", r1, "--auto-seeds", "2",
         "--fetch-buckets", "8", "--max-rounds", "3", "--seen-shards", "2"],
    )
    plan_out = str(tmp_path / "plan")
    _run(capsys, ["plan", "--runs", r1, "--out", plan_out, "--budget", "10"])

    r2 = str(tmp_path / "r2")
    re_stats = _run(
        capsys,
        ["crawl", "--corpus", corpus, "--out", r2,
         "--seed-parquet", os.path.join(plan_out, "urls"),
         "--per-host-quota", "100",  # admit the whole list in one round
         "--fetch-buckets", "8", "--max-rounds", "1", "--seen-shards", "2"],
    )
    n_planned = pq.read_table(os.path.join(plan_out, "urls")).num_rows
    assert re_stats["fetched"] == n_planned > 0  # 1 round = exactly the list

    sm_out = str(tmp_path / "sitemaps")
    exp = _run(
        capsys,
        ["export", "--parquet", os.path.join(r1, "round=0000", "parsed"),
         "--format", "sitemap", "--out", sm_out],
    )
    assert exp["shards"] == 1
    idx = parse_sitemap_bytes(
        open(os.path.join(sm_out, "sitemapindex.xml"), "rb").read()
    )
    assert idx["kind"] == "sitemapindex" and len(idx["entries"]) == 1
    doc = parse_sitemap_bytes(
        open(os.path.join(sm_out, "sitemap-00000.xml.gz"), "rb").read()
    )
    assert doc["kind"] == "urlset" and len(doc["entries"]) == exp["urls"] > 0
    # the crawl's parsed table has no warc_ts column -> no lastmod
    assert all(e["lastmod"] is None for e in doc["entries"])
