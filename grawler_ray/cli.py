"""Job-submittable command-line entry points.

The north rule runs the engine "via ray job submit on a fixed-size
multi-node Ray cluster"; this module is that surface:

    ray job submit --working-dir . -- python -m grawler_ray crawl \\
        --corpus /data/corpus --out /data/crawl --auto-seeds 3

Subcommands:
    gen-corpus   write the deterministic bucketed page corpus
    crawl        run the frontier crawl (resumable with --resume)
    prep         crawl output / parquet docs -> quality -> dedup -> splits
    export       parquet -> JSONL/CSV shard hand-off
    compact      merge + last-wins-compact several crawl runs
    plan         recrawl plan (per-URL change rates + per-host budget)
    report       print a finished crawl's manifest metrics as JSON

Ray-session ownership: inside a `ray job submit` entrypoint (or any
driver that already ran ray.init) the existing session is used as-is;
standalone invocation initializes a local session and shuts it down on
exit.  Library code never touches ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys


@contextlib.contextmanager
def _ray_session(num_cpus: int | None):
    import ray

    owns = not ray.is_initialized()
    if owns:
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
        # RAY_ADDRESS (set by `ray job submit` runtime) wins; else local
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        yield
    finally:
        if owns:
            ray.shutdown()


def _emit(obj: dict) -> None:
    print(json.dumps(obj, sort_keys=True, default=str))


# --- subcommands -----------------------------------------------------------


def _cmd_gen_corpus(a: argparse.Namespace) -> dict:
    from grawler_ray.sources.corpus import generate_corpus, generate_robots_cache

    generate_corpus(
        a.out,
        n_hosts=a.hosts,
        pages_per_host=a.pages,
        seed=a.seed,
        num_buckets=a.buckets,
        use_ray=a.hosts * a.pages >= 50_000,
        office_mix=a.office_mix,
    )
    out = {
        "out": a.out,
        "hosts": a.hosts,
        "pages_per_host": a.pages,
        "num_buckets": a.buckets,
    }
    if a.robots_cache:
        from grawler_ray.config import CrawlConfig

        out["robots_cache"] = generate_robots_cache(
            a.robots_cache, a.seed, a.hosts, CrawlConfig().now_us
        )
    return out


def _cmd_crawl(a: argparse.Namespace) -> dict:
    from grawler_ray.config import CrawlConfig
    from grawler_ray.pipelines.crawl import run_crawl
    from grawler_ray.sources.corpus import load_seed_list, seed_urls

    if a.seed_list:
        seeds = load_seed_list(a.seed_list)
    elif a.seed_parquet:
        # recrawl execution: feed a plan's out/urls (or any parquet with a
        # url column) back in as the round-0 frontier — crawl -> plan ->
        # crawl closes the continuous-crawl loop.  Most-stale first when
        # the plan's stale_runs column is present, else url order.
        import pyarrow.dataset as pads

        tbl = pads.dataset(a.seed_parquet).to_table()
        cols = set(tbl.schema.names)
        df = tbl.select(
            ["url"] + (["stale_runs"] if "stale_runs" in cols else [])
        ).to_pandas()
        if "stale_runs" in cols:
            df = df.sort_values(["stale_runs", "url"], ascending=[False, True])
        else:
            df = df.sort_values("url")
        seeds = df.url.tolist()
    elif a.seed_sitemap:
        # sitemap-driven seeding: urlset locs become the round-0 frontier,
        # highest-priority first (the sitemap protocol's hint ordering);
        # ties broken by url for determinism
        from grawler_ray.sources.sitemap import read_sitemaps

        sm = read_sitemaps(a.seed_sitemap).to_pandas()
        sm["priority"] = sm["priority"].fillna(0.5)  # protocol default
        seeds = sm.sort_values(
            ["priority", "url"], ascending=[False, True]
        ).url.tolist()
    elif a.seeds:
        seeds = a.seeds
    elif a.auto_seeds:
        seeds = seed_urls(10**9, a.auto_seeds)  # first K synthetic hosts
    else:
        raise SystemExit(
            "crawl: need --seeds, --seed-list, --seed-sitemap, "
            "--seed-parquet or --auto-seeds"
        )

    cfg = CrawlConfig(
        out_dir=a.out,
        per_host_quota=a.per_host_quota,
        max_rounds=a.max_rounds,
        max_urls=a.max_urls,
        frontier_order=a.frontier_order,
        frontier_cap=a.frontier_cap,
        seen_mode=a.seen_mode,
        seen_shards=a.seen_shards,
        canonicalize_seen=a.canonicalize,
        fetch_mode=a.fetch_mode,
        num_fetch_buckets=a.fetch_buckets,
        write_trace=not a.no_trace,
        respect_nofollow=a.respect_nofollow,
        extended_doc_types=a.extended_types,
    )
    return run_crawl(
        a.corpus,
        seeds,
        cfg,
        robots_cache_path=a.robots_cache,
        resume=a.resume,
    )


def _cmd_prep(a: argparse.Namespace) -> dict:
    import numpy as np
    import pyarrow as pa
    import ray.data

    from grawler_ray.pipelines.preprocess import prep_corpus
    from grawler_ray.urlops import xxhash64_batch

    if a.docs:  # a finished crawl out_dir: (url, content) -> (doc_id, text)
        from grawler_ray.pipelines.crawl import read_documents

        def to_docs(t: pa.Table) -> pa.Table:
            # 63-bit ids: the split hash requires non-negative doc ids
            ids = (
                xxhash64_batch(t.column("url").to_pylist()) >> np.uint64(1)
            ).astype(np.int64)
            return pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "text": t.column("content")}
            )

        docs = read_documents(a.docs).map_batches(to_docs, batch_format="pyarrow")
    elif a.parquet:  # any parquet table already shaped (doc_id, text)
        docs = ray.data.read_parquet(a.parquet, columns=["doc_id", "text"])
    else:
        raise SystemExit("prep: need --docs (crawl out_dir) or --parquet")

    timings: dict = {}
    summary = prep_corpus(
        docs,
        out_dir=a.out,
        minhash_threshold=a.threshold,
        holdout_permille=a.holdout_permille,
        collect_timings=timings,
        checkpoint_dir=a.checkpoint_dir,
    ).to_pandas()
    return {
        "out": a.out,
        "stage_seconds": timings,
        "summary": summary.to_dict(orient="records"),
    }


def _cmd_export(a: argparse.Namespace) -> dict:
    """Parquet -> JSONL/CSV shard export (the hand-off format most
    training pipelines ingest): a streaming per-block write — one shard
    file per block, no driver materialization, resumable by re-running
    into a fresh dir."""
    import os

    import ray.data

    if a.format == "sitemap":
        # publish a URL inventory as spec sitemaps: <=50k locs per urlset
        # file (the protocol cap) + one sitemapindex; input needs a url
        # column, lastmod taken from warc_ts when present
        import math

        from grawler_ray.sources.sitemap import write_sitemap

        cols = ["url"]
        import pyarrow.dataset as pads

        dset = pads.dataset(a.parquet)
        if "warc_ts" in set(dset.schema.names):
            cols.append("warc_ts")
        n_rows = dset.count_rows()
        if n_rows > 5_000_000:
            raise SystemExit(
                f"export sitemap: {n_rows} urls exceed the driver cap; "
                "write per-block urlset shards (export_warc's "
                "shard-per-block pattern) and index them instead"
            )
        df = dset.to_table(columns=cols).to_pandas()
        df = df.sort_values("url").reset_index(drop=True)
        os.makedirs(a.out, exist_ok=True)
        cap = 50_000
        n_shards = max(1, math.ceil(len(df) / cap))
        names = []
        for i in range(n_shards):
            part = df.iloc[i * cap : (i + 1) * cap]
            entries = [
                {
                    "url": r.url,
                    **(
                        {"lastmod": r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ")}
                        if "warc_ts" in part.columns
                        else {}
                    ),
                }
                for r in part.itertuples()
            ]
            name = f"sitemap-{i:05d}.xml.gz"
            write_sitemap(os.path.join(a.out, name), entries, gzipped=True)
            names.append(name)
        write_sitemap(
            os.path.join(a.out, "sitemapindex.xml"),
            [{"url": n} for n in names],
            kind="sitemapindex",
        )
        return {"out": a.out, "format": "sitemap", "shards": n_shards,
                "urls": len(df)}
    if a.format == "warc":
        from grawler_ray.sources.warc import export_warc

        pages = ray.data.read_parquet(
            a.parquet,
            columns=["url", "warc_ts", "html", "status_code", "content_type"],
        )
        manifest = export_warc(pages, a.out).to_pandas()
        return {
            "out": a.out,
            "format": "warc",
            "shards": len(manifest),
            "records": int(manifest["n_records"].sum()),
        }
    ds = ray.data.read_parquet(a.parquet, columns=a.columns or None)
    if a.format == "jsonl":
        ds.write_json(a.out)
    elif a.format == "csv":
        ds.write_csv(a.out)
    else:
        raise SystemExit(f"export: unknown format {a.format}")
    shards = [f for f in os.listdir(a.out) if not f.startswith(".")]
    return {"out": a.out, "format": a.format, "shards": len(shards)}


def _cmd_plan(a: argparse.Namespace) -> dict:
    """Recrawl planning over a RUN SEQUENCE: per-URL change statistics
    (Cho & Garcia-Molina X/n over the runs' document payloads) and a
    per-host Hamilton apportionment of --budget fetches, weighted by
    each host's change mass (+1 smoothing).  Writes out/urls (url,
    n_intervals, n_changes, change_ratio, last_change_run, stale_runs)
    and out/hosts (host, weight, alloc) as parquet."""
    import pyarrow as pa

    from grawler_ray.functions.dedup import change_rate
    from grawler_ray.functions.urlstats import apportion_budget
    from grawler_ray.pipelines.crawl import read_documents
    from grawler_ray.urlops import UrlError, extract_url_components

    snaps = None
    for run_idx, run_dir in enumerate(a.runs):

        def tag_run(t: pa.Table, _r=run_idx) -> pa.Table:
            return pa.table(
                {
                    "url": t.column("url"),
                    "run": pa.array([_r] * t.num_rows, pa.int64()),
                    "content": t.column("content"),
                }
            )

        part = read_documents(run_dir).map_batches(tag_run, batch_format="pyarrow")
        snaps = part if snaps is None else snaps.union(part)

    cr = change_rate(
        snaps, key_col="url", payload_col="content", run_col="run"
    ).materialize()

    if a.robots_cache:
        # politeness-correct plans: drop URLs whose host's robots deny them
        # (or whose host has no cached robots — the reference's
        # deny-on-error rule, src/crawler.go:230 semantics)
        import pyarrow.parquet as pq
        import ray

        rb = pq.read_table(a.robots_cache, columns=["host", "robots"])
        if rb.num_rows > 1_000_000:
            raise SystemExit(
                "plan: robots cache too large to broadcast "
                f"({rb.num_rows} hosts); shard it per host-hash and "
                "repartition-join instead (joins.repartition_join)"
            )
        rb_ref = ray.put(
            dict(zip(rb.column("host").to_pylist(), rb.column("robots").to_pylist()))
        )
        ua = a.user_agent

        def robots_filter(t):
            import pyarrow as _pa
            import ray as _ray

            from grawler_ray.robots import agent_allowed
            from grawler_ray.urlops import UrlError, extract_url_components

            m = _ray.get(rb_ref)
            keep = []
            for u in t.column("url").to_pylist():
                try:
                    _s, h, _p = extract_url_components(u)
                except UrlError:
                    keep.append(False)
                    continue
                body = m.get(h)
                keep.append(body is not None and agent_allowed(body, ua, u))
            return t.filter(_pa.array(keep, _pa.bool_()))

        cr = cr.map_batches(robots_filter, batch_format="pyarrow").materialize()

    cr.write_parquet(os.path.join(a.out, "urls"))

    n_sitemaps = None
    if a.sitemaps_out and a.robots_cache:
        # harvest Sitemap: directives from the robots cache — the standard
        # discovery channel feeding the next crawl's --seed-sitemap.
        # Distributed map over the cache (millions of hosts at web scale);
        # relative directives resolve against each host's http origin.
        import ray.data

        from grawler_ray.robots import sitemap_urls

        def harvest(t: pa.Table) -> pa.Table:
            hosts_out, urls_out = [], []
            for h, body in zip(
                t.column("host").to_pylist(), t.column("robots").to_pylist()
            ):
                for sm in sitemap_urls(body or "", f"http://{h}/robots.txt"):
                    hosts_out.append(h)
                    urls_out.append(sm)
            return pa.table(
                {
                    "host": pa.array(hosts_out, pa.string()),
                    "sitemap_url": pa.array(urls_out, pa.string()),
                }
            )

        sm_ds = (
            ray.data.read_parquet(a.robots_cache, columns=["host", "robots"])
            .map_batches(harvest, batch_format="pyarrow")
            .materialize()
        )
        sm_ds.write_parquet(a.sitemaps_out)
        n_sitemaps = sm_ds.count()

    def to_host(t: pa.Table) -> pa.Table:
        hosts, w = [], []
        ch = t.column("n_changes").to_numpy(zero_copy_only=False)
        for u, c in zip(t.column("url").to_pylist(), ch):
            try:
                _s, host, _p = extract_url_components(u)
            except UrlError:
                host = ""
            hosts.append(host)
            w.append(int(c) + 1)
        return pa.table(
            {"host": pa.array(hosts, pa.string()), "w": pa.array(w, pa.int64())}
        )

    hosts = apportion_budget(
        cr.map_batches(to_host, batch_format="pyarrow"),
        key_col="host",
        budget=a.budget,
        weight_col="w",
    ).materialize()
    hosts.write_parquet(os.path.join(a.out, "hosts"))
    hp = hosts.to_pandas()
    return {
        "out": a.out,
        "runs": len(a.runs),
        "urls": cr.count(),
        "hosts": len(hp),
        "budget": a.budget,
        "allocated": int(hp["alloc"].sum()),
        "sitemaps": n_sitemaps,
        "top_hosts": hp.sort_values(
            ["alloc", "host"], ascending=[False, True]
        ).head(5).to_dict(orient="records"),
    }


def _cmd_compact(a: argparse.Namespace) -> dict:
    from grawler_ray.pipelines.crawl import compact_runs

    return compact_runs(a.runs, a.dest, num_buckets=a.buckets)


def _cmd_report(a: argparse.Namespace) -> dict:
    from grawler_ray.pipelines.crawl import crawl_report

    return crawl_report(a.out)


# --- parser ----------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="grawler_ray", description=__doc__)
    p.add_argument(
        "--num-cpus",
        type=int,
        default=None,
        help="num_cpus for a standalone local ray.init (ignored when a "
        "session already exists, e.g. under `ray job submit`)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-corpus", help="write the deterministic page corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--hosts", type=int, default=4)
    g.add_argument("--pages", type=int, default=10)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--buckets", type=int, default=32)
    g.add_argument("--robots-cache", default=None, help="also write a robots cache parquet here")
    g.add_argument("--office-mix", action="store_true",
                   help="include real DOCX/ODT/RTF bodies in the corpus")
    g.set_defaults(fn=_cmd_gen_corpus, needs_ray=True)

    c = sub.add_parser("crawl", help="run the frontier crawl")
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--seeds", nargs="*", default=None)
    c.add_argument("--seed-list", default=None, help='JSON file with "seed_list"')
    c.add_argument("--seed-sitemap", nargs="+", default=None,
                   help="urlset sitemap file(s) (.xml/.xml.gz); locs seed "
                        "the frontier, highest priority first")
    c.add_argument("--seed-parquet", default=None,
                   help="parquet dir/file with a url column (e.g. a plan's "
                        "out/urls); most-stale first when stale_runs exists")
    c.add_argument("--auto-seeds", type=int, default=None, help="seed page 0 of the first K synthetic hosts")
    c.add_argument("--per-host-quota", type=int, default=4)
    c.add_argument("--max-rounds", type=int, default=50)
    c.add_argument("--max-urls", type=int, default=None)
    c.add_argument(
        "--frontier-order", choices=("fifo", "priority", "opic"), default="fifo"
    )
    c.add_argument("--frontier-cap", type=int, default=None)
    c.add_argument("--seen-mode", choices=("exact", "cuckoo"), default="exact")
    c.add_argument("--seen-shards", type=int, default=8)
    c.add_argument("--canonicalize", action="store_true")
    c.add_argument("--fetch-mode", choices=("corpus", "http"), default="corpus")
    c.add_argument("--fetch-buckets", type=int, default=32, help="must match the corpus bucket layout")
    c.add_argument("--robots-cache", default=None)
    c.add_argument("--no-trace", action="store_true")
    c.add_argument("--respect-nofollow", action="store_true",
                   help="honor meta-robots noindex/nofollow and rel=nofollow")
    c.add_argument("--extended-types", action="store_true",
                   help="also ingest pdf/docx/odt/rtf documents (text "
                        "extracted inline, no link channel)")
    c.add_argument("--resume", action="store_true")
    c.set_defaults(fn=_cmd_crawl, needs_ray=True)

    r = sub.add_parser("prep", help="docs -> quality/dedup/tokenize/split")
    r.add_argument("--docs", default=None, help="a finished crawl out_dir")
    r.add_argument("--parquet", default=None, help="parquet dir with (doc_id, text)")
    r.add_argument("--out", required=True)
    r.add_argument("--threshold", type=float, default=0.5)
    r.add_argument("--holdout-permille", type=int, default=100)
    r.add_argument("--checkpoint-dir", default=None)
    r.set_defaults(fn=_cmd_prep, needs_ray=True)

    e = sub.add_parser("export", help="parquet -> jsonl/csv shards")
    e.add_argument("--parquet", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--format", choices=["jsonl", "csv", "warc", "sitemap"],
                   default="jsonl")
    e.add_argument("--columns", nargs="*", default=None)
    e.set_defaults(fn=_cmd_export, needs_ray=True)

    k = sub.add_parser("compact", help="merge several crawl runs, last-wins")
    k.add_argument("--runs", nargs="+", required=True)
    k.add_argument("--dest", required=True)
    k.add_argument("--buckets", type=int, default=64)
    k.set_defaults(fn=_cmd_compact, needs_ray=True)

    n = sub.add_parser("plan", help="recrawl plan from a crawl run sequence")
    n.add_argument("--runs", nargs="+", required=True,
                   help="crawl out_dirs in snapshot order (oldest first)")
    n.add_argument("--out", required=True)
    n.add_argument("--budget", type=int, default=10_000)
    n.add_argument("--robots-cache", default=None,
                   help="robots parquet (host, robots, ts); when given, "
                        "denied/uncached-host URLs are dropped before "
                        "budgeting (deny-on-error semantics)")
    n.add_argument("--user-agent", default="grawler")
    n.add_argument("--sitemaps-out", default=None,
                   help="with --robots-cache: harvest Sitemap: directives "
                        "from the cached robots bodies into this parquet "
                        "(host, sitemap_url) for next-crawl seeding")
    n.set_defaults(fn=_cmd_plan, needs_ray=True)

    t = sub.add_parser("report", help="print a crawl's manifest metrics")
    t.add_argument("--out", required=True)
    t.set_defaults(fn=_cmd_report, needs_ray=False)

    return p


def main(argv: list[str] | None = None) -> int:
    a = build_parser().parse_args(argv)
    if a.needs_ray:
        with _ray_session(a.num_cpus):
            _emit(a.fn(a))
    else:
        _emit(a.fn(a))
    return 0


if __name__ == "__main__":
    sys.exit(main())
