"""End-to-end flagship chain bench (VERDICT r3 item 7): saturated crawl
-> prep_corpus (quality -> exact dedup -> minhash near-dup -> tokens/split)
-> pack_manifest over the train split — the pipeline the brief's target
user actually runs, exercised at bench scale because compositions expose
block-format/block-count bugs the pieces hide.

Prints ONE JSON line: per-phase wall seconds, per-stage prep timings/rows,
throughput, and the host-contention canary next to the numbers (CLAUDE.md
rule: no absolute timing without its canary).

    GRAWLER_BENCH_HOSTS=150 GRAWLER_BENCH_PAGES=6000 python tools/bench_chain.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> dict:
    import numpy as np
    import pyarrow as pa
    import ray

    from bench import NUM_CPUS, ensure_corpus, host_calibration, run_crawl_bench

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    calib_before = host_calibration()
    ensure_corpus()

    # phase 1: saturated recrawl (the steady-state round)
    crawl = run_crawl_bench(NUM_CPUS, saturated=True)
    out_dir = f"/tmp/grawler_bench_out_{NUM_CPUS}"

    # phase 2: crawl output -> (doc_id, text) -> prep_corpus
    from grawler_ray.pipelines.crawl import read_documents
    from grawler_ray.pipelines.preprocess import prep_corpus
    from grawler_ray.urlops import xxhash64_batch

    def to_docs(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        # 63-bit ids: the split hash (sampling._bucket1000) requires
        # non-negative doc ids
        ids = (xxhash64_batch(urls) >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": t.column("content"),
            }
        )

    prep_out = "/tmp/grawler_bench_prep"
    shutil.rmtree(prep_out, ignore_errors=True)
    t0 = time.monotonic()
    docs = read_documents(out_dir).map_batches(to_docs, batch_format="pyarrow")
    stage_times: dict = {}
    summary = prep_corpus(
        docs, out_dir=prep_out, collect_timings=stage_times
    ).to_pandas()
    prep_wall = time.monotonic() - t0

    # phase 3: pack_manifest over the train split
    from grawler_ray.functions.textstats import pack_manifest

    t0 = time.monotonic()
    train = ray.data.read_parquet(f"{prep_out}/split=train")
    n_manifest = pack_manifest(train, seq_len=256, num_shards=64).count()
    pack_wall = time.monotonic() - t0

    calib_after = host_calibration()
    n_docs = int(summary.loc[summary["stage"] == "input", "n_docs"].iloc[0])
    total = crawl["wall_sec"] + prep_wall + pack_wall
    result = {
        "metric": "crawl -> prep_corpus -> pack_manifest end-to-end (sec)",
        "value": round(total, 3),
        "unit": "sec",
        "num_cpus": NUM_CPUS,
        "phases": {
            "crawl_sec": round(crawl["wall_sec"], 3),
            "prep_sec": round(prep_wall, 3),
            "pack_sec": round(pack_wall, 3),
        },
        "prep_stage_sec": stage_times,
        "crawl_urls_per_sec": round(crawl["urls_per_sec"], 2),
        "prep_docs_per_sec": round(n_docs / prep_wall, 2) if prep_wall else 0.0,
        "stage_rows": {
            str(r["stage"]): int(r["n_docs"]) for _, r in summary.iterrows()
        },
        "manifest_rows": int(n_manifest),
        "host_calib_before": calib_before,
        "host_calib_after": calib_after,
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    print(json.dumps(main()))
