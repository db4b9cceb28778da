"""curate_corpus (the CCNet/DSIR curation composition): full serial-oracle
equality on sf0.001 — langid kernel run serially, Counter-based LM score,
DuckDB NTILE tiles, the test_batch6 serial DSIR, pandas summary."""

import re
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"
WORD = re.compile(r"\b\w+\b")


def _serial_curate(df, target_texts, n_tiles=3, keep_tiles=(1, 2), buckets=4096):
    """Serial recomputation of the whole chain from its pinned pieces."""
    from grawler_ray.functions.textstats import langid_batch

    # 1. langid — the pure kernel applied once, serially
    lt = langid_batch(
        pa.table({"doc_id": pa.array(df.doc_id, pa.int64()),
                  "text": pa.array(df.text, pa.string())})
    )
    lang = dict(zip(lt.column("doc_id").to_pylist(),
                    lt.column("pred_lang").to_pylist()))

    # 2. LM score: sum over bigram occurrences of the global bigram count
    doc_bgs = {}
    for d, t in zip(df.doc_id, df.text):
        w = WORD.findall((t or "").lower())
        doc_bgs[d] = [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
    glob = Counter(bg for bgs in doc_bgs.values() for bg in bgs)
    score = {d: sum(glob[bg] for bg in bgs) for d, bgs in doc_bgs.items()}

    meta = pd.DataFrame(
        {
            "doc_id": df.doc_id,
            "pred_lang": [lang[d] for d in df.doc_id],
            "score": [score.get(d, 0) for d in df.doc_id],
        }
    )
    tiles = duckdb.sql(
        f"""SELECT doc_id, pred_lang,
                   CAST(NTILE({n_tiles}) OVER (
                       PARTITION BY pred_lang ORDER BY score DESC, doc_id
                   ) AS BIGINT) AS tile
            FROM meta"""
    ).df()
    kept = tiles[tiles.tile.isin(keep_tiles)]

    # 6. DSIR over survivors (raw fit = survivors only — curate passes
    # surv_text as raw_ds; target fit independent)
    surv = df[df.doc_id.isin(set(kept.doc_id))].sort_values("doc_id")
    w_all, n_all = _serial_dsir_two_sets(list(surv.text), list(target_texts),
                                         buckets)
    wdf = pd.DataFrame(
        {"doc_id": surv.doc_id.to_numpy(), "weight": w_all, "n_tokens": n_all}
    )
    full = wdf.merge(kept[["doc_id", "pred_lang", "tile"]], on="doc_id")
    summ = (
        full.groupby(["pred_lang", "tile"], sort=False)
        .agg(n_docs=("doc_id", "size"), sum_weight=("weight", "sum"),
             sum_tokens=("n_tokens", "sum"))
        .reset_index()
    )
    return full, summ


def _serial_dsir_two_sets(raw_texts, target_texts, buckets):
    """Serial DSIR where the raw fit is over raw_texts and the target fit
    over target_texts (distinct sets — unlike test_batch6's
    target-subset-of-raw case)."""
    from grawler_ray.urlops import xxhash64

    def feats(text):
        return [xxhash64(w) % buckets for w in WORD.findall((text or "").lower())]

    r_cnt = np.zeros(buckets, np.int64)
    t_cnt = np.zeros(buckets, np.int64)
    per_doc = []
    for text in raw_texts:
        f = feats(text)
        per_doc.append(f)
        for b in f:
            r_cnt[b] += 1
    for text in target_texts:
        for b in feats(text):
            t_cnt[b] += 1
    log_pt = np.log((t_cnt + 1.0) / (t_cnt.sum() + buckets))
    log_pr = np.log((r_cnt + 1.0) / (r_cnt.sum() + buckets))
    lam = np.floor(1_000_000 * (log_pt - log_pr)).astype(np.int64)
    weights = [int(sum(int(lam[b]) for b in f)) for f in per_doc]
    return weights, [len(f) for f in per_doc]


def test_curate_corpus_vs_serial_oracle(ray_session, tmp_path):
    import ray.data

    from grawler_ray.pipelines.preprocess import curate_corpus

    df = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    target_texts = list(df[df.lang == "en"].text)

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    target = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).filter(lambda r: r["lang"] == "en").select_columns(["doc_id", "text"])

    timings = {}
    out_dir = str(tmp_path / "curated")
    summary = (
        curate_corpus(docs, target, dsir_num_buckets=4096, out_dir=out_dir,
                      collect_timings=timings)
        .to_pandas()
        .sort_values(["pred_lang", "tile"])
        .reset_index(drop=True)
    )

    full_exp, summ_exp = _serial_curate(df, target_texts)
    summ_exp = summ_exp.sort_values(["pred_lang", "tile"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        summary[["pred_lang", "tile", "n_docs", "sum_weight", "sum_tokens"]],
        summ_exp[["pred_lang", "tile", "n_docs", "sum_weight", "sum_tokens"]],
        check_dtype=False,
    )

    # written per-doc table: exact per-doc equality with the serial chain
    import ray.data as rd

    written = (
        rd.read_parquet(out_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = full_exp.sort_values("doc_id").reset_index(drop=True)
    assert list(written.doc_id) == list(exp.doc_id)
    assert list(written.weight) == list(exp.weight)
    assert list(written.n_tokens) == list(exp.n_tokens)
    assert list(written.tile) == list(exp.tile)
    # partitioned by language; stage timings were collected
    import os

    assert any(d.startswith("pred_lang=") for d in os.listdir(out_dir))
    assert set(timings) == {"langid_lm", "join_meta", "ntile", "dsir", "attach",
                            "summary"}


def test_curate_corpus_keeps_only_requested_tiles(ray_session):
    import ray.data

    from grawler_ray.pipelines.preprocess import curate_corpus

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    summary = curate_corpus(
        docs, docs.limit(20), dsir_num_buckets=256, keep_tiles=(1,)
    ).to_pandas()
    assert set(summary.tile) == {1}
    # head tile only: strictly fewer docs than the corpus
    assert 0 < summary.n_docs.sum() < 500
