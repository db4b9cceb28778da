"""extended_doc_types crawl mode: the pipeline ingests
PDF/DOCX/ODT/RTF/EPUB documents through the same extractors the *_ingest
queries gate, with FULL trace/docs/words equality vs the serial oracle
(parse_page is shared, so the equality is structural, but the corpus
routing, documentAllowed gate and sink plumbing are what these tests
pin).  Default mode must keep dropping those types (reference parity)
over the SAME office-mix corpus."""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grawler_ray.config import CrawlConfig
from grawler_ray.htmlparse import extract_office_text, parse_page
from grawler_ray.oracle import corpus_table_to_dict, run_oracle
from grawler_ray.sources.corpus import (
    DOCX_CT,
    EPUB_CT,
    ODT_CT,
    RTF_CT,
    generate_corpus,
    generate_robots_cache,
    seed_urls,
)

N_HOSTS, PAGES, SEED = 4, 14, 97
CORPUS = "/tmp/gr_ext_corpus"
ROBOTS = "/tmp/gr_ext_corpus/robots_cache.parquet"


@pytest.fixture(scope="module")
def corpus_fixture():
    if not os.path.isdir(f"{CORPUS}/bucket=0"):
        generate_corpus(
            CORPUS, n_hosts=N_HOSTS, pages_per_host=PAGES, seed=SEED,
            num_buckets=8, office_mix=True,
        )
        generate_robots_cache(ROBOTS, SEED, N_HOSTS, CrawlConfig().now_us)
    full = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{CORPUS}/bucket=*/part.parquet"))]
    )
    rc = pq.read_table(ROBOTS)
    robots_cache = {
        h: (b, t)
        for h, b, t in zip(
            rc["host"].to_pylist(),
            rc["robots"].to_pylist(),
            rc["ts"].cast(pa.int64()).to_pylist(),
        )
    }
    return full, robots_cache


def _run_both(out_dir, corpus_fixture, **cfg_kw):
    from grawler_ray.pipelines.crawl import run_crawl

    full, robots_cache = corpus_fixture
    cfg = CrawlConfig(
        out_dir=out_dir, per_host_quota=3, max_rounds=8,
        num_fetch_buckets=8, seen_shards=4, **cfg_kw,
    )
    seeds = seed_urls(N_HOSTS, 3)
    shutil.rmtree(out_dir, ignore_errors=True)
    stats = run_crawl(CORPUS, seeds, cfg, robots_cache_path=ROBOTS)
    oracle = run_oracle(corpus_table_to_dict(full), seeds, cfg, robots_cache)
    return stats, oracle


def _assert_equal(out_dir, oracle):
    from grawler_ray.pipelines.crawl import read_documents, read_trace, read_words

    docs = read_documents(out_dir).to_pandas().sort_values("url").reset_index(drop=True)
    odocs = pd.DataFrame(oracle.documents).sort_values("url").reset_index(drop=True)
    assert len(docs) == len(odocs)
    for col in docs.columns:
        assert (docs[col].values == odocs[col].astype(docs[col].dtype).values).all(), col
    words = read_words(out_dir).to_pandas().sort_values(["parent_url", "word"]).reset_index(drop=True)
    owords = (
        pd.DataFrame(oracle.words, columns=["parent_url", "word", "frequency"])
        .sort_values(["parent_url", "word"])
        .reset_index(drop=True)
    )
    assert len(words) == len(owords)
    if len(words):
        assert words.equals(owords.astype(words.dtypes.to_dict()))
    trace = read_trace(out_dir).to_pandas().sort_values(["round", "seq"]).reset_index(drop=True)
    otrace = pd.DataFrame(oracle.trace).sort_values(["round", "seq"]).reset_index(drop=True)
    assert len(trace) == len(otrace), (len(trace), len(otrace))
    cols = ["round", "seq", "url", "parent_url", "action"]
    assert trace[cols].astype({"round": int, "seq": int}).equals(
        otrace[cols].astype({"round": int, "seq": int})
    )
    return docs, trace


OFFICE_CTS = {DOCX_CT, ODT_CT, RTF_CT, EPUB_CT, "application/pdf"}


def test_extended_mode_full_equality(ray_session, corpus_fixture):
    out = "/tmp/gr_ext_on"
    stats, oracle = _run_both(out, corpus_fixture, extended_doc_types=True)
    docs, trace = _assert_equal(out, oracle)
    got_office = docs[docs.content_type.isin(OFFICE_CTS)]
    # the office-mix corpus must actually exercise the new branch
    assert len(got_office) > 0
    assert {DOCX_CT, ODT_CT, RTF_CT, EPUB_CT} <= set(got_office.content_type)
    # extracted content equals the corpus' golden text column
    full, _ = corpus_fixture
    golden = {
        u: t
        for u, t, ct in zip(
            full["url"].to_pylist(), full["text"].to_pylist(),
            full["content_type"].to_pylist(),
        )
        if ct in OFFICE_CTS
    }
    for _, r in got_office.iterrows():
        if r.content_type != "application/pdf":  # pdf corpus body is a stub
            assert r.content == golden[r.url], r.url
            assert len(r.content) > 0
    # office docs contribute words but never children
    kid_parents = set(trace[trace.action == "fetched"].parent_url)
    office_urls = set(got_office.url)
    assert not (office_urls & kid_parents)


def test_parity_mode_drops_office_types(ray_session, corpus_fixture):
    out = "/tmp/gr_ext_off"
    stats, oracle = _run_both(out, corpus_fixture)  # default config
    docs, trace = _assert_equal(out, oracle)
    assert not set(docs.content_type) & OFFICE_CTS
    dropped = trace[trace.action == "type-drop"]
    assert len(dropped) > 0  # the same corpus rows now trace type-drop


def test_parse_page_office_branches():
    from grawler_ray.functions.docx import build_docx
    from grawler_ray.functions.odt import build_odt
    from grawler_ray.functions.rtf import build_rtf
    from grawler_ray.textops import process_text

    for ct, body in [
        (DOCX_CT, build_docx("Alpha beta\ngamma")),
        (ODT_CT, build_odt("Alpha beta\ngamma")),
        (RTF_CT, build_rtf("Alpha beta\ngamma")),
    ]:
        d = parse_page(body, ct, "https://h.test/x", "https://h.test", "h.test")
        assert d["content"] == process_text("Alpha beta\ngamma")
        assert d["child_urls"] == []
        assert d["words"]["alpha"] == 1
        # meta defaults fill from content like the text/plain branch
        assert d["meta_title"] != "" or d["meta_description"] != ""
    # corrupt payloads extract as empty, not as a crash
    d = parse_page(b"PK\x03\x04 truncated", DOCX_CT, "https://h.test/x",
                   "https://h.test", "h.test")
    assert d["content"] == "" and d["words"] == {}
    assert extract_office_text(b"junk", RTF_CT) == ""


class TestParsePageRobustness:
    """The crawl parse boundary must never crash on hostile payloads in
    extended mode: every extended MIME either extracts or yields empty
    content — exceptions would kill a whole Ray batch."""

    MIMES = (
        "application/pdf", DOCX_CT, ODT_CT, RTF_CT, EPUB_CT, "text/rtf",
    )

    def test_random_bytes_never_crash(self):
        import numpy as np

        rng = np.random.RandomState(7)
        for _ in range(40):
            blob = rng.bytes(rng.randint(0, 400))
            for ct in self.MIMES:
                d = parse_page(blob, ct, "https://h.test/x", "https://h.test", "h.test")
                assert isinstance(d["content"], str)
                assert d["child_urls"] == []

    def test_truncated_valid_payloads_never_crash(self):
        from grawler_ray.functions.docx import build_docx
        from grawler_ray.functions.epub import build_epub
        from grawler_ray.functions.odt import build_odt
        from grawler_ray.functions.rtf import build_rtf

        bodies = [
            (DOCX_CT, build_docx("some docx body\nwith lines")),
            (ODT_CT, build_odt("some odt body\nwith lines")),
            (RTF_CT, build_rtf("some rtf body š unicode")),
            (EPUB_CT, build_epub("t", [("c", "chapter body text")])),
        ]
        for ct, body in bodies:
            for frac in (0.1, 0.4, 0.7, 0.95):
                cut = max(1, int(len(body) * frac))
                d = parse_page(body[:cut], ct, "https://h.test/x",
                               "https://h.test", "h.test")
                assert isinstance(d["content"], str)
