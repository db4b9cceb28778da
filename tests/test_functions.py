"""Unit tests for the training-data operators' pure kernels (no Ray)."""

import numpy as np

from grawler_ray.functions.dedup import (
    _perm_params,
    hamming64,
    jaccard,
    minhash_signature,
    shingles,
    simhash64,
)
from grawler_ray.functions.textstats import STOPWORDS, rolling_hash


class TestShingles:
    def test_basic_trigrams(self):
        s = shingles("the quick brown fox jumps", k=3)
        assert len(s) == 3  # 5 tokens -> 3 trigrams

    def test_short_text_single_shingle(self):
        assert len(shingles("one two", k=3)) == 1
        assert shingles("", k=3) == set()

    def test_deterministic(self):
        assert shingles("a b c d") == shingles("a b c d")


class TestMinHash:
    def test_identical_sets_identical_sigs(self):
        a, b = _perm_params(64)
        s = shingles("the quick brown fox jumps over the lazy dog")
        assert (minhash_signature(s, a, b) == minhash_signature(set(s), a, b)).all()

    def test_similarity_estimate_tracks_jaccard(self):
        a, b = _perm_params(256)
        t1 = "the quick brown fox jumps over the lazy dog again and again today"
        t2 = "the quick brown fox jumps over the lazy cat again and again today"
        s1, s2 = shingles(t1), shingles(t2)
        true_j = jaccard(s1, s2)
        est = (minhash_signature(s1, a, b) == minhash_signature(s2, a, b)).mean()
        assert abs(est - true_j) < 0.2

    def test_empty_set_signature(self):
        a, b = _perm_params(16)
        sig = minhash_signature(set(), a, b)
        assert (sig == np.iinfo(np.uint64).max).all()


class TestJaccard:
    def test_bounds(self):
        assert jaccard({1, 2}, {1, 2}) == 1.0
        assert jaccard({1}, {2}) == 0.0
        assert jaccard(set(), set()) == 1.0
        assert jaccard({1, 2, 3}, {2, 3, 4}) == 0.5


class TestSimHash:
    def test_deterministic_and_64bit(self):
        h = simhash64("hello world hello")
        assert h == simhash64("hello world hello")
        assert 0 <= h < (1 << 64)

    def test_similar_texts_close_hamming(self):
        t1 = "the quick brown fox jumps over the lazy dog " * 5
        t2 = t1 + "extra word"
        d_sim = hamming64(simhash64(t1), simhash64(t2))
        d_diff = hamming64(simhash64(t1), simhash64("completely different content entirely xyz"))
        assert d_sim < d_diff

    def test_hamming(self):
        assert hamming64(0, 0) == 0
        assert hamming64(0, 0b1011) == 3


def test_rolling_hash_deterministic_order_sensitive():
    assert rolling_hash("abc") == rolling_hash("abc")
    assert rolling_hash("abc") != rolling_hash("acb")
    assert rolling_hash("") == 0


def test_stopwords_fixed():
    # the SQL oracle embeds this list literally — it must not drift silently
    assert STOPWORDS == ("the", "a", "and", "of", "to", "in", "is", "on", "for", "by")


def test_orders_by_nation_shuffle_equals_broadcast(ray_session):
    """The >threshold repartition-join fallback must give identical results
    to the broadcast path (the guard switches silently at scale)."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    bc = (
        e._orders_by_nation(sf)
        .to_pandas()
        .sort_values("nation")
        .reset_index(drop=True)
    )
    sh = (
        e._orders_by_nation(sf, broadcast_max_rows=0)  # force the shuffle path
        .to_pandas()
        .sort_values("nation")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(bc, sh)


def test_token_count_batch():
    """BPE-ish pre-tokenizer counts: deterministic, GPT-2-flavored splits,
    and the adversarial shapes that would diverge between Python re and RE2
    if the pattern used lookahead or Unicode classes (it must not)."""
    import pyarrow as pa

    from grawler_ray.functions.textstats import token_count_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["don't stop", "a  b\tc", "café — résumé", ""], pa.string()),
        }
    )
    out = token_count_batch(t)
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["n_ws_tokens"], r["n_punct_chars"]) for r in out.to_pylist()}
    # "don't stop" -> don | 't | " stop" = 3 bpe tokens, 2 ws tokens, 1 punct (')
    assert got[0] == (3, 2, 1)
    # "a  b\tc" -> a | " " | " b" | \t | c = 5 bpe (ws runs between), 3 ws, 0 punct
    assert got[0][0] == 3 and got[1] == (5, 3, 0)
    assert got[3] == (0, 0, 0)
    # unicode bytes land in the punct/other class, never in [a-zA-Z]
    assert got[2][2] > 0


def test_length_quantiles_rank_semantics(ray_session):
    """p_q = smallest value with cumcount >= ceil(n*q/100): for n=4 values
    [10,20,30,40], p50 rank = 2 -> 20; p90 rank = 4 -> 40; p99 rank = 4 ->
    40; a singleton group returns its value for every percentile."""
    import ray.data

    from grawler_ray.functions.textstats import length_quantiles

    docs = ray.data.from_items(
        [{"lang": "en", "n_chars": v} for v in (40, 10, 30, 20)]
        + [{"lang": "de", "n_chars": 7}]
    )
    out = length_quantiles(docs).to_pandas().set_index("lang")
    assert out.loc["en", ["n_docs", "p50", "p90", "p99"]].tolist() == [4, 20, 40, 40]
    assert out.loc["de", ["n_docs", "p50", "p90", "p99"]].tolist() == [1, 7, 7, 7]


def test_length_quantiles_bin_guard(ray_session):
    import pytest as _pytest
    import ray.data

    from grawler_ray.functions.textstats import length_quantiles

    docs = ray.data.from_items([{"lang": "en", "n_chars": v} for v in range(5)])
    with _pytest.raises(ValueError, match="histogram"):
        length_quantiles(docs, driver_max_bins=2)


def test_word_freq_batch_matches_scalar_words_freq():
    """The factorized word_freq kernel == the Go-parity scalar words_freq
    as a (doc_id, word, frequency) SET, including the lower-AFTER-match
    edge (U+0130 lowers into an ASCII-matchable 'i' — matching must happen
    on the original text)."""
    import pyarrow as pa

    from grawler_ray.functions.textstats import word_freq_batch
    from grawler_ray.textops import words_freq

    texts = [
        "Hello wörld_9 café Hello",
        "",
        "C'est l'été 42",
        "The THE the tHe",
        None,
        "İstanbul I ı",
    ]
    ids = list(range(len(texts)))
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )
    out = word_freq_batch(t)
    got = set(
        zip(
            out["doc_id"].to_pylist(),
            out["word"].to_pylist(),
            out["frequency"].to_pylist(),
        )
    )
    ref = {
        (i, w, f)
        for i, txt in zip(ids, texts)
        for w, f in words_freq(txt or "").items()
    }
    assert got == ref
    empty = word_freq_batch(t.slice(0, 0))
    assert empty.num_rows == 0 and empty.schema == out.schema


def test_bigram_counts_topk(ray_session):
    import ray.data

    from grawler_ray.functions.textstats import bigram_counts

    docs = ray.data.from_items(
        [
            {"text": "a b a b c"},     # bigrams: "a b" x2, "b a", "b c"
            {"text": "A b"},           # lowercased -> "a b"
            {"text": "solo"},          # no bigrams
        ]
    )
    out = bigram_counts(docs, k=2).to_pandas()
    got = dict(zip(out["bigram"], out["total"]))
    assert got == {"a b": 3, "b a": 1}  # tiebreak (total desc, bigram asc)


def test_cooccurrence_topk_matches_serial_reference(ray_session):
    """Windowed skip-gram counts == a serial loop reference: window
    semantics (1 <= d <= window), no cross-document pairs, lowercase
    tokenization, (total desc, pair asc) tiebreak at the k boundary."""
    import re as _re
    from collections import Counter

    import ray.data

    from grawler_ray.functions.textstats import cooccurrence_topk

    texts = [
        "a b c d e f a b",        # pairs at every offset 1..5
        "A b",                     # lowercased; no pair with the doc above
        "solo",                    # no pairs
        "",                        # empty doc
        "x " * 9,                  # repeated token: (x, x) at all offsets
    ]
    ref: Counter = Counter()
    word_re = _re.compile(r"\b\w+\b")
    window = 3
    for txt in texts:
        ws = word_re.findall(txt.lower())
        for d in range(1, window + 1):
            for a, b in zip(ws, ws[d:]):
                ref[a + " " + b] += 1
    k = 7
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    docs = ray.data.from_items([{"text": t} for t in texts]).repartition(3)
    out = cooccurrence_topk(docs, window=window, k=k).to_pandas()
    got = list(zip(out["pair"], out["total"]))
    assert got == expect


def test_source_lang_pivot(ray_session):
    import ray.data

    from grawler_ray.functions.textstats import source_lang_pivot

    docs = ray.data.from_items(
        [
            {"source": "s1", "lang": "en", "n_chars": 10},
            {"source": "s1", "lang": "de", "n_chars": 5},
            {"source": "s2", "lang": "en", "n_chars": 7},
        ]
    )
    out = source_lang_pivot(docs).to_pandas().set_index("source")
    assert out.loc["s1", "n_docs"] == 2
    assert out.loc["s1", "sum_chars"] == 15
    assert out.loc["s1", "n_en"] == 1 and out.loc["s1", "n_de"] == 1
    assert out.loc["s1", "n_zh"] == 0
    assert out.loc["s2", "n_docs"] == 1 and out.loc["s2", "n_en"] == 1


def test_distinct_words_per_lang(ray_session):
    import ray.data

    from grawler_ray.functions.textstats import distinct_words_per_lang

    docs = ray.data.from_items(
        [
            {"lang": "en", "text": "a b a"},
            {"lang": "en", "text": "b c"},
            {"lang": "de", "text": "x x"},
        ]
    )
    out = distinct_words_per_lang(docs).to_pandas()
    got = dict(zip(out.lang, out.n_words))
    assert got == {"en": 3, "de": 1}


def test_chunk_docs_windows(ray_session):
    """Window arithmetic: overlap, short tails, empty docs dropped."""
    import ray.data

    from grawler_ray.functions.textstats import chunk_docs

    ds = ray.data.from_items(
        [
            {"doc_id": 0, "text": "abcdefghij"},  # L=10: chunks at 0,4,8
            {"doc_id": 1, "text": "abcde"},  # L=5 == size: one chunk
            {"doc_id": 2, "text": ""},  # empty: no rows
            {"doc_id": 3, "text": "abcdefgh"},  # L=8: 0 and 4 ('efgh')
        ]
    ).repartition(2)
    out = (
        chunk_docs(ds, size=5, stride=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    got = list(zip(out.doc_id, out.chunk_id, out.chunk_start, out.chunk_text))
    assert got == [
        (0, 0, 0, "abcde"),
        (0, 1, 4, "efghi"),
        (0, 2, 8, "ij"),
        (1, 0, 0, "abcde"),
        (3, 0, 0, "abcde"),
        (3, 1, 4, "efgh"),
    ]
    # every chunk is reconstructible: substr(text, start, size)
    texts = {0: "abcdefghij", 1: "abcde", 3: "abcdefgh"}
    for d, _c, s, txt in got:
        assert txt == texts[d][s : s + 5]


def test_vocab_coverage_counts(ray_session):
    """Top-V vocabulary with the (count desc, word asc) tie-break; per-doc
    token/type membership counts checked by hand."""
    import ray.data

    from grawler_ray.functions.textstats import vocab_coverage

    ds = ray.data.from_items(
        [
            {"doc_id": 0, "text": "cat cat dog bird"},
            {"doc_id": 1, "text": "dog dog cat fish"},
            {"doc_id": 2, "text": "zebra zebra zebra"},
            {"doc_id": 3, "text": ""},
        ]
    ).repartition(2)
    # totals: cat 3, dog 3, zebra 3, bird 1, fish 1 -> top-2 = cat, dog
    out = (
        vocab_coverage(ds, vocab_size=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1, 2]  # empty doc 3 emits no row
    assert out.loc[0].tolist() == [4, 3, 3, 2]  # tokens, in-vocab, types, in-types
    assert out.loc[1].tolist() == [4, 3, 3, 2]
    assert out.loc[2].tolist() == [3, 0, 1, 0]


def test_bigram_lm_score_planted(ray_session):
    """score = Σ over a doc's bigram occurrences of that bigram's GLOBAL
    count — checked against a brute-force serial recomputation."""
    import re
    from collections import Counter

    import ray.data

    from grawler_ray.functions.textstats import bigram_lm_score

    texts = {
        0: "the cat sat on the cat",   # repeated bigram inside one doc
        1: "the cat ran",              # shares "the cat" with doc 0
        2: "lonely",                   # 1 token -> no bigrams -> absent
        3: "",                         # empty -> absent
        4: "on the cat sat THE CAT",   # lowercasing folds THE CAT
    }
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in texts.items()]
    ).repartition(3)

    wre = re.compile(r"\b\w+\b")
    doc_bgs = {
        d: [
            f"{w[i]} {w[i + 1]}"
            for w in [wre.findall(t.lower())]
            for i in range(len(w) - 1)
        ]
        for d, t in texts.items()
    }
    glob = Counter(bg for bgs in doc_bgs.values() for bg in bgs)
    exp = {
        d: (len(bgs), sum(glob[bg] for bg in bgs))
        for d, bgs in doc_bgs.items()
        if bgs
    }

    out = bigram_lm_score(ds).to_pandas().set_index("doc_id").sort_index()
    assert set(out.index) == set(exp)
    for d, (n, s) in exp.items():
        assert out.loc[d, "n_bigrams"] == n and out.loc[d, "score"] == s

    # the scale path (string-key repartition join, driver_max_bigrams=0
    # forces it) must equal the broadcast path exactly
    join_out = (
        bigram_lm_score(ds, driver_max_bigrams=0)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert join_out.equals(out)


def test_doc_entropy_batch_hand_cases():
    """Entropy: 0 for a constant doc, ln(n) for all-distinct, lowercase
    merge before counting, NaN (not a pandas NA) for empty docs."""
    import math

    import numpy as np
    import pyarrow as pa

    from grawler_ray.functions.textstats import doc_entropy_batch

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["x x x x", "a b c d", "", "A a b"],
        }
    )
    out = doc_entropy_batch(t)
    df = out.to_pandas().set_index("doc_id")
    assert df["n_words"].tolist() == [4, 4, 0, 3]
    assert df["n_distinct"].tolist() == [1, 4, 0, 2]
    assert df.loc[1, "entropy_c"] == 0.0
    assert df.loc[2, "entropy_c"] == math.floor(math.log(4) * 100 + 0.5)
    assert np.isnan(df.loc[3, "entropy_c"])
    # "A a b" -> counts {a:2, b:1}: H = ln3 - (2 ln 2)/3
    exp = math.floor((math.log(3) - 2 * math.log(2) / 3) * 100 + 0.5)
    assert df.loc[4, "entropy_c"] == exp
    # driver repr rule: float64 column, never pandas-nullable
    assert df["entropy_c"].dtype.kind == "f"
    # empty batch keeps the schema
    empty = doc_entropy_batch(t.slice(0, 0))
    assert empty.num_rows == 0 and empty.schema == out.schema


def test_source_kl_vs_duckdb(ray_session):
    """KL(p_source || p_corpus) micro-nat values match the SQL mirror
    on real table data (term formula mirrored literally)."""
    import duckdb
    import ray.data

    from grawler_ray.functions.textstats import source_kl

    sf = "/root/testdata/sf0.001"
    got = (
        source_kl(ray.data.read_parquet(f"{sf}/documents.parquet"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        rf"""WITH tok AS (SELECT source,
                    lower(unnest(regexp_extract_all(text, '\b\w+\b'))) AS w
             FROM '{sf}/documents.parquet'),
        c AS (SELECT source, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
        st AS (SELECT source, sum(c)::BIGINT AS ts FROM c GROUP BY 1),
        tt AS (SELECT sum(c)::BIGINT AS t FROM c),
        gw AS (SELECT w, sum(c)::BIGINT AS g FROM c GROUP BY 1)
        SELECT c.source, st.ts AS n_tokens,
               CAST(floor(sum(
                   (c.c / CAST(st.ts AS DOUBLE)) *
                   ln((c.c / CAST(st.ts AS DOUBLE)) /
                      (gw.g / CAST(tt.t AS DOUBLE)))
               ) * 1000000 + 0.5) AS BIGINT) AS kl_micro
        FROM c JOIN st USING (source) JOIN gw ON c.w = gw.w CROSS JOIN tt
        GROUP BY c.source, st.ts ORDER BY c.source"""
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # KL is non-negative and a uniform corpus would be ~0
    assert (got["kl_micro"] >= 0).all()


def test_source_vocab_jaccard_vs_duckdb(ray_session):
    """Pairwise vocabulary intersection/union sizes match the distinct
    self-join SQL on real documents."""
    import duckdb
    import pandas as pd
    import ray.data

    from grawler_ray.functions.textstats import source_vocab_jaccard

    sf = "/root/testdata/sf0.001"
    got = (
        source_vocab_jaccard(ray.data.read_parquet(f"{sf}/documents.parquet"))
        .to_pandas()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        rf"""WITH tok AS (SELECT source,
                    lower(unnest(regexp_extract_all(text, '\b\w+\b'))) AS w
             FROM '{sf}/documents.parquet'),
        v AS (SELECT DISTINCT source, w FROM tok),
        vs AS (SELECT source, count(*)::BIGINT AS nv FROM v GROUP BY source),
        ix AS (SELECT a.source AS src_a, b.source AS src_b,
                      count(*)::BIGINT AS inter
               FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
               GROUP BY 1, 2)
        SELECT ix.src_a, ix.src_b, ix.inter,
               CAST(va.nv + vb.nv - ix.inter AS BIGINT) AS uni
        FROM ix JOIN vs va ON va.source = ix.src_a
                JOIN vs vb ON vb.source = ix.src_b
        ORDER BY src_a, src_b"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["inter"] <= got["uni"]).all()


def test_readability_counts_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from grawler_ray.functions.textstats import readability_counts

    sf = "/root/testdata/sf0.001"
    got = (
        readability_counts(ray.data.read_parquet(f"{sf}/documents.parquet"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        rf"""SELECT doc_id,
               len(regexp_extract_all(text, '\b\w+\b'))::BIGINT AS n_words,
               len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS n_sents,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
                   AS n_vowel_groups
        FROM '{sf}/documents.parquet' ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pmi_topk_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from grawler_ray.functions.textstats import pmi_topk

    sf = "/root/testdata/sf0.001"
    got = (
        pmi_topk(
            ray.data.read_parquet(f"{sf}/documents.parquet"),
            k=50,
            min_pair_count=3,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        rf"""WITH W AS (SELECT regexp_extract_all(lower(text), '\b\w+\b') AS w
                        FROM '{sf}/documents.parquet'),
            toks AS (SELECT unnest(w) AS word FROM W),
            uni AS (SELECT word, count(*)::BIGINT AS c FROM toks GROUP BY word),
            tot AS (SELECT count(*)::BIGINT AS t FROM toks),
            prs AS (SELECT unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i + 1])) AS pair FROM W),
            pc AS (SELECT pair, count(*)::BIGINT AS c_xy FROM prs
                   GROUP BY pair HAVING count(*) >= 3),
            ptot AS (SELECT count(*)::BIGINT AS p FROM prs)
            SELECT pc.pair, pc.c_xy,
                   CAST(floor((ln(pc.c_xy::DOUBLE) + 2.0 * ln(tot.t::DOUBLE)
                               - ln(ptot.p::DOUBLE) - ln(ux.c::DOUBLE)
                               - ln(uy.c::DOUBLE)) * 1000000.0 + 0.5)
                        AS BIGINT) AS pmi_micro
            FROM pc
            JOIN uni ux ON ux.word = split_part(pc.pair, ' ', 1)
            JOIN uni uy ON uy.word = split_part(pc.pair, ' ', 2)
            CROSS JOIN tot CROSS JOIN ptot
            ORDER BY pmi_micro DESC, pair ASC LIMIT 50"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pmi_topk_join_path_equals_broadcast(ray_session):
    """Above-guard string-key join path must produce the identical top-k."""
    import pandas as pd
    import ray.data

    from grawler_ray.functions.textstats import pmi_topk

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet")
    kw = dict(k=50, min_pair_count=3)
    bc = pmi_topk(ds, **kw).to_pandas().reset_index(drop=True)
    jn = (
        pmi_topk(ds, driver_max_words=0, **kw).to_pandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, jn)


def test_script_counts_unicode_edges(ray_session):
    """Mixed-script fixture incl. an astral (non-BMP) char: astral chars
    are ONE code point in both engines (no surrogate splitting)."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.textstats import script_counts

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["Hello Привет 你好 42", "𝔘nicode astral", ""],
        }
    )
    got = (
        script_counts(ray.data.from_arrow(t)).to_pandas().set_index("doc_id")
    )
    assert got.loc[1, "n_latin"] == 5
    assert got.loc[1, "n_cyrillic"] == 6
    assert got.loc[1, "n_cjk"] == 2
    assert got.loc[1, "n_digit"] == 2
    assert got.loc[1, "n_cp"] == len("Hello Привет 你好 42")
    # 𝔘 (U+1D518) is one code point, not Latin
    assert got.loc[2, "n_cp"] == len("𝔘nicode astral") == 14
    assert got.loc[2, "n_latin"] == 12  # 'nicode' + 'astral'
    assert got.loc[3, "n_cp"] == 0 and got.loc[3, "n_latin"] == 0


def test_script_counts_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from grawler_ray.functions.textstats import script_counts

    sf = "/root/testdata/sf0.001"
    got = (
        script_counts(ray.data.read_parquet(f"{sf}/documents.parquet"))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = duckdb.sql(
        rf"""SELECT doc_id, length(text)::BIGINT AS n_cp,
               len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT AS n_latin,
               len(regexp_extract_all(text, '[\x{{0400}}-\x{{04FF}}]'))::BIGINT AS n_cyrillic,
               len(regexp_extract_all(text, '[\x{{4E00}}-\x{{9FFF}}]'))::BIGINT AS n_cjk,
               len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digit
            FROM '{sf}/documents.parquet' ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_url_template_stats_trap_detection(ray_session):
    """A digit-generated URL space collapses to few templates (high trap
    score); a hand-authored site does not.  Query strings and hosts with
    ports stay part of the grouping; digitless paths are their own
    template."""
    import ray.data

    from grawler_ray.functions.urlstats import url_template_stats

    rows = (
        # trap: 60 URLs, ONE template /cal/N/N?d=N
        [{"url": f"https://trap.test/cal/{y}/{m}?d={m * y}"}
         for y in range(2010, 2020) for m in range(1, 7)]
        # diverse: 4 URLs, 4 templates (one digitless)
        + [{"url": "https://ok.test/about"},
           {"url": "https://ok.test/team/alice"},
           {"url": "https://ok.test/post/12"},
           {"url": "https://ok.test/archive/3/page/4"}]
        # port kept in the host key
        + [{"url": "https://ok.test:8080/about"}]
    )
    df = (
        url_template_stats(ray.data.from_items(rows).repartition(3))
        .to_pandas()
        .set_index("host")
    )
    assert df.loc["trap.test"].n_urls == 60
    assert df.loc["trap.test"].n_templates == 1
    assert df.loc["trap.test"].trap_score == 60.0
    assert df.loc["ok.test"].n_urls == 4
    assert df.loc["ok.test"].n_templates == 4
    assert df.loc["ok.test"].trap_score == 1.0
    assert df.loc["ok.test:8080"].n_urls == 1
    assert len(df) == 3


def test_apportion_budget_matches_serial_hamilton(ray_session):
    """Largest-remainder apportionment vs a serial Hamilton walk on a
    skewed random weight distribution: sum(alloc) == budget exactly,
    every alloc within floor/ceil of its exact quota (quota property),
    zero-remainder ties broken by key asc."""
    import ray.data

    from grawler_ray.functions.urlstats import apportion_budget

    rng = np.random.default_rng(11)
    counts = {f"s{i:02d}": int(c) for i, c in
              enumerate(rng.zipf(1.7, 30).clip(1, 500))}
    rows = [{"source": k} for k, c in counts.items() for _ in range(c)]
    rng.shuffle(rows)
    B = 97
    df = (
        apportion_budget(ray.data.from_items(rows).repartition(6),
                         key_col="source", budget=B)
        .to_pandas()
        .set_index("source")
    )
    W = sum(counts.values())
    # serial Hamilton
    base = {k: B * c // W for k, c in counts.items()}
    rem = {k: B * c % W for k, c in counts.items()}
    order = sorted(counts, key=lambda k: (-rem[k], k))
    L = B - sum(base.values())
    expect = {k: base[k] + (1 if order.index(k) < L else 0) for k in counts}
    assert df.alloc.sum() == B
    for k, c in counts.items():
        assert df.loc[k].weight == c
        assert df.loc[k].alloc == expect[k], (k, df.loc[k].alloc, expect[k])
        exact = B * c / W
        assert np.floor(exact) <= df.loc[k].alloc <= np.ceil(exact)


def test_anchor_topk_hand_fixture(ray_session):
    """Incoming anchor aggregation on hand-built pages: counts sum across
    source pages, rank orders by (n_refs desc, anchor asc), childUrlAllowed
    + urlAllowed admission drops fragments/bare relatives/robots.txt."""
    import ray.data

    from grawler_ray.functions.urlstats import anchor_topk

    p1 = (b'<a href="/t">buy widgets</a><a href="/t">buy widgets</a>'
          b'<a href="/t">cheap widgets</a><a href="#frag">skip</a>'
          b'<a href="other.html">skip too</a><a href="/robots.txt">blocked</a>')
    p2 = (b'<a href="https://b.test/t">buy widgets</a>'
          b'<a href="/u">about us</a>')
    ds = ray.data.from_items(
        [{"url": "https://b.test/p1", "html": p1},
         {"url": "https://b.test/p2", "html": p2}]
    ).repartition(2)
    df = anchor_topk(ds, k=2).to_pandas()
    t = df[df.url == "https://b.test/t"].sort_values("rank")
    assert list(zip(t.anchor, t.n_refs, t["rank"])) == [
        ("buy widgets", 3, 1), ("cheap widgets", 1, 2)]
    u = df[df.url == "https://b.test/u"]
    assert list(zip(u.anchor, u.n_refs, u["rank"])) == [("about us", 1, 1)]
    assert set(df.url) == {"https://b.test/t", "https://b.test/u"}


def test_anchor_topk_matches_corpus_spec(ray_session):
    """Differential test over the synthetic corpus: the distributed top-k
    must equal a serial walk of the same pages through the same extraction
    + admission, aggregated in plain Python."""
    import collections

    import ray.data

    from grawler_ray.functions.urlstats import anchor_topk
    from grawler_ray.htmlparse import extract_anchors
    from grawler_ray.sources.corpus import generate_corpus
    from grawler_ray.textops import to_valid_utf8
    from grawler_ray.urlops import (
        UrlError,
        child_url_allowed,
        extract_url_components,
        url_allowed,
    )

    corpus = "/tmp/grawler_anchor_corpus"
    generate_corpus(corpus, n_hosts=4, pages_per_host=8, seed=9, num_buckets=2)
    pages = ray.data.read_parquet(corpus, columns=["url", "html", "content_type"])

    tbl = pages.filter(lambda r: r["content_type"] == "text/html").materialize()
    counts: collections.Counter = collections.Counter()
    for row in tbl.take_all():
        scheme, host, _ = extract_url_components(row["url"])
        for href, text in extract_anchors(to_valid_utf8(row["html"])):
            child = child_url_allowed(href, f"{scheme}://{host}")
            if child is None:
                continue
            try:
                cs, ch, cp = extract_url_components(child)
            except UrlError:
                continue
            if url_allowed(cs, ch, cp):
                counts[(child, text[:256])] += 1
    expect = collections.defaultdict(list)
    for (u, a), c in counts.items():
        expect[u].append((a, c))
    K = 3
    want = {}
    for u, pairs in expect.items():
        pairs.sort(key=lambda p: (-p[1], p[0]))
        for r, (a, c) in enumerate(pairs[:K], 1):
            want[(u, a)] = (c, r)

    df = anchor_topk(
        pages.filter(lambda r: r["content_type"] == "text/html")
             .map_batches(lambda t: t.select(["url", "html"]),
                          batch_format="pyarrow"),
        k=K,
    ).to_pandas()
    got = {(u, a): (int(n), int(r))
           for u, a, n, r in zip(df.url, df.anchor, df.n_refs, df["rank"])}
    assert got == want and len(got) > 20


def test_apportion_budget_weight_col(ray_session):
    """weight_col sums the column per key instead of counting rows."""
    import ray.data

    from grawler_ray.functions.urlstats import apportion_budget

    rows = [{"host": "a", "w": 9}, {"host": "a", "w": 1},
            {"host": "b", "w": 10}, {"host": "c", "w": 80}]
    df = (
        apportion_budget(ray.data.from_items(rows).repartition(2),
                         key_col="host", budget=10, weight_col="w")
        .to_pandas().set_index("host")
    )
    assert df.loc["a"].weight == 10 and df.loc["a"].alloc == 1
    assert df.loc["b"].alloc == 1 and df.loc["c"].alloc == 8
    assert df.alloc.sum() == 10


def test_top_per_group_alloc(ray_session):
    """Variable-k per group: each key keeps alloc[key] rows ordered by
    (order desc, tie asc); missing keys keep none; over-budget keys keep
    everything; the driver guard raises with the named alternative."""
    import pytest as _pytest
    import ray.data

    from grawler_ray.functions.urlstats import top_per_group_alloc

    rows = [{"host": h, "doc_id": i, "stale_runs": i % 5, "change_ratio": 0.0}
            for i, h in enumerate(["a"] * 6 + ["b"] * 4 + ["c"] * 2)]
    ds = ray.data.from_items(rows).repartition(3)
    df = top_per_group_alloc(
        ds, {"a": 2, "b": 10, "x": 3}, key_col="host",
        order_cols=("stale_runs", "change_ratio"), tie_col="doc_id",
    ).to_pandas()
    a = df[df.host == "a"].sort_values("rnk")
    # host a: stale_runs of docs 0..5 are [0,1,2,3,4,0] -> top2 = docs 4,3
    assert a.doc_id.tolist() == [4, 3] and a.rnk.tolist() == [1, 2]
    assert len(df[df.host == "b"]) == 4      # budget 10 > group size 4
    assert len(df[df.host == "c"]) == 0      # no allocation -> no rows
    with _pytest.raises(ValueError, match="repartition-join"):
        top_per_group_alloc(ds, {"a": 1}, driver_max_keys=0)


def test_anchor_relevance_focused_scoring(ray_session):
    """Term hits are whole-word case-insensitive over DISTINCT anchors
    weighted by reference counts; relevance = hits/refs; targets with no
    matching anchors score 0.0; anchor_topk regression on the shared map
    stage."""
    import ray.data

    from grawler_ray.functions.urlstats import anchor_relevance, anchor_topk

    p1 = (b'<a href="/solar">Solar panels</a><a href="/solar">cheap SOLAR kit</a>'
          b'<a href="/solar">unrelated</a>'
          b'<a href="/solarium">solarium spa</a>'   # substring must NOT hit
          b'<a href="/x">nothing here</a>')
    p2 = b'<a href="https://b.test/solar">solar again</a>'
    ds = ray.data.from_items(
        [{"url": "https://b.test/p1", "html": p1},
         {"url": "https://b.test/p2", "html": p2}]
    ).repartition(2)
    df = anchor_relevance(ds, terms=("solar", "battery")).to_pandas().set_index("url")
    s = df.loc["https://b.test/solar"]
    assert s.n_refs == 4 and s.n_hits == 3 and s.relevance == 0.75
    assert df.loc["https://b.test/solarium"].n_hits == 0  # whole-word only
    assert df.loc["https://b.test/x"].relevance == 0.0
    # shared map stage still feeds anchor_topk identically
    tk = anchor_topk(ds, k=1).to_pandas()
    row = tk[tk.url == "https://b.test/solar"]
    assert row.n_refs.iloc[0] == 1 and row["rank"].iloc[0] == 1  # 4 distinct anchors, count 1 each
