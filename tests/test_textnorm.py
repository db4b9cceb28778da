"""normalize_text (NFC + ASCII-ws collapse) and rare_word_ratio: engine vs
DuckDB-oracle parity on adversarial fixtures (combining accents, NBSP,
whitespace runs) and vs a serial pandas oracle."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


FIXTURE = [
    "plain ascii text",
    "",
    "  leading and   trailing   ",
    "café vs café",          # precomposed vs combining accent
    "nbsp stays put",          # NBSP is NOT ASCII whitespace
    "tabs\tand\nnewlines\r\fand\x0bvtab",
    "Å angstrom sign normalizes",   # U+212B -> U+00C5 under NFC
    "ideographic　space survives",
]


def _fixture_table():
    return pa.table(
        {
            "doc_id": pa.array(range(len(FIXTURE)), pa.int64()),
            "text": pa.array(FIXTURE, pa.string()),
        }
    )


def test_normalize_batch_matches_duckdb():
    from grawler_ray.functions.textstats import normalize_text_batch

    t = _fixture_table()
    got = normalize_text_batch(t).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(
        r"""
        SELECT doc_id, length(norm)::BIGINT AS n_chars_norm, md5(norm) AS norm_md5
        FROM (SELECT doc_id,
                     trim(regexp_replace(nfc_normalize(text),
                                         '[ \t\n\r\f\v]+', ' ', 'g'), ' ') AS norm
              FROM documents)
        ORDER BY doc_id
        """
    ).df()
    assert got.n_chars_norm.tolist() == want.n_chars_norm.tolist()
    assert got.norm_md5.tolist() == want.norm_md5.tolist()
    # NFC actually fired: the combining-accent doc normalized to equal forms
    norm3 = got[got.doc_id == 3].norm_md5.iloc[0]
    assert norm3 == hashlib.md5("café vs café".encode()).hexdigest()


def test_rare_word_ratio_matches_serial(ray_session):
    import ray.data

    from grawler_ray.functions.textstats import rare_word_ratio
    from grawler_ray.textops import words_freq

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 30)).tolist())
        + (f" unique{i}" if i % 3 == 0 else "")
        for i in range(200)
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(8)
    got = (
        rare_word_ratio(ds, max_df=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # serial oracle
    tf = {i: words_freq(t) for i, t in enumerate(texts)}
    df_cnt = {}
    for c in tf.values():
        for w in c:
            df_cnt[w] = df_cnt.get(w, 0) + 1
    rows = []
    for i, c in tf.items():
        if not c:
            continue
        rows.append(
            {
                "doc_id": i,
                "n_tokens": sum(c.values()),
                "n_rare_tokens": sum(v for w, v in c.items() if df_cnt[w] <= 2),
                "n_types": len(c),
                "n_rare_types": sum(1 for w in c if df_cnt[w] <= 2),
            }
        )
    want = pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_tokens", "n_rare_tokens", "n_types", "n_rare_types"]].astype(
            np.int64
        ),
        want.astype(np.int64),
    )
