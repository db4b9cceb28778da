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


def test_pack_manifest_serial_equality(ray_session):
    """Greedy concatenation packing: per-shard serial replay must produce
    identical (shard, doc_id, seq_id, n_tok) rows, and each full sequence
    must account for exactly seq_len tokens."""
    import ray.data

    from grawler_ray.functions.textstats import pack_manifest
    from grawler_ray.textops import words_freq

    rng = np.random.default_rng(53)
    texts = ["word " * int(rng.integers(0, 40)) for _ in range(300)]
    ds = ray.data.from_items(
        [{"doc_id": i * 17, "text": t} for i, t in enumerate(texts)]
    ).repartition(8)
    L, S = 16, 8
    got = (
        pack_manifest(ds, seq_len=L, num_shards=S)
        .to_pandas()
        .sort_values(["shard", "doc_id", "seq_id"])
        .reset_index(drop=True)
    )

    KNUTH = 2654435761
    rows = []
    per_shard = {}
    for i, t in enumerate(texts):
        doc_id = i * 17
        n = sum(words_freq(t).values())
        if n == 0:
            continue
        shard = ((doc_id * KNUTH) % (1 << 32)) % S
        per_shard.setdefault(shard, []).append((doc_id, n))
    for shard, docs in per_shard.items():
        pos = 0
        for doc_id, n in sorted(docs):
            start, end = pos, pos + n
            for seq in range(start // L, (end - 1) // L + 1):
                rows.append(
                    {
                        "shard": shard,
                        "doc_id": doc_id,
                        "seq_id": seq,
                        "n_tok": min(end, (seq + 1) * L) - max(start, seq * L),
                    }
                )
            pos = end
    want = (
        pd.DataFrame(rows)
        .sort_values(["shard", "doc_id", "seq_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))
    # every non-final sequence of each shard accounts for exactly L tokens
    sums = got.groupby(["shard", "seq_id"]).n_tok.sum()
    last = got.groupby("shard").seq_id.max()
    for (shard, seq), s in sums.items():
        if seq < last[shard]:
            assert s == L, (shard, seq, s)
