"""Winnowing fingerprints vs an independent brute-force oracle
(per-window Python loop straight from Schleimer et al. 2003 Fig. 5
semantics: min of each window, rightmost on ties, dedupe positions)."""

import numpy as np
import pyarrow as pa


def brute_winnow(text: str, k=5, window=4, mod=(1 << 61) - 1, base=257):
    b = text.lower().encode("utf-8")
    if len(b) < k:
        return []
    hs = []
    for i in range(len(b) - k + 1):
        h = 0
        for c in b[i : i + k]:
            h = (h * base + c) % mod
        hs.append(h)
    if len(hs) <= window:
        m = min(hs)
        sel = {max(i for i, v in enumerate(hs) if v == m)}
    else:
        sel = set()
        for w0 in range(len(hs) - window + 1):
            win = hs[w0 : w0 + window]
            m = min(win)
            sel.add(w0 + max(i for i, v in enumerate(win) if v == m))
    return sorted({hs[i] for i in sel})


def test_winnow_vs_bruteforce(ray_session):
    import ray.data

    from grawler_ray.functions.textstats import winnow_fingerprints_batch

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",  # all-equal hashes: rightmost-tie rule
        "abcd",  # shorter than k: no fingerprints
        "abcdefgh",  # fewer hashes than the window
        "Mixed CASE and    spacing\nnewlines\ttabs",
        "",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = winnow_fingerprints_batch(t).to_pandas()
    for i, txt in enumerate(texts):
        fps = brute_winnow(txt)
        row = got.iloc[i]
        assert row["n_fingerprints"] == len(fps), txt
        if fps:
            assert row["min_fp"] == min(fps)
            x = 0
            for v in fps:
                x ^= v
            assert row["fp_xor"] == x
        else:
            assert np.isnan(row["min_fp"]) and row["fp_xor"] == 0


def test_winnow_shared_substring_guarantee(ray_session):
    """Docs sharing a substring of length >= k + window - 1 share at
    least one fingerprint (the winnowing guarantee)."""
    from grawler_ray.functions.textstats import winnow_fingerprints_batch

    shared = "zqxjkvbnmpwceu"  # length 14 >= 5 + 4 - 1
    a = "prefix one " + shared + " tail alpha"
    b = "completely different start " + shared + " other end"
    fa, fb = set(brute_winnow(a)), set(brute_winnow(b))
    assert fa & fb
    # and the batch kernel agrees with the brute sets it was checked by
    t = pa.table({"doc_id": [0, 1], "text": [a, b]})
    got = winnow_fingerprints_batch(t).to_pandas()
    assert got["n_fingerprints"].tolist() == [len(fa), len(fb)]


def test_winnow_sf_documents(ray_session):
    """Full-table run at sf0.001: every doc gets a row; spot-check three
    docs against the brute oracle."""
    import pyarrow.parquet as pq
    import ray.data

    from grawler_ray.functions.textstats import winnow_fingerprints_batch

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    got = (
        ds.map_batches(winnow_fingerprints_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
    )
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == t.num_rows
    for did, txt in list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))[:3]:
        fps = brute_winnow(txt or "")
        assert got.loc[did, "n_fingerprints"] == len(fps)
        assert got.loc[did, "min_fp"] == min(fps)
