"""Round-4 seventh batch: grouped 2-D skyline (Pareto frontier), chain
resolution by pointer doubling, and the hashed-feature logistic-regression
text classifier — planted dominance/chain corners, brute-force and
recursive-CTE cross-checks, serial-numpy training oracle."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _skyline_df(df):
    """Run grouped_skyline on a (g, price, qty) frame, return sorted df."""
    import ray.data

    from grawler_ray.functions.olap import grouped_skyline

    ds = ray.data.from_pandas(df).repartition(5)
    out = grouped_skyline(
        ds, group_col="g", min_col="price", max_col="qty", min_scale=100
    ).to_pandas()
    return out.sort_values(["g", "price_c"]).reset_index(drop=True)


def test_skyline_dominance_corners(ray_session):
    """Planted corners: exact-duplicate points both count (one row, n=2);
    equal price keeps only the larger qty; equal qty keeps only the
    cheaper price; interior points vanish; groups are independent."""
    df = pd.DataFrame(
        {
            "g": ["A"] * 7 + ["B"] * 2,
            #           dup   dup   eq-price pair   eq-qty pair   interior
            "price": [1.00, 1.00, 2.00, 2.00, 3.00, 4.00, 2.50, 9.0, 1.0],
            "qty": [5.0, 5.0, 7.0, 6.0, 9.0, 9.0, 6.5, 1.0, 1.0],
        }
    )
    out = _skyline_df(df)
    a = out[out.g == "A"]
    # frontier: (100,5,n=2), (200,7), (300,9); (200,6) dominated by (200,7),
    # (400,9) dominated by (300,9), (250,6.5) dominated by (200,7)
    assert list(map(tuple, a[["price_c", "qty", "n_items"]].to_numpy())) == [
        (100, 5, 2),
        (200, 7, 1),
        (300, 9, 1),
    ]
    b = out[out.g == "B"]
    assert list(map(tuple, b[["price_c", "qty", "n_items"]].to_numpy())) == [
        (100, 1, 1),
        # (900,1) dominated by (100,1)? price higher, qty equal -> dominated
    ]


def test_skyline_random_vs_bruteforce_and_duckdb(ray_session):
    """Random points cross-checked against O(n^2) dominance and the
    window-function oracle SQL shape."""
    rng = np.random.RandomState(7)
    n = 600
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], n),
            "price": rng.randint(1, 60, n) / 2.0,
            "qty": rng.randint(1, 40, n).astype(float),
        }
    )
    out = _skyline_df(df)

    # brute force per group over distinct integer-scaled points
    pts = df.copy()
    pts["p"] = np.floor(pts.price * 100 + 0.5).astype(np.int64)
    pts["q"] = np.floor(pts.qty + 0.5).astype(np.int64)
    expect = []
    for g, sub in pts.groupby("g"):
        d = sub.groupby(["p", "q"]).size().reset_index(name="n")
        keep = []
        for _, r in d.iterrows():
            dom = (
                (d.p <= r.p)
                & (d.q >= r.q)
                & ((d.p < r.p) | (d.q > r.q))
            ).any()
            if not dom:
                keep.append((g, r.p, r.q, r.n))
        expect.extend(keep)
    exp = (
        pd.DataFrame(expect, columns=["g", "price_c", "qty", "n_items"])
        .sort_values(["g", "price_c"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"price_c": np.int64, "qty": np.int64, "n_items": np.int64}),
        exp.astype({"price_c": np.int64, "qty": np.int64, "n_items": np.int64}),
    )

    # the oracle's window shape agrees on the same frame
    con = duckdb.connect()
    con.register("t", df)
    sql = """
        WITH x AS (
            SELECT g, CAST(floor(price * 100.0 + 0.5) AS BIGINT) AS price_c,
                   CAST(floor(qty + 0.5) AS BIGINT) AS qty,
                   count(*)::BIGINT AS n_items
            FROM t GROUP BY 1, 2, 3
        ),
        y AS (
            SELECT *, MAX(qty) OVER (
                PARTITION BY g ORDER BY price_c ASC, qty DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bp
            FROM x
        )
        SELECT g, price_c, qty, n_items FROM y WHERE bp IS NULL OR qty > bp
        ORDER BY g, price_c
    """
    ora = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        out.astype({"price_c": np.int64, "qty": np.int64, "n_items": np.int64}),
        ora.astype({"price_c": np.int64, "qty": np.int64, "n_items": np.int64}),
    )


def _chains_df(df, force_distributed):
    import ray.data

    from grawler_ray.functions.graph import resolve_chains

    ds = ray.data.from_pandas(df).repartition(4)
    out = resolve_chains(
        ds,
        id_col="id",
        next_col="next",
        driver_max_rows=0 if force_distributed else 2_000_000,
    ).to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def test_resolve_chains_planted(ray_session):
    """Forest with chains of very different lengths, plus isolated roots;
    driver and distributed paths agree with the closed-form answer."""
    # chain A: 0 <- 1 <- ... <- 9 (root 0); chain B: 100 <- 101; roots 200, 201
    ids = list(range(10)) + [100, 101] + [200, 201]
    nxt = [None] + list(range(9)) + [None, 100] + [None, None]
    df = pd.DataFrame({"id": np.array(ids, np.int64), "next": pd.array(nxt, dtype="Int64")})
    exp = pd.DataFrame(
        {
            "id": np.array(ids, np.int64),
            "root_id": np.array([0] * 10 + [100, 100, 200, 201], np.int64),
            "depth": np.array(list(range(10)) + [0, 1, 0, 0], np.int64),
        }
    )
    for forced in (False, True):
        out = _chains_df(df, forced)
        pd.testing.assert_frame_equal(
            out.astype({"id": np.int64, "root_id": np.int64, "depth": np.int64}),
            exp,
        )


def test_resolve_chains_random_long(ray_session):
    """Random forest with chains up to ~500 hops: distributed ==
    driver == serial pointer-chase."""
    rng = np.random.RandomState(11)
    n = 2000
    ids = np.arange(n, dtype=np.int64)
    # break into chains at random points (~1/50 break rate => long chains)
    is_root = (rng.rand(n) < 0.02) | (ids == 0)
    nxt = np.where(is_root, -1, ids - 1)
    df = pd.DataFrame(
        {
            "id": ids,
            "next": pd.array(
                [None if v < 0 else int(v) for v in nxt], dtype="Int64"
            ),
        }
    )
    # serial chase
    root = np.zeros(n, np.int64)
    depth = np.zeros(n, np.int64)
    for i in range(n):
        if is_root[i]:
            root[i], depth[i] = i, 0
        else:
            root[i], depth[i] = root[i - 1], depth[i - 1] + 1
    exp = pd.DataFrame({"id": ids, "root_id": root, "depth": depth})
    for forced in (False, True):
        out = _chains_df(df, forced)
        pd.testing.assert_frame_equal(
            out.astype({"id": np.int64, "root_id": np.int64, "depth": np.int64}),
            exp,
        )


def test_resolve_chains_huge_ids(ray_session):
    """ids above 2^53 (xxhash-derived) survive bit-exact: a pandas-format
    init_state would coerce the nullable next column to float64 and corrupt
    them (the repartition_join / CLAUDE.md int64-with-nulls pitfall)."""
    base = np.int64(2**62 + 3)  # not representable in float64 +- small deltas
    ids = np.array([base, base + 1, base + 2, base + 3], np.int64)
    # chain: base <- base+1 <- base+2 ; isolated root base+3
    nxt = pd.array([None, int(base), int(base + 1), None], dtype="Int64")
    df = pd.DataFrame({"id": ids, "next": nxt})
    exp = pd.DataFrame(
        {
            "id": ids,
            "root_id": np.array([base, base, base, base + 3], np.int64),
            "depth": np.array([0, 1, 2, 0], np.int64),
        }
    )
    for forced in (False, True):
        out = _chains_df(df, forced)
        pd.testing.assert_frame_equal(
            out.astype({"id": np.int64, "root_id": np.int64, "depth": np.int64}),
            exp,
        )
        # float64 round-trip of base would land on a DIFFERENT int64
        assert np.int64(float(base)) != base


def test_lr_text_classifier_vs_serial_oracle(ray_session):
    """Distributed full-batch GD == serial numpy training (one global
    partial, same rounding discipline): scores within 1 micro, preds
    equal, and the keyword-proxy task fully separates."""
    import ray.data

    from grawler_ray.functions.textstats import lr_text_classifier
    from grawler_ray.textops import _WORD_RE
    from grawler_ray.urlops import xxhash64_batch

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    docs["label"] = docs.text.str.contains(r"\bvector\b", regex=True).astype(
        np.int64
    )
    dim, iters, lr = 1024, 50, 10.0

    out = (
        lr_text_classifier(
            ray.data.from_pandas(docs).repartition(6),
            id_col="doc_id",
            text_col="text",
            label_col="label",
            dim=dim,
            iters=iters,
            lr=lr,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # ---- serial oracle: identical featurization + GD, one partial ----
    n = len(docs)
    rows_i, rows_v = [], []
    for txt in docs.text:
        toks = _WORD_RE.findall((txt or "").lower())
        if toks:
            h = (xxhash64_batch(toks) % np.uint64(dim)).astype(np.int64)
            uniq, cnt = np.unique(h, return_counts=True)
            v = np.log1p(cnt.astype(np.float64))
            nrm = np.sqrt((v * v).sum())
            v = v / nrm if nrm > 0 else v
        else:
            uniq, v = np.array([], np.int64), np.array([], np.float64)
        rows_i.append(uniq)
        rows_v.append(v)
    lens = np.array([len(r) for r in rows_i])
    flat_i = np.concatenate(rows_i)
    flat_v = np.concatenate(rows_v)
    rix = np.repeat(np.arange(n), lens)
    y = docs.label.to_numpy(np.float64)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        z = np.bincount(rix, weights=flat_v * w[flat_i], minlength=n) + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.bincount(flat_i, weights=err[rix] * flat_v, minlength=dim)
        w = np.round((w - lr * g / n) * 1e9) / 1e9
        b = float(np.round((b - lr * err.sum() / n) * 1e9) / 1e9)
    z = np.bincount(rix, weights=flat_v * w[flat_i], minlength=n) + b
    p = 1.0 / (1.0 + np.exp(-z))
    exp_micro = np.floor(p * 1e6 + 0.5).astype(np.int64)
    exp_pred = (p >= 0.5).astype(np.int64)

    order = np.argsort(docs.doc_id.to_numpy())
    assert np.abs(out.score_micro.to_numpy() - exp_micro[order]).max() <= 1
    assert np.array_equal(out.pred.to_numpy(), exp_pred[order])
    acc = (out.pred.to_numpy() == y[order].astype(np.int64)).mean()
    assert acc >= 0.95, acc


def test_lr_text_classifier_two_vocab_generalization(ray_session):
    """Planted corpus with DISJOINT vocabulary pools per class: the
    model must learn many features (not one keyword) and classify every
    doc, including docs whose exact word mix never repeats."""
    import ray.data

    from grawler_ray.functions.textstats import lr_text_classifier

    rng = np.random.RandomState(5)
    pool_a = [f"alpha{i}" for i in range(40)]
    pool_b = [f"beta{i}" for i in range(40)]
    texts, labels = [], []
    for i in range(400):
        pool = pool_a if i % 2 == 0 else pool_b
        texts.append(" ".join(rng.choice(pool, 12)))
        labels.append(i % 2)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "text": texts,
            "label": np.array(labels, np.int64),
        }
    )
    out = (
        lr_text_classifier(
            ray.data.from_pandas(df).repartition(5),
            id_col="doc_id",
            text_col="text",
            label_col="label",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(out.pred.to_numpy(), df.label.to_numpy())
    # empty-text doc doesn't crash the kernels
    df2 = pd.concat(
        [df, pd.DataFrame({"doc_id": [400], "text": [""], "label": [0]})],
        ignore_index=True,
    )
    out2 = lr_text_classifier(
        ray.data.from_pandas(df2).repartition(5),
        id_col="doc_id",
        text_col="text",
        label_col="label",
        iters=5,
    ).to_pandas()
    assert len(out2) == 401


def test_split_by_cluster_leak_invariant(ray_session):
    """Near-dup components never straddle the split: every component maps
    to exactly ONE split, and the assignment equals split_train_holdout's
    bucket hash applied to the component id."""
    import ray.data

    from grawler_ray.functions.dedup import dedup_components
    from grawler_ray.functions.sampling import split_train_holdout

    docs = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64)})
    # planted clusters: (0..4), (10,11), rest singletons
    pairs = pd.DataFrame(
        {"a": np.array([0, 1, 2, 3, 10], np.int64),
         "b": np.array([1, 2, 3, 4, 11], np.int64)}
    )
    comp = dedup_components(
        ray.data.from_pandas(docs).repartition(3),
        ray.data.from_pandas(pairs).repartition(2),
    )
    out = split_train_holdout(comp, id_col="component").to_pandas()
    g = out.groupby("component")["split"].nunique()
    assert (g == 1).all()
    # all five members of the 0-4 chain share component 0's split
    chain = out[out.doc_id.isin([0, 1, 2, 3, 4])]
    assert chain.split.nunique() == 1 and (chain.component == 0).all()


def test_lr_text_classifier_minibatch_converges(ray_session):
    """mode="minibatch" trains on a deterministic quarter of the blocks
    per iteration yet still separates the keyword-proxy task; results
    are rerun-stable (deterministic block sampling, no wall clock)."""
    import ray.data

    from grawler_ray.functions.textstats import lr_text_classifier

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    docs["label"] = docs.text.str.contains(r"\bvector\b", regex=True).astype(
        np.int64
    )

    def run():
        return (
            lr_text_classifier(
                ray.data.from_pandas(docs).repartition(16),
                id_col="doc_id",
                text_col="text",
                label_col="label",
                dim=1024,
                iters=80,
                lr=10.0,
                mode="minibatch",
                minibatch_frac=0.25,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    out = run()
    y = docs.sort_values("doc_id").label.to_numpy(np.int64)
    acc = (out.pred.to_numpy() == y).mean()
    assert acc >= 0.90, acc
    # deterministic: a second run is bit-identical
    out2 = run()
    assert np.array_equal(out.score_micro.to_numpy(), out2.score_micro.to_numpy())
    with pytest.raises(ValueError, match="unknown mode"):
        lr_text_classifier(
            ray.data.from_pandas(docs), label_col="label", mode="sgd"
        )


def test_skyline_range_merge_equals_single_merge(ray_session):
    """The range-partitioned merge plan (forced via merge_threshold=0)
    equals the single-partition plan AND brute force on a fully
    ANTI-CORRELATED corpus — the axes shape that degrades the frontier
    to the distinct point count."""
    import ray.data

    from grawler_ray.functions.olap import grouped_skyline

    rng = np.random.RandomState(5)
    n = 4000
    # adversarial for (min p, max q) dominance: q grows with p, so no
    # point dominates another and nearly every distinct point is frontier
    p = rng.randint(1, 2000, n)
    q = p + rng.randint(-3, 4, n)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], n),
            "price": p / 100.0,
            "qty": q.astype(float),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)

    def run(threshold):
        out = grouped_skyline(
            ds, group_col="g", min_col="price", max_col="qty",
            min_scale=100, merge_threshold=threshold,
            num_range_buckets=16,
        ).to_pandas()
        return out.sort_values(["g", "price_c"]).reset_index(drop=True)

    single = run(10**9)
    ranged = run(0)
    pd.testing.assert_frame_equal(
        single.astype({"price_c": np.int64, "qty": np.int64, "n_items": np.int64}),
        ranged.astype({"price_c": np.int64, "qty": np.int64, "n_items": np.int64}),
    )
    # frontier really is large here (the adversarial regime)
    assert len(single) > 1000

    # brute force on distinct points confirms both
    pts = df.copy()
    pts["p"] = np.floor(pts.price * 100 + 0.5).astype(np.int64)
    pts["q"] = np.floor(pts.qty + 0.5).astype(np.int64)
    expect = []
    for g, sub in pts.groupby("g"):
        d = sub.groupby(["p", "q"]).size().reset_index(name="n")
        dom_p = d.p.to_numpy()[:, None] <= d.p.to_numpy()[None, :]
        dom_q = d.q.to_numpy()[:, None] >= d.q.to_numpy()[None, :]
        strict = (d.p.to_numpy()[:, None] < d.p.to_numpy()[None, :]) | (
            d.q.to_numpy()[:, None] > d.q.to_numpy()[None, :]
        )
        dominated = (dom_p & dom_q & strict).any(axis=0)
        for i in np.flatnonzero(~dominated):
            expect.append((g, d.p.iloc[i], d.q.iloc[i], d.n.iloc[i]))
    exp = (
        pd.DataFrame(expect, columns=["g", "price_c", "qty", "n_items"])
        .sort_values(["g", "price_c"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        ranged.astype({"price_c": np.int64, "qty": np.int64, "n_items": np.int64}),
        exp.astype({"price_c": np.int64, "qty": np.int64, "n_items": np.int64}),
    )


def test_lr_text_classifier_tree_fold_close_to_flat(ray_session):
    """Forcing the tree-reduce fold (max_partial_rows=0) changes only the
    float summation order: preds equal the flat fold, scores within 1
    micro (the 1e-9 weight-rounding discipline absorbs the rest)."""
    import ray.data

    from grawler_ray.functions.textstats import lr_text_classifier

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    docs["label"] = docs.text.str.contains(r"\bvector\b", regex=True).astype(
        np.int64
    )

    def run(mpr):
        return (
            lr_text_classifier(
                ray.data.from_pandas(docs).repartition(12),
                id_col="doc_id",
                text_col="text",
                label_col="label",
                dim=512,
                iters=25,
                max_partial_rows=mpr,
                tree_fanin=4,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    flat = run(10**9)
    tree = run(0)
    assert np.array_equal(flat.pred.to_numpy(), tree.pred.to_numpy())
    assert np.abs(flat.score_micro.to_numpy() - tree.score_micro.to_numpy()).max() <= 1
