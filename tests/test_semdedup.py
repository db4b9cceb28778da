"""SemDedup + exact-substring span stats: planted fixtures, an independent
serial-numpy oracle for the k-means+greedy semdedup rule, and DuckDB
cross-checks for dup_span_stats at sf0.001."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
KNUTH = np.uint64(2654435761)


def _serial_semdedup(vec_ids, V, k, threshold, iters=5):
    """Independent reimplementation of the pinned semdedup semantics:
    deterministic Lloyd's (init = k smallest Knuth-hashed vec_ids, ties by
    vec_id; empty clusters keep their centroid), then within each cluster a
    vector is a duplicate iff some smaller vec_id there has cosine >=
    threshold (dup_of = the smallest such)."""
    vec_ids = np.asarray(vec_ids, dtype=np.int64)
    V = np.asarray(V, dtype=np.float64)
    h = (vec_ids.astype(np.uint64) * KNUTH) % np.uint64(1 << 32)
    order = np.lexsort((vec_ids, h.astype(np.int64)))
    C = V[order[:k]].copy()
    for _ in range(iters):
        d = -2.0 * (V @ C.T) + (C * C).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = V[m].mean(axis=0)
    d = -2.0 * (V @ C.T) + (C * C).sum(axis=1)[None, :]
    assign = np.argmin(d, axis=1)

    N = V / np.where(
        np.linalg.norm(V, axis=1) == 0, 1.0, np.linalg.norm(V, axis=1)
    )[:, None]
    rows = []
    for c in np.unique(assign):
        idx = np.flatnonzero(assign == c)
        idx = idx[np.argsort(vec_ids[idx], kind="stable")]
        for j, gj in enumerate(idx):
            dup = -1
            for gi in idx[:j]:
                if N[gi] @ N[gj] >= threshold:
                    dup = int(vec_ids[gi])
                    break
            rows.append((int(vec_ids[gj]), int(c), dup == -1, dup))
    return (
        pd.DataFrame(rows, columns=["vec_id", "cluster", "keep", "dup_of"])
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


class TestSemdedup:
    def _run(self, ray_session, vec_ids, V, k, threshold):
        import ray.data

        from grawler_ray.functions.similarity import semdedup

        ds = ray.data.from_items(
            [
                {"vec_id": int(i), "embedding": [float(x) for x in v]}
                for i, v in zip(vec_ids, V)
            ]
        )
        got = (
            semdedup(ds, k=k, threshold=threshold)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        exp = _serial_semdedup(vec_ids, V, k, threshold)
        pd.testing.assert_frame_equal(
            got.astype({"keep": bool}), exp.astype({"keep": bool})
        )
        return got

    def test_planted_clusters(self, ray_session):
        rng = np.random.default_rng(7)
        centers = np.array(
            [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
        )
        ids, vecs = [], []
        vid = 0
        for c in centers:
            base = c + rng.normal(0, 0.05, size=3)
            for _ in range(4):  # 4 near-identical copies -> dups of the first
                ids.append(vid)
                vecs.append(base + rng.normal(0, 1e-4, size=3))
                vid += 1
            # one clearly-distinct member of the same k-means cluster
            ids.append(vid)
            vecs.append(c + np.array([0.0, 5.0, 5.0]))
            vid += 1
        got = self._run(ray_session, ids, np.array(vecs), k=3, threshold=0.999)
        # each planted group keeps exactly its smallest id + the outlier
        assert int(got.keep.sum()) == 6
        dup_rows = got[~got.keep]
        assert (dup_rows.dup_of == (dup_rows.vec_id // 5) * 5).all()

    def test_sf0001_agrees_with_serial_oracle(self, ray_session):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/embeddings.parquet")
        vec_ids = t.column("vec_id").to_numpy()
        V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        self._run(ray_session, vec_ids, V, k=8, threshold=0.93)


class TestDupSpans:
    def test_planted_shared_span(self, ray_session):
        import ray.data

        from grawler_ray.functions.dedup import dup_span_stats

        boiler = "x" * 25 + "SHARED LICENSE BLOCK " * 3  # > 40 chars
        docs = [
            # aperiodic: every 40-char window is distinct
            {"doc_id": 0, "text": " ".join(f"w{i}" for i in range(40))},
            {"doc_id": 1, "text": boiler + " tail one"},
            {"doc_id": 2, "text": boiler + " different tail"},
            {"doc_id": 3, "text": "short"},  # < window -> 0 windows
        ]
        out = (
            dup_span_stats(
                ray.data.from_items(docs), window=40, stride=10
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert len(out) == 4
        assert out.loc[3, "n_windows"] == 0 and out.loc[3, "n_dup_windows"] == 0
        assert out.loc[0, "n_dup_windows"] == 0
        # docs 1 and 2 share the 86-char boiler prefix: window starts 0..40
        # (start+40 <= 86) are byte-identical across the two docs
        assert out.loc[1, "n_dup_windows"] == 5
        assert out.loc[2, "n_dup_windows"] == 5

    def test_within_doc_repeat_counts_both_sites(self, ray_session):
        import ray.data

        from grawler_ray.functions.dedup import dup_span_stats

        rep = "A" * 50
        docs = [{"doc_id": 0, "text": rep + "-" * 10 + rep}]
        out = (
            dup_span_stats(ray.data.from_items(docs), window=40, stride=10)
            .to_pandas()
            .iloc[0]
        )
        # "A"*40 occurs at starts 0 and 10 (and 60) -> duplicated; every
        # window position whose text repeats counts
        assert out.n_windows == 8
        assert out.n_dup_windows >= 2

    def test_sf0001_matches_duckdb(self, ray_session):
        import ray.data

        from grawler_ray.functions.dedup import dup_span_stats

        got = (
            dup_span_stats(
                ray.data.read_parquet(f"{SF}/documents.parquet"),
                window=40,
                stride=10,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        exp = con.execute(
            """
            WITH w AS (
              SELECT doc_id, substr(text, p, 40) AS s
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 39, 10)) AS p
                    FROM documents)
            ),
            c AS (SELECT s, count(*) AS n FROM w GROUP BY s),
            agg AS (SELECT w.doc_id, count(*) AS n_windows,
                           sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS n_dup
                    FROM w JOIN c USING (s) GROUP BY w.doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_windows, 0)::BIGINT AS n_windows,
                   coalesce(a.n_dup, 0)::BIGINT AS n_dup_windows
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY doc_id
            """
        ).fetchdf()
        pd.testing.assert_frame_equal(got, exp)

    def test_join_strategy_equals_broadcast(self, ray_session):
        """strategy="join" (one coarse span-hash shuffle, no driver state)
        must reproduce the broadcast plan on real sf data, including
        0-window docs and within-doc repeats."""
        import ray.data

        from grawler_ray.functions.dedup import dup_span_stats

        docs = ray.data.read_parquet(f"{SF}/documents.parquet")
        a = (
            dup_span_stats(docs, window=40, stride=10, strategy="join")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            dup_span_stats(docs, window=40, stride=10, strategy="broadcast")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_guard_auto_falls_back_broadcast_raises(self, ray_session):
        """VERDICT r3 item 6: crossing driver_max_spans must fall back to
        the join plan under auto (equal output), and still raise under
        strategy="broadcast"."""
        import pytest as _pytest
        import ray.data

        from grawler_ray.functions.dedup import dup_span_stats

        boiler = "SHARED LICENSE BLOCK " * 5
        docs = ray.data.from_items(
            [{"doc_id": i, "text": boiler + f" tail {i}"} for i in range(4)]
            + [{"doc_id": 99, "text": "short"}]
        )
        with _pytest.raises(ValueError, match="strategy='join'"):
            dup_span_stats(
                docs, window=40, stride=10, driver_max_spans=0,
                strategy="broadcast",
            ).to_pandas()
        crossed = (
            dup_span_stats(docs, window=40, stride=10, driver_max_spans=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        exact = (
            dup_span_stats(docs, window=40, stride=10, strategy="broadcast")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(crossed, exact)
        assert crossed.loc[4, "n_windows"] == 0


def test_centroid_distances_vs_serial(ray_session):
    """Exact rational pair distances vs a straight numpy recomputation
    from the raw embeddings (same integer-sum centroid definition)."""
    import math

    import duckdb
    import numpy as np
    import ray.data

    from grawler_ray.functions.similarity import centroid_distances

    sf = "/root/testdata/sf0.001"
    got = (
        centroid_distances(ray.data.read_parquet(f"{sf}/embeddings.parquet"))
        .to_pandas()
        .sort_values(["label_a", "label_b"])
        .reset_index(drop=True)
    )
    df = duckdb.sql(
        f"SELECT label, embedding FROM '{sf}/embeddings.parquet'"
    ).df()
    V = np.stack(df["embedding"].to_numpy())
    S = np.floor(V * 1e6).astype(np.int64)
    labels = sorted(df["label"].unique())
    sums = {
        int(g): [int(x) for x in S[df["label"].to_numpy() == g].sum(axis=0)]
        for g in labels
    }
    ns = {int(g): int((df["label"] == g).sum()) for g in labels}
    rows = []
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            num = sum(
                (x * ns[b] - y * ns[a]) ** 2
                for x, y in zip(sums[int(a)], sums[int(b)])
            )
            den = (ns[a] * ns[b]) ** 2
            rows.append(
                (
                    int(a),
                    int(b),
                    math.floor(
                        float(num) / float(den) / (1e6 * 1e6) * 1e6 + 0.5
                    ),
                )
            )
    assert [tuple(r) for r in got.itertuples(index=False)] == rows
    assert (got["d2_micro"] >= 0).all()
