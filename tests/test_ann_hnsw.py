"""Sharded HNSW ANN (grawler_ray/functions/similarity.py: _HNSW +
ann_hnsw_topk).  The serial graph is checked for recall vs brute force,
structural invariants (degree caps, full layer-0 membership, entry-point
consistency) and determinism; the Ray operator is checked for recall vs
the exact distributed plan and for shard-count robustness (shards >
vectors, single shard)."""

import numpy as np
import pytest

from grawler_ray.functions.similarity import _HNSW, ann_hnsw_topk


def _clustered(n=400, dim=32, centers=10, seed=11):
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((centers, dim)) * 3
    return [
        {
            "vec_id": i,
            "embedding": (C[i % centers] + 0.3 * rng.standard_normal(dim)).tolist(),
        }
        for i in range(n)
    ]


def _build(items, M=8, efc=64, seed=5):
    dim = len(items[0]["embedding"])
    g = _HNSW(dim, M=M, ef_construction=efc, seed=seed)
    for it in items:
        g.add(it["vec_id"], np.array(it["embedding"]))
    return g


class TestSerialGraph:
    def test_recall_vs_brute_force(self):
        items = _clustered(n=1000)
        g = _build(items)
        X = np.array([it["embedding"] for it in items])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        rng = np.random.default_rng(0)
        hits = tot = 0
        for qi in rng.choice(len(items), 40, replace=False):
            true = set(np.argsort(-(Xn @ Xn[qi]))[:10].tolist())
            got = set(v for _, v in g.search(X[qi], 10, ef=64))
            hits += len(true & got)
            tot += 10
        assert hits / tot >= 0.95, hits / tot

    def test_structural_invariants(self):
        items = _clustered(n=600)
        g = _build(items, M=6)
        assert g.n == 600
        # every node has a layer-0 adjacency list; degree caps hold
        for node in range(g.n):
            assert len(g.links[node]) == g.levels[node] + 1
            for ly, ls in enumerate(g.links[node]):
                cap = g.maxM0 if ly == 0 else g.M
                assert len(ls) <= cap
                assert all(0 <= nb < g.n and nb != node for nb in ls)
        # entry point lives at the max level
        assert g.levels[g.entry] == g.max_level
        # layer-0 graph is connected enough to reach everything from the
        # entry (greedy searches depend on it): BFS over layer 0
        seen = {g.entry}
        frontier = [g.entry]
        while frontier:
            nxt = []
            for nd in frontier:
                for nb in g.links[nd][0]:
                    if nb not in seen:
                        seen.add(nb)
                        nxt.append(nb)
            frontier = nxt
        assert len(seen) >= 0.99 * g.n  # heuristic pruning may orphan ~0

    def test_deterministic_given_seed(self):
        items = _clustered(n=300)
        a, b = _build(items, seed=9), _build(items, seed=9)
        q = np.array(items[7]["embedding"])
        assert a.search(q, 10) == b.search(q, 10)
        assert a.levels == b.levels

    def test_ef_monotone_recall(self):
        items = _clustered(n=800)
        g = _build(items)
        X = np.array([it["embedding"] for it in items])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        rng = np.random.default_rng(2)
        qs = rng.choice(len(items), 30, replace=False)

        def recall(ef):
            h = 0
            for qi in qs:
                true = set(np.argsort(-(Xn @ Xn[qi]))[:10].tolist())
                h += len(true & set(v for _, v in g.search(X[qi], 10, ef=ef)))
            return h / (10 * len(qs))

        assert recall(128) >= recall(8) - 0.02  # monotone within noise

    def test_tiny_graphs(self):
        g = _HNSW(4, M=4, seed=1)
        assert g.search(np.ones(4), 5) == []
        g.add(42, np.array([1.0, 0, 0, 0]))
        assert [v for _, v in g.search(np.array([1.0, 0, 0, 0]), 5)] == [42]
        g.add(43, np.array([0, 1.0, 0, 0]))
        got = g.search(np.array([1.0, 0.1, 0, 0]), 5)
        assert [v for _, v in got] == [42, 43]


class TestShardedOperator:
    def test_recall_vs_exact_plan(self, ray_session):
        import ray.data

        from grawler_ray.functions.similarity import ann_topk

        items = _clustered(n=500)
        ds = ray.data.from_items(items)
        qids = [0, 1, 2, 3, 4]
        exact = ann_topk(ds, qids, k=10).to_pandas()
        approx = ann_hnsw_topk(ds, qids, k=10, shards=4).to_pandas()
        ex = set(map(tuple, exact[["query_id", "vec_id"]].values))
        ap = set(map(tuple, approx[["query_id", "vec_id"]].values))
        assert len(ex & ap) / len(ex) >= 0.9
        # schema contract shared by every ANN plan
        assert list(approx.columns) == ["query_id", "rank", "vec_id"]
        assert (approx.groupby("query_id")["rank"].max() == 10).all()

    def test_more_shards_than_vectors(self, ray_session):
        import ray.data

        items = _clustered(n=12)
        ds = ray.data.from_items(items)
        out = ann_hnsw_topk(ds, [0, 1], k=5, shards=32).to_pandas()
        assert set(out.query_id) == {0, 1}
        assert (out.groupby("query_id")["rank"].max() == 5).all()
        assert not ((out.query_id == out.vec_id).any())  # self excluded

    def test_single_shard_matches_serial(self, ray_session):
        import ray.data

        items = _clustered(n=200)
        ds = ray.data.from_items(items)
        out = ann_hnsw_topk(
            ds, [3], k=10, shards=1, M=8, ef_construction=64, seed=7
        ).to_pandas()
        g = _HNSW(32, M=8, ef_construction=64, seed=7 * 1009 + 0)
        # the operator sorts each group by vec_id before inserting
        for it in sorted(items, key=lambda d: d["vec_id"]):
            g.add(it["vec_id"], np.array(it["embedding"]))
        serial = [v for _, v in g.search(np.array(items[3]["embedding"]), 11, ef=64)]
        serial = [v for v in serial if v != 3][:10]
        assert list(out.sort_values("rank")["vec_id"]) == serial


class TestPersistedIndex:
    DIR = "/tmp/gr_hnsw_index"

    def test_build_query_update_cycle(self, ray_session):
        import os
        import shutil

        import ray.data

        from grawler_ray.functions.similarity import (
            ann_hnsw_indexed_topk,
            ann_topk,
            build_hnsw_index,
            update_hnsw_index,
        )

        items = _clustered(n=400)
        old = [it for it in items if it["vec_id"] < 320]
        new = [it for it in items if it["vec_id"] >= 320]
        shutil.rmtree(self.DIR, ignore_errors=True)
        meta = build_hnsw_index(ray.data.from_items(old), self.DIR, shards=4)
        assert meta["rows"] == 320
        assert sorted(os.listdir(self.DIR)) == [
            "meta.json", "shard=0.npz", "shard=1.npz", "shard=2.npz", "shard=3.npz"
        ]

        qids = [0, 1, 2]
        Q = np.array([items[q]["embedding"] for q in qids])
        exact = ann_topk(ray.data.from_items(old), qids, k=10).to_pandas()
        got = ann_hnsw_indexed_topk(self.DIR, qids, Q, k=10).to_pandas()
        ex = set(map(tuple, exact[["query_id", "vec_id"]].values))
        ap = set(map(tuple, got[["query_id", "vec_id"]].values))
        assert len(ex & ap) / len(ex) >= 0.9

        meta2 = update_hnsw_index(ray.data.from_items(new), self.DIR)
        assert meta2["rows"] == 400
        assert not any(f.endswith(".tmp.npz") for f in os.listdir(self.DIR))

        # post-append: results now equal the full-corpus exact plan
        exact_full = ann_topk(ray.data.from_items(items), qids, k=10).to_pandas()
        got2 = ann_hnsw_indexed_topk(self.DIR, qids, Q, k=10).to_pandas()
        exf = set(map(tuple, exact_full[["query_id", "vec_id"]].values))
        ap2 = set(map(tuple, got2[["query_id", "vec_id"]].values))
        assert len(exf & ap2) / len(exf) >= 0.9
        # appended ids are genuinely reachable
        assert any(v >= 320 for _, v in ap2)

    def test_serialization_roundtrip_exact(self):
        from grawler_ray.functions.similarity import (
            _hnsw_from_arrays,
            _hnsw_to_arrays,
        )

        items = _clustered(n=150)
        g = _build(items, seed=3)
        g2 = _hnsw_from_arrays(
            {k: np.asarray(v) for k, v in _hnsw_to_arrays(g).items()}, seed=3
        )
        assert g2.links == g.links and g2.ids == g.ids
        q = np.array(items[5]["embedding"])
        assert g.search(q, 10) == g2.search(q, 10)
        # the revived graph keeps accepting inserts
        g2.add(9999, np.ones(32))
        assert 9999 in [v for _, v in g2.search(np.ones(32), 3)]
