"""Bucket-partitioned ANN index (VERDICT r2 item 4): recall vs the exact
baseline, and the defining scale property — read volume proportional to the
PROBED buckets, not the corpus."""

import glob
import os
import shutil

import numpy as np
import pytest

INDEX_DIR = "/tmp/gr_ann_index"


def _clustered(n=400, dim=32, centers=10, seed=11):
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((centers, dim)) * 3
    return [
        {"vec_id": i, "embedding": (C[i % centers] + 0.3 * rng.standard_normal(dim)).tolist()}
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def index_ds(ray_session):
    import ray.data

    from grawler_ray.functions.similarity import build_ann_index

    items = _clustered()
    ds = ray.data.from_items(items)
    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    meta = build_ann_index(ds, INDEX_DIR, nbits=12, seed=3)
    return ds, items, meta


def test_index_layout_and_meta(index_ds):
    ds, items, meta = index_ds
    assert meta["rows"] == len(items)
    assert meta["dim"] == 32
    dirs = glob.glob(os.path.join(INDEX_DIR, "bucket=*"))
    assert len(dirs) == meta["n_buckets"] > 1
    assert os.path.exists(os.path.join(INDEX_DIR, "meta.json"))


def test_indexed_recall_vs_exact(index_ds):
    from grawler_ray.functions.similarity import ann_indexed_topk, ann_topk

    ds, items, meta = index_ds
    qids = [0, 1, 2, 3, 4]
    Q = np.array([items[q]["embedding"] for q in qids], dtype=np.float64)
    exact = ann_topk(ds, qids, k=10).to_pandas()
    approx = ann_indexed_topk(INDEX_DIR, qids, Q, k=10, multiprobe=2).to_pandas()
    ex = set(map(tuple, exact[["query_id", "vec_id"]].values))
    ap = set(map(tuple, approx[["query_id", "vec_id"]].values))
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, recall


def test_read_volume_proportional_to_probes(index_ds):
    """The point of the index: a probe reads a strict subset of the bucket
    partitions — file count AND bytes — instead of scanning the corpus."""
    from grawler_ray.functions.similarity import ann_index_probe_paths

    ds, items, meta = index_ds
    Q = np.array([items[0]["embedding"]], dtype=np.float64)
    paths, probes = ann_index_probe_paths(INDEX_DIR, Q, multiprobe=1)
    all_dirs = glob.glob(os.path.join(INDEX_DIR, "bucket=*"))
    assert 0 < len(paths) < len(all_dirs)
    # probe set for multiprobe=1 over nbits=12 is 13 buckets; only the ones
    # that exist on disk are read
    assert len(paths) <= 13

    def _bytes(dirs):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d in dirs
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert _bytes(paths) < _bytes(all_dirs)


def test_indexed_equals_lsh_on_same_probes(index_ds):
    """The indexed variant and the scan variant implement the SAME probe
    math: identical (nbits, seed, multiprobe) must give identical results."""
    from grawler_ray.functions.similarity import ann_indexed_topk, ann_lsh_topk

    ds, items, meta = index_ds
    qids = [0, 1, 2, 3, 4]
    Q = np.array([items[q]["embedding"] for q in qids], dtype=np.float64)
    scan = ann_lsh_topk(ds, qids, k=10, nbits=12, seed=3, multiprobe=2).to_pandas()
    idx = ann_indexed_topk(INDEX_DIR, qids, Q, k=10, multiprobe=2).to_pandas()
    scan = scan.sort_values(["query_id", "rank"]).reset_index(drop=True)
    idx = idx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert scan.equals(idx)


IVF_DIR = "/tmp/gr_ivf_index"


@pytest.fixture(scope="module")
def ivf_index(index_ds):
    from grawler_ray.functions.similarity import build_ivf_index

    ds, items, _ = index_ds
    meta = build_ivf_index(ds, IVF_DIR, k=16, iters=5, seed=3)
    return ds, items, meta


def test_ivf_layout_and_meta(ivf_index):
    ds, items, meta = ivf_index
    assert meta["rows"] == len(items)
    dirs = glob.glob(os.path.join(IVF_DIR, "list=*"))
    assert len(dirs) == meta["n_lists"] > 1
    assert len(meta["centroids"]) == 16


def test_ivf_recall_vs_exact(ivf_index):
    """Clustered data, nprobe=4 of 16 lists: the true neighbors live in the
    query's own cluster list, so recall should be near-perfect."""
    from grawler_ray.functions.similarity import ann_ivf_topk, ann_topk

    ds, items, meta = ivf_index
    qids = [0, 1, 2, 3, 4]
    Q = np.array([items[q]["embedding"] for q in qids], dtype=np.float64)
    exact = ann_topk(ds, qids, k=10).to_pandas()
    approx = ann_ivf_topk(IVF_DIR, qids, Q, k=10, nprobe=4).to_pandas()
    ex = set(map(tuple, exact[["query_id", "vec_id"]].values))
    ap = set(map(tuple, approx[["query_id", "vec_id"]].values))
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, recall


def test_ivf_read_volume_proportional_to_probes(ivf_index):
    from grawler_ray.functions.similarity import ivf_probe_paths

    ds, items, meta = ivf_index
    Q = np.array([items[0]["embedding"]], dtype=np.float64)
    paths = ivf_probe_paths(IVF_DIR, Q, nprobe=2)
    all_dirs = glob.glob(os.path.join(IVF_DIR, "list=*"))
    assert 0 < len(paths) <= 2 < len(all_dirs)


def test_ivf_build_deterministic(ivf_index):
    """Same input + seed => identical centroids (resumable/rebuildable)."""
    import ray.data

    from grawler_ray.functions.similarity import build_ivf_index

    ds, items, meta = ivf_index
    meta2 = build_ivf_index(
        ray.data.from_items(items), "/tmp/gr_ivf_index2", k=16, iters=5, seed=3
    )
    assert meta["centroids"] == meta2["centroids"]


def test_ivf_update_append_and_reachability(index_ds, tmp_path, ray_session):
    """update_ivf_index: appended vectors must be probe-reachable (a
    planted near-identical neighbor becomes rank-1), existing answers
    survive, meta counts track, duplicate tags refused.  The quantizer is
    frozen, so pre-update probe paths are unchanged."""
    import ray.data

    from grawler_ray.functions.similarity import (
        ann_ivf_topk,
        build_ivf_index,
        ivf_probe_paths,
        update_ivf_index,
    )

    ds, items, _ = index_ds
    d = str(tmp_path / "ivf_upd")
    meta0 = build_ivf_index(ds, d, k=16, iters=5, seed=3)
    qids = [0, 1]
    Q = np.array([items[q]["embedding"] for q in qids], dtype=np.float64)
    before = ann_ivf_topk(d, qids, Q, k=5, nprobe=4).to_pandas()
    paths_before = ivf_probe_paths(d, Q, nprobe=4)

    # planted: near-identical to query 0, plus an unrelated far vector
    new = [
        {"vec_id": 9000,
         "embedding": (np.array(items[0]["embedding"]) + 0.001).tolist()},
        {"vec_id": 9001,
         "embedding": (np.array(items[1]["embedding"]) * -50).tolist()},
    ]
    meta1 = update_ivf_index(ray.data.from_items(new), d, "inc1")
    assert meta1["rows"] == meta0["rows"] + 2
    assert meta1["updates"] == ["inc1"]
    assert ivf_probe_paths(d, Q, nprobe=4) == paths_before  # frozen quantizer

    after = ann_ivf_topk(d, qids, Q, k=5, nprobe=4).to_pandas()
    top1 = after[(after.query_id == 0) & (after["rank"] == 1)].vec_id.iloc[0]
    assert top1 == 9000  # appended near-dup wins
    # query 1's answers are unchanged (its appended vector is anti-aligned)
    b1 = before[before.query_id == 1].vec_id.tolist()
    a1 = after[after.query_id == 1].vec_id.tolist()
    assert a1 == b1

    with pytest.raises(ValueError, match="already applied"):
        update_ivf_index(ray.data.from_items(new), d, "inc1")
    with pytest.raises(Exception, match="dim"):
        update_ivf_index(
            ray.data.from_items([{"vec_id": 1, "embedding": [1.0, 2.0]}]), d, "inc2"
        )


def test_compact_ivf_index_preserves_answers(index_ds, tmp_path, ray_session):
    import glob as _glob

    import ray.data

    from grawler_ray.functions.similarity import (
        ann_ivf_topk,
        build_ivf_index,
        compact_ivf_index,
        update_ivf_index,
    )

    ds, items, _ = index_ds
    d = str(tmp_path / "ivf_c")
    build_ivf_index(ds, d, k=16, iters=5, seed=3)
    new = [{"vec_id": 9000 + i,
            "embedding": (np.array(items[i]["embedding"]) + 0.001).tolist()}
           for i in range(6)]
    update_ivf_index(ray.data.from_items(new), d, "inc1")
    qids = [0, 1, 2]
    Q = np.array([items[q]["embedding"] for q in qids], dtype=np.float64)

    def answers():
        df = ann_ivf_topk(d, qids, Q, k=5, nprobe=4).to_pandas()
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    before = answers()
    assert (before.vec_id >= 9000).any()  # appended vectors in play
    multi = [p for p in _glob.glob(f"{d}/list=*")
             if len(_glob.glob(p + "/*.parquet")) > 1]
    assert multi
    stats = compact_ivf_index(d)
    assert stats["compacted"] == len(multi)
    assert all(len(_glob.glob(p + "/*.parquet")) == 1
               for p in _glob.glob(f"{d}/list=*"))
    assert answers().equals(before)
