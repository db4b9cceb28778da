"""Unit tests for the sharded seen-set state (SURVEY §2.3 T1) — no Ray needed."""

import random

from grawler_ray.state.seen import CuckooFilter, SeenShard, shard_of
from grawler_ray.urlops import xxhash64


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=10_000)
    keys = [xxhash64(f"https://site{i}.test/page/{j}") for i in range(100) for j in range(100)]
    for k in keys:
        f.add(k)
    assert all(f.contains(k) for k in keys)


def test_cuckoo_low_false_positive_rate():
    f = CuckooFilter(capacity=10_000)
    for i in range(10_000):
        f.add(xxhash64(f"in:{i}"))
    rng = random.Random(7)
    fp = sum(f.contains(xxhash64(f"out:{rng.random()}")) for _ in range(20_000))
    assert fp / 20_000 < 0.01  # 16-bit fingerprints => ~2^-13 expected


def test_cuckoo_idempotent_add():
    f = CuckooFilter(capacity=100)
    h = xxhash64("x")
    f.add(h)
    c = f.count
    f.add(h)
    assert f.count == c


def test_cuckoo_serialization_roundtrip():
    f = CuckooFilter(capacity=1000)
    keys = [xxhash64(f"k{i}") for i in range(500)]
    for k in keys:
        f.add(k)
    g = CuckooFilter.from_bytes(f.to_bytes(), capacity=1000)
    assert all(g.contains(k) for k in keys if k not in f.overflow)


def test_seen_shard_exact_two_phase():
    s = SeenShard(mode="exact")
    keys = ["a", "b", "c"]
    hashes = [xxhash64(k) for k in keys]
    assert s.test_batch(keys, hashes) == [False, False, False]
    s.commit_batch(keys[:2], hashes[:2])
    assert s.test_batch(keys, hashes) == [True, True, False]
    # idempotent re-commit
    s.commit_batch(keys[:2], hashes[:2])
    assert s.test_batch(keys, hashes) == [True, True, False]


def test_seen_shard_cuckoo_mode():
    s = SeenShard(mode="cuckoo", capacity=1000)
    keys = [f"u{i}" for i in range(200)]
    hashes = [xxhash64(k) for k in keys]
    assert not any(s.test_batch(keys, hashes))
    s.commit_batch(keys, hashes)
    assert all(s.test_batch(keys, hashes))


def test_seen_shard_snapshot_restore():
    for mode in ("exact", "cuckoo"):
        s = SeenShard(mode=mode, capacity=1000)
        keys = [f"u{i}" for i in range(100)]
        hashes = [xxhash64(k) for k in keys]
        s.commit_batch(keys, hashes)
        snap = s.snapshot()
        r = SeenShard(mode=mode, capacity=1000)
        r.restore(snap)
        assert all(r.test_batch(keys, hashes)), mode


def test_shard_routing_stable():
    assert shard_of("https://a.com/x", 8) == xxhash64("https://a.com/x") % 8
