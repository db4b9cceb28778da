"""HyperLogLog + Misra-Gries sketches: error-bound guarantees in the
approximate regime, exactness in the degenerate regime, merge correctness
across many blocks."""

from collections import Counter

import numpy as np
import pandas as pd


def _docs_ds(ray_session, texts, parallelism=8):
    import ray.data

    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(parallelism)


class TestHll:
    def test_large_cardinality_error_bound(self, ray_session):
        from grawler_ray.functions.sketch import hll_distinct

        # 20k distinct tokens, each appearing 1-3x, spread over 16 blocks
        rng = np.random.default_rng(11)
        vocab = [f"tok{i}" for i in range(20_000)]
        stream = vocab * 2 + list(rng.choice(vocab, 10_000))
        rng.shuffle(stream)
        texts = [" ".join(stream[i::64]) for i in range(64)]

        def words(t):
            out = []
            for s in t.column("text").to_pylist():
                out.extend(s.split())
            return out

        est = hll_distinct(
            _docs_ds(ray_session, texts, 16), words, p=12
        ).to_pandas().estimate[0]
        # p=12 -> relative std err ~1.04/sqrt(4096) = 1.6%; allow 4 sigma
        assert abs(est - 20_000) / 20_000 < 0.065

    def test_small_range_linear_counting(self, ray_session):
        from grawler_ray.functions.sketch import hll_distinct

        texts = [f"a{i % 31}" for i in range(500)]

        def words(t):
            return [s for s in t.column("text").to_pylist()]

        est = hll_distinct(
            _docs_ds(ray_session, texts), words, p=12
        ).to_pandas().estimate[0]
        assert est == 31  # linear counting is exact this far below m

    def test_merge_equals_single_pass(self):
        from grawler_ray.functions.sketch import _hll_partial

        vals = [f"v{i}" for i in range(5_000)]
        whole = _hll_partial(vals, 12)
        merged = np.maximum(_hll_partial(vals[:2_000], 12),
                            _hll_partial(vals[2_000:], 12))
        assert (whole == merged).all()


class TestMisraGries:
    def test_exact_when_capacity_covers_vocab(self, ray_session):
        from grawler_ray.functions.sketch import topk_words_sketch

        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(200)]
        texts = [" ".join(rng.choice(vocab, 50)) for _ in range(100)]
        got = topk_words_sketch(
            _docs_ds(ray_session, texts), k=50, capacity=4096
        ).to_pandas()
        exact = Counter(" ".join(texts).split())
        exp = (
            pd.DataFrame(exact.items(), columns=["word", "est_count"])
            .sort_values(["est_count", "word"], ascending=[False, True])
            .head(50)
            .reset_index(drop=True)
        )
        exp["rank"] = np.arange(1, len(exp) + 1, dtype=np.int64)
        pd.testing.assert_frame_equal(
            got, exp, check_dtype=False
        )

    def test_heavy_hitters_survive_small_capacity(self, ray_session):
        from grawler_ray.functions.sketch import topk_words_sketch

        rng = np.random.default_rng(9)
        # 5k-word noise vocabulary + 10 planted heavy hitters
        noise = [f"n{i}" for i in range(5_000)]
        stream = list(rng.choice(noise, 40_000))
        for j in range(10):
            stream += [f"hot{j}"] * 2_000
        rng.shuffle(stream)
        texts = [" ".join(stream[i::32]) for i in range(32)]
        got = topk_words_sketch(
            _docs_ds(ray_session, texts, 8), k=20, capacity=512
        ).to_pandas()
        n = len(stream)
        exact = Counter(stream)
        # every word with true count >= 2N/capacity must surface, with
        # est_count a lower bound within the additive MG error
        hot = set(got.word)
        for j in range(10):
            w = f"hot{j}"
            assert w in hot, f"{w} missing from sketch top-k"
            est = int(got.set_index("word").loc[w, "est_count"])
            assert est <= exact[w]
            assert exact[w] - est <= 2 * n / 512


class TestCountMin:
    def _docs(self):
        import ray.data

        # known exact counts: a=7, b=4, c=1  (across 3 docs/batches)
        return ray.data.from_items(
            [
                {"text": "a a a b"},
                {"text": "a b b c"},
                {"text": "a a a b"},
            ]
        )

    def test_exact_in_wide_regime(self, ray_session):
        from grawler_ray.functions.sketch import countmin_words

        out = countmin_words(
            self._docs(), query_words=("a", "b", "c", "zzz"), width=1 << 16
        ).to_pandas()
        got = dict(zip(out.word, out.est_count))
        # width >> distinct values: no collisions, estimates are exact
        assert got == {"a": 7, "b": 4, "c": 1, "zzz": 0}

    def test_overestimate_only_when_narrow(self, ray_session):
        from grawler_ray.functions.sketch import countmin_words

        # width 4 forces collisions: estimates may inflate, never deflate
        out = countmin_words(
            self._docs(), query_words=("a", "b", "c"), width=64, depth=2
        ).to_pandas()
        got = dict(zip(out.word, out.est_count))
        true = {"a": 7, "b": 4, "c": 1}
        for w, t in true.items():
            assert got[w] >= t


class TestQDigest:
    def test_exact_regime_matches_lower_quantile(self, ray_session):
        import ray.data

        from grawler_ray.functions.sketch import quantile_sketch

        rng = np.random.default_rng(5)
        vals = rng.integers(0, 50_000, 3000)
        ds = ray.data.from_items(
            [{"n": int(v)} for v in vals]
        ).repartition(8)
        got = quantile_sketch(ds, "n", k=10**9).to_pandas()
        sv = np.sort(vals)
        for _, r in got.iterrows():
            rank = (len(sv) * r.q_pct + 99) // 100
            assert r.est_value == sv[max(rank - 1, 0)]
            assert r.n == len(sv)

    def test_compressed_error_bound_and_merge(self, ray_session):
        import ray.data

        from grawler_ray.functions.sketch import quantile_sketch

        # skewed data over many blocks: rank error of every answered
        # quantile must stay within the q-digest bound (log2(U)/k per
        # compression; we allow 3x for the merge-tree additivity)
        rng = np.random.default_rng(17)
        vals = np.concatenate(
            [rng.integers(0, 200, 20_000), rng.integers(0, 800_000, 20_000)]
        )
        rng.shuffle(vals)
        k, log_u = 256, 20
        ds = ray.data.from_items([{"n": int(v)} for v in vals]).repartition(16)
        got = quantile_sketch(ds, "n", q_pcts=(1, 25, 50, 75, 99), k=k, log_u=log_u).to_pandas()
        sv = np.sort(vals)
        n = len(sv)
        for _, r in got.iterrows():
            rank_est = np.searchsorted(sv, r.est_value, side="right")
            rank_true = (n * r.q_pct + 99) // 100
            assert abs(rank_est - rank_true) / n <= 3 * log_u / k, (
                r.q_pct, rank_est, rank_true)

    def test_digest_size_bounded(self):
        from grawler_ray.functions.sketch import _qdigest_partial

        rng = np.random.default_rng(23)
        vals = rng.integers(0, 1 << 20, 100_000)
        d = _qdigest_partial(vals, 128, 20)
        assert len(d) <= 3 * 128


class TestGroupedQDigest:
    def test_exact_regime_per_group(self, ray_session):
        import ray.data

        from grawler_ray.functions.sketch import grouped_quantile_sketch

        rng = np.random.default_rng(7)
        rows = []
        sizes = {"a": 900, "b": 300, "c": 17}
        for g, sz in sizes.items():
            for v in rng.integers(0, 10_000, sz):
                rows.append({"g": g, "n": int(v)})
        rng.shuffle(rows)
        ds = ray.data.from_items(rows).repartition(8)
        got = grouped_quantile_sketch(ds, "g", "n", k=10**9).to_pandas()
        assert len(got) == 3 * 3
        by_g = {g: np.sort([r["n"] for r in rows if r["g"] == g]) for g in sizes}
        for _, r in got.iterrows():
            sv = by_g[r.g]
            rank = (len(sv) * r.q_pct + 99) // 100
            assert r.est_value == sv[max(rank - 1, 0)], (r.g, r.q_pct)
            assert r.n == len(sv)

    def test_compressed_error_bound_per_group(self, ray_session):
        import ray.data

        from grawler_ray.functions.sketch import grouped_quantile_sketch

        rng = np.random.default_rng(19)
        k, log_u = 128, 20
        vals = {"x": rng.integers(0, 700_000, 30_000),
                "y": rng.integers(0, 5_000, 8_000)}
        rows = [{"g": g, "n": int(v)} for g, arr in vals.items() for v in arr]
        rng.shuffle(rows)
        ds = ray.data.from_items(rows).repartition(16)
        got = grouped_quantile_sketch(ds, "g", "n", k=k, log_u=log_u).to_pandas()
        for _, r in got.iterrows():
            sv = np.sort(vals[r.g])
            n = len(sv)
            rank_est = np.searchsorted(sv, r.est_value, side="right")
            rank_true = (n * r.q_pct + 99) // 100
            assert abs(rank_est - rank_true) / n <= 3 * log_u / k, (
                r.g, r.q_pct, rank_est, rank_true)


def test_qdigest_warns_on_out_of_universe_values():
    """Values outside [0, 2^log_u) are clipped; that must WARN (the SQL
    oracle does not clip, so silent clipping breaks the exact-regime
    guarantee — ADVICE r3)."""
    import warnings

    import numpy as np

    from grawler_ray.functions.sketch import _qdigest_partial

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _qdigest_partial(np.array([1, 5, 1 << 21], np.int64), k=64, log_u=20)
    assert any("q-digest" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _qdigest_partial(np.array([1, 5, 100], np.int64), k=64, log_u=20)
    assert not w
