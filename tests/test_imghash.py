"""Image dHash near-duplication (grawler_ray/functions/imghash.py):
invariances (brightness shift, cross-format re-encode), planted-pair
recovery through the distributed Manku pairing, and EXACT plan
equality against a serial brute-force Hamming scan (the block plan is
pigeonhole-exact, not approximate)."""

import itertools

import numpy as np
import pytest

from grawler_ray.functions.imghash import (
    decode_any_image,
    dhash64,
    dhash_batch,
    image_dhash_pairs,
)

SF = "/root/testdata/sf0.001"


class TestHash:
    def _img(self, seed=0):
        rng = np.random.default_rng(seed)
        grid = rng.integers(20, 236, (8, 9)).astype(np.uint8)
        gray = np.kron(grid, np.ones((5, 6), np.uint8))
        return np.stack([gray, gray, gray], -1)

    def test_brightness_invariant(self):
        img = self._img()
        shifted = np.clip(img.astype(int) + 23, 0, 255).astype(np.uint8)
        assert dhash64(img) == dhash64(shifted)

    def test_cross_format_reencode_near(self):
        from grawler_ray.functions.jpeg import encode_jpeg
        from grawler_ray.functions.png import encode_png

        img = self._img(3)
        hp = dhash64(decode_any_image(encode_png(img)))
        hj = dhash64(decode_any_image(encode_jpeg(img, quality=90)))
        assert bin(hp ^ hj).count("1") <= 2

    def test_unrelated_far(self):
        assert bin(dhash64(self._img(1)) ^ dhash64(self._img(2))).count("1") > 10

    def test_gray_and_rgba(self):
        img = self._img(5)
        assert dhash64(img[:, :, 0]) == dhash64(img)  # identical channels
        rgba = np.concatenate([img, np.full(img.shape[:2] + (1,), 255, np.uint8)], -1)
        # alpha contributes to the channel mean but uniformly: signs hold
        assert bin(dhash64(rgba) ^ dhash64(img)).count("1") <= 2

    def test_corrupt_payloads_skipped(self):
        import pyarrow as pa

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([b"\x89PNG truncated", b"plain"], pa.binary()),
            }
        )
        assert dhash_batch(t).num_rows == 0


class TestDistributedPairs:
    def test_planted_recovery_and_brute_force_equality(self, ray_session):
        import ray.data

        from grawler_ray.stages.multimodal import (
            synth_near_dup_image,
            to_near_dup_image_batch,
        )

        ids = list(range(120))
        ds = ray.data.from_items([{"doc_id": i} for i in ids]).map_batches(
            to_near_dup_image_batch, batch_format="pyarrow"
        )
        got = image_dhash_pairs(ds, max_hamming=3).to_pandas()
        got_pairs = {
            (min(a, b), max(a, b), h)
            for a, b, h in zip(got.a, got.b, got.hamming)
        }
        # serial brute force over the same payloads = the exact answer
        hashes = {
            i: dhash64(decode_any_image(synth_near_dup_image(i))) for i in ids
        }
        want = set()
        for a, b in itertools.combinations(ids, 2):
            h = bin(hashes[a] ^ hashes[b]).count("1")
            if h <= 3:
                want.add((a, b, h))
        assert got_pairs == want
        # the planted (i-4, i) near-dups are all in there
        planted = {(i - 4, i) for i in ids if i % 5 == 4 and i >= 4}
        assert planted <= {(a, b) for a, b, _ in want}
