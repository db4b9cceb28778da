"""The local correctness gate (tools/check_queries.py) must fail output-
representation divergences the way the driver's value hash does — the
round-3 asof_join escape was a pandas-nullable Int64 `<NA>` column passing
the old float-cast compare while failing the driver.  No Ray needed."""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo/tools")
from check_queries import compare  # noqa: E402


def test_identical_passes():
    a = pd.DataFrame({"x": [1, 2], "y": ["a", "b"]})
    assert compare("t", a, a.copy()) == []


def test_nullable_int_vs_float_nan_fails():
    """The exact round-3 asof_join divergence: values equal, repr not."""
    ray_side = pd.DataFrame(
        {"event_id": [1, 2], "m": pd.array([947, None], dtype="Int64")}
    )
    oracle_side = pd.DataFrame({"event_id": [1, 2], "m": [947.0, float("nan")]})
    problems = compare("t", ray_side, oracle_side)
    assert problems and "dtype kind" in problems[0]


def test_int_vs_float_nonnull_fails():
    a = pd.DataFrame({"x": [947]})
    b = pd.DataFrame({"x": [947.0]})
    assert compare("t", a, b)


def test_uint_vs_int_same_family_passes():
    a = pd.DataFrame({"x": np.array([1, 2], np.uint64)})
    b = pd.DataFrame({"x": np.array([1, 2], np.int64)})
    assert compare("t", a, b) == []


def test_null_mask_divergence_fails():
    a = pd.DataFrame({"x": [1.0, float("nan")]})
    b = pd.DataFrame({"x": [1.0, 0.0]})
    assert compare("t", a, b)


def test_value_divergence_fails():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1, 3]})
    assert compare("t", a, b) == ["values differ in column x"]


def test_float_bitexact_required():
    a = pd.DataFrame({"x": [0.1 + 0.2]})
    b = pd.DataFrame({"x": [0.3]})
    assert compare("t", a, b)  # 0.30000000000000004 != 0.3 — driver would fail too


def test_rowcount_and_columns():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1]})
    assert any("rowcount" in p for p in compare("t", a, b))
    c = pd.DataFrame({"y": [1, 2]})
    assert any("columns" in p for p in compare("t", a, c))
