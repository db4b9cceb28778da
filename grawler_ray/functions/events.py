"""Event-stream operators: gap sessionization, rolling-window aggregates,
time-bucket aggregates, JSON property extraction.

The reference has no event processing (it is a crawler); these are the
windowed / streaming-flavored operators a training-data pipeline needs
(brief: "windowed aggregate" as a custom operator class), expressed
Ray-Data-first:

- per-key ordered windows = ``groupby(key).map_groups`` with a vectorized
  pandas/numpy kernel inside (the partitioning assumption: one user's
  events fit one group — keys are users, not hosts, so no skew pathology);
- time buckets and JSON extraction are stateless ``map_batches``;
- every float aggregate is integer-scaled (cents) so the DuckDB oracle
  compares bit-exactly.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US_PER_HOUR = 3_600_000_000


def sessionize(events_ds, gap_minutes: int = 30):
    """Gap-based sessions per user: a new session starts when the time since
    the previous event (ts order, event_id tiebreak) exceeds the gap.
    Output (event_id, user_id, session_id) with session_id 0-based per user.
    """
    gap_us = gap_minutes * 60_000_000

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        # unit-explicit epoch µs (pandas may carry ns OR µs precision)
        ts = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        breaks = np.diff(ts) > gap_us
        sess = np.concatenate(([0], np.cumsum(breaks))).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "session_id": sess,
            }
        )

    return events_ds.groupby("user_id").map_groups(fn, batch_format="pandas")


def rolling_sum(events_ds, window: int = 4):
    """Rolling aggregate per user in (ts, event_id) order: sum of the
    integer-scaled ``value`` over the last ``window`` rows (ROWS window,
    current row inclusive).  Output (event_id, user_id, roll_cents)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(cents)))
        n = len(cents)
        lo = np.maximum(np.arange(n) - window + 1, 0)
        roll = csum[1:] - csum[lo]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "roll_cents": roll,
            }
        )

    return events_ds.groupby("user_id").map_groups(fn, batch_format="pandas")


def hourly_agg(events_ds):
    """Time-bucket aggregate: events per (event_type, epoch hour) with count
    and exact cents sum.  Bucket = epoch_us // 3600e6 as int64 (no timestamp
    round-tripping through comparers)."""
    from ray.data.aggregate import Count, Sum

    def bucket(t: pa.Table) -> pa.Table:
        # normalize the unit BEFORE the int cast (sources differ: parquet
        # carries us, from_items/pandas carries ns), then tz-safe epoch µs
        us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        hour = pc.divide(us, US_PER_HOUR)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("value"), 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": pc.cast(hour, pa.int64()),
                "cents": cents,
            }
        )

    return (
        events_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
    )


def json_prop(events_ds, key: str = "k"):
    """Scalar JSON extraction (§2.8 json): props[key] as int64 (null when
    missing/invalid)."""

    def fn(t: pa.Table) -> pa.Table:
        vals = []
        for s in t.column("props").to_pylist():
            try:
                v = json.loads(s).get(key)
                vals.append(int(v) if v is not None else None)
            except (ValueError, TypeError, AttributeError):
                vals.append(None)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "k": pa.array(vals, pa.int64()),
            }
        )

    return events_ds.map_batches(fn, batch_format="pyarrow")
