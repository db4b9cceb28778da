"""Event-stream operators: sessionize gap edges, rolling window math,
hourly buckets, JSON extraction nulls."""

import datetime as dt

import pytest


def _events(ray_session):
    import ray.data

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap of 40min between e2 and e3)
        {"event_id": 1, "user_id": 1, "ts": t0, "event_type": "view", "value": 1.0, "props": '{"k": 5}'},
        {"event_id": 2, "user_id": 1, "ts": t0 + dt.timedelta(minutes=10), "event_type": "click", "value": 2.005, "props": '{"k": 6}'},
        {"event_id": 3, "user_id": 1, "ts": t0 + dt.timedelta(minutes=50), "event_type": "view", "value": 3.0, "props": "{}"},
        # user 2: one event, bad json
        {"event_id": 4, "user_id": 2, "ts": t0 + dt.timedelta(hours=2), "event_type": "view", "value": 0.4, "props": "not json"},
        # user 1: exactly-at-gap boundary (30min after e3 -> same session)
        {"event_id": 5, "user_id": 1, "ts": t0 + dt.timedelta(minutes=80), "event_type": "view", "value": 4.0, "props": '{"k": null}'},
    ]
    return ray.data.from_items(rows)


def test_sessionize(ray_session):
    from grawler_ray.functions.events import sessionize

    out = sessionize(_events(ray_session), gap_minutes=30).to_pandas()
    sess = dict(zip(out.event_id, out.session_id))
    assert sess[1] == 0 and sess[2] == 0          # 10min gap: same session
    assert sess[3] == 1                            # 40min gap: new session
    assert sess[5] == 1                            # exactly 30min: NOT > gap
    assert sess[4] == 0                            # other user starts at 0


def test_rolling_sum(ray_session):
    from grawler_ray.functions.events import rolling_sum

    out = rolling_sum(_events(ray_session), window=2).to_pandas()
    roll = dict(zip(out.event_id, out.roll_cents))
    assert roll[1] == 100
    assert roll[2] == 100 + 201  # 2.005 -> 201 cents (floor(x*100+0.5))
    assert roll[3] == 201 + 300  # window=2: only previous + current
    assert roll[4] == 40


def test_rolling_median_hand_fixture(ray_session):
    from grawler_ray.functions.events import rolling_median

    out = rolling_median(_events(ray_session), window=2).to_pandas()
    med = dict(zip(out.event_id, out.med_cents))
    assert med[1] == 100.0                 # window of one
    assert med[2] == (100 + 201) / 2.0     # even window interpolates: 150.5
    assert med[3] == (201 + 300) / 2.0
    assert med[5] == (300 + 400) / 2.0
    assert med[4] == 40.0                  # other user: run start clamps


def test_rolling_median_random_vs_bruteforce(ray_session):
    """Fixed-seed multi-user stream at windows 1/3/4 vs a per-row Python
    brute force (sort the true trailing slice, interpolate middles)."""
    import numpy as np
    import ray.data

    rng = np.random.default_rng(11)
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for eid in range(300):
        rows.append(
            {
                "event_id": eid,
                "user_id": int(rng.integers(0, 12)),
                "ts": t0 + dt.timedelta(seconds=int(rng.integers(0, 5000))),
                "event_type": "view",
                "value": float(np.round(rng.uniform(0, 50), 3)),
                "props": "{}",
            }
        )
    ds = ray.data.from_items(rows).repartition(4)
    from grawler_ray.functions.events import rolling_median

    for w in (1, 3, 4):
        got = rolling_median(ds, window=w).to_pandas()
        med = dict(zip(got.event_id, got.med_cents))
        # brute force
        per_user: dict[int, list] = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            hist = per_user.setdefault(r["user_id"], [])
            hist.append((r["event_id"], int(np.floor(r["value"] * 100.0 + 0.5))))
            win = sorted(c for _, c in hist[-w:])
            exp = (win[(len(win) - 1) // 2] + win[len(win) // 2]) / 2.0
            assert med[r["event_id"]] == exp, (w, r["event_id"])


def test_last_touch_attribution(ray_session):
    """Hand stream covering: touch before conversion, conversion with NO
    prior touch (null), touch AFTER conversion not counted, cross-user
    isolation, and the nullable-int representation invariant."""
    import numpy as np
    import pandas as pd
    import ray.data

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        {"event_id": 1, "user_id": 1, "ts": t0, "event_type": "view", "value": 0.0, "props": "{}"},
        {"event_id": 2, "user_id": 1, "ts": t0 + dt.timedelta(minutes=1), "event_type": "purchase", "value": 0.0, "props": "{}"},
        {"event_id": 3, "user_id": 1, "ts": t0 + dt.timedelta(minutes=2), "event_type": "click", "value": 0.0, "props": "{}"},
        {"event_id": 4, "user_id": 1, "ts": t0 + dt.timedelta(minutes=3), "event_type": "purchase", "value": 0.0, "props": "{}"},
        # user 2 converts FIRST (null), then touches, then converts again
        {"event_id": 5, "user_id": 2, "ts": t0, "event_type": "purchase", "value": 0.0, "props": "{}"},
        {"event_id": 6, "user_id": 2, "ts": t0 + dt.timedelta(minutes=1), "event_type": "signup", "value": 0.0, "props": "{}"},
        {"event_id": 7, "user_id": 2, "ts": t0 + dt.timedelta(minutes=2), "event_type": "view", "value": 0.0, "props": "{}"},
        {"event_id": 8, "user_id": 2, "ts": t0 + dt.timedelta(minutes=3), "event_type": "purchase", "value": 0.0, "props": "{}"},
    ]
    from grawler_ray.functions.events import last_touch_attribution

    out = last_touch_attribution(ray.data.from_items(rows).repartition(3)).to_pandas()
    assert len(out) == 4
    # nullable-int invariant: float64/NaN, never pandas-nullable Int64
    assert out["touch_event_id"].dtype.kind == "f"
    m = dict(zip(out.event_id, out.touch_event_id))
    assert m[2] == 1.0
    assert m[4] == 3.0          # latest touch wins
    assert pd.isna(m[5])        # converted before any touch
    assert m[8] == 7.0          # signup is not a touch type
    assert np.isnan(m[5])


def test_cumulative_distinct_types(ray_session):
    """Hand fixture + fixed-seed random stream vs per-row brute force."""
    import numpy as np
    import ray.data

    from grawler_ray.functions.events import cumulative_distinct_types

    out = cumulative_distinct_types(_events(ray_session)).to_pandas()
    m = dict(zip(out.event_id, out.n_distinct_types))
    # user 1: view, click, view, view -> 1, 2, 2, 2; user 2: 1
    assert (m[1], m[2], m[3], m[5]) == (1, 2, 2, 2)
    assert m[4] == 1

    rng = np.random.default_rng(5)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        {
            "event_id": eid,
            "user_id": int(rng.integers(0, 9)),
            "ts": t0 + dt.timedelta(seconds=int(rng.integers(0, 3000))),
            "event_type": str(rng.choice(["a", "b", "c", "d", "e"])),
            "value": 0.0,
            "props": "{}",
        }
        for eid in range(250)
    ]
    got = cumulative_distinct_types(
        ray.data.from_items(rows).repartition(4)
    ).to_pandas()
    gm = dict(zip(got.event_id, got.n_distinct_types))
    seen: dict[int, set] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        s = seen.setdefault(r["user_id"], set())
        s.add(r["event_type"])
        assert gm[r["event_id"]] == len(s), r["event_id"]


def test_rolling_distinct_types(ray_session):
    """Hand fixture + fixed-seed random stream vs trailing-slice brute
    force at windows 1/2/5."""
    import numpy as np
    import ray.data

    from grawler_ray.functions.events import rolling_distinct_types

    out = rolling_distinct_types(_events(ray_session), window=2).to_pandas()
    m = dict(zip(out.event_id, out.n_distinct))
    # user 1 types: view, click, view, view -> w2: 1, 2, 2, 1
    assert (m[1], m[2], m[3], m[5]) == (1, 2, 2, 1)
    assert m[4] == 1

    rng = np.random.default_rng(23)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        {
            "event_id": eid,
            "user_id": int(rng.integers(0, 8)),
            "ts": t0 + dt.timedelta(seconds=int(rng.integers(0, 2000))),
            "event_type": str(rng.choice(["a", "b", "c", "d"])),
            "value": 0.0,
            "props": "{}",
        }
        for eid in range(220)
    ]
    ds = ray.data.from_items(rows).repartition(4)
    for w in (1, 2, 5):
        got = rolling_distinct_types(ds, window=w).to_pandas()
        gm = dict(zip(got.event_id, got.n_distinct))
        hist: dict[int, list] = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            h = hist.setdefault(r["user_id"], [])
            h.append(r["event_type"])
            assert gm[r["event_id"]] == len(set(h[-w:])), (w, r["event_id"])


def test_hourly_agg(ray_session):
    from grawler_ray.functions.events import hourly_agg

    out = hourly_agg(_events(ray_session)).to_pandas()
    h0 = dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp() // 3600
    views_h1 = out[(out.event_type == "view") & (out.hour == int(h0) + 1)]
    assert views_h1.n.iloc[0] == 1 and views_h1.sum_cents.iloc[0] == 400


def test_json_prop(ray_session):
    from grawler_ray.functions.events import json_prop

    out = json_prop(_events(ray_session), key="k").to_pandas()
    k = dict(zip(out.event_id, out.k))
    assert k[1] == 5 and k[2] == 6
    assert all(k[i] is None or k[i] != k[i] for i in (3, 4, 5)) or True
    import pandas as pd

    assert pd.isna(k[3]) and pd.isna(k[4]) and pd.isna(k[5])


def test_event_deltas(ray_session):
    from grawler_ray.functions.events import event_deltas

    out = event_deltas(_events(None)).to_pandas()
    d = dict(zip(out.event_id, out.delta_cents))
    assert pd_isna(d[1])               # user 1 first event
    assert d[2] == 201 - 100           # 2.005 -> 201 cents
    assert d[3] == 300 - 201
    assert d[5] == 400 - 300
    assert pd_isna(d[4])               # user 2 first event


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_funnel_counts(ray_session):
    import datetime as dtm

    import ray.data

    from grawler_ray.functions.events import funnel_counts

    t0 = dtm.datetime(2024, 1, 1)

    def ev(eid, uid, mins, typ):
        return {"event_id": eid, "user_id": uid, "ts": t0 + dtm.timedelta(minutes=mins),
                "event_type": typ, "value": 1.0, "props": "{}"}

    rows = [
        # user 1: full ordered funnel
        ev(1, 1, 0, "view"), ev(2, 1, 5, "click"), ev(3, 1, 9, "purchase"),
        # user 2: click BEFORE view -> funnel stops after step 1
        ev(4, 2, 0, "click"), ev(5, 2, 5, "view"),
        # user 3: view + click at the SAME ts -> tie does not advance
        ev(6, 3, 0, "view"), ev(7, 3, 0, "click"),
        # user 4: purchase only -> no step 1
        ev(8, 4, 0, "purchase"),
    ]
    out = funnel_counts(ray.data.from_items(rows)).to_pandas()
    assert out.n_step1.iloc[0] == 3      # users 1, 2, 3 viewed
    assert out.n_step2.iloc[0] == 1      # only user 1 clicked after viewing
    assert out.n_step3.iloc[0] == 1


def test_grouped_running_sum_planted(ray_session):
    """Cumulative window rebased per group, (order, tie) sort inside."""
    import numpy as np
    import pandas as pd
    import ray.data

    from grawler_ray.functions.events import grouped_running_sum

    df = pd.DataFrame(
        {
            "g": np.array([1, 1, 1, 2, 2, 7], np.int64),
            "o": np.array([5, 3, 3, 1, 2, 9], np.int64),
            "tie": np.array([10, 11, 12, 13, 14, 15], np.int64),
            "v": np.array([100, 20, 3, 7, 40, 500], np.int64),
        }
    )
    out = (
        grouped_running_sum(
            ray.data.from_pandas(df).repartition(2),
            group_col="g", order_col="o", tie_col="tie", value_col="v",
        )
        .to_pandas()
        .set_index("tie")
        .sort_index()
    )
    # g=1 order: (3,11)=20, (3,12)=23, (5,10)=123; g=2: 7 then 47; g=7: 500
    assert out.loc[11, "cum"] == 20 and out.loc[12, "cum"] == 23
    assert out.loc[10, "cum"] == 123
    assert out.loc[13, "cum"] == 7 and out.loc[14, "cum"] == 47
    assert out.loc[15, "cum"] == 500
    assert (out["g"].to_numpy() >= 1).all() and len(out) == 6


def test_transition_counts_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from grawler_ray.functions.events import transition_counts

    sf = "/root/testdata/sf0.001"
    got = (
        transition_counts(
            ray.data.read_parquet(
                f"{sf}/events.parquet",
                columns=["event_id", "ts", "user_id", "event_type"],
            )
        )
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT prev_type, next_type, count(*)::BIGINT AS n_transitions
        FROM (SELECT event_type AS prev_type,
                     lead(event_type) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                     ) AS next_type
              FROM '{sf}/events.parquet')
        WHERE next_type IS NOT NULL
        GROUP BY prev_type, next_type ORDER BY prev_type, next_type"""
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_transition_counts_single_user_chain(ray_session):
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.events import transition_counts

    t = pa.table(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pa.array([1, 2, 3, 4, 5], pa.timestamp("us")),
            "user_id": [7, 7, 7, 9, 9],
            "event_type": ["a", "b", "a", "a", "b"],
        }
    )
    got = (
        transition_counts(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    # user 7: a->b, b->a; user 9: a->b  (no cross-user 'a'->'a' pair)
    assert got.values.tolist() == [["a", "b", 2], ["b", "a", 1]]


def test_ewma_user_score_vs_serial_numpy(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from grawler_ray.functions.events import ewma_user_score

    sf = "/root/testdata/sf0.001"
    got = (
        ewma_user_score(
            ray.data.read_parquet(
                f"{sf}/events.parquet",
                columns=["event_id", "ts", "user_id", "value"],
            ),
            halflife_hours=24.0,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(
        f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    import numpy as np
    import pandas as pd

    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, sub in df.groupby("user_id", sort=True):
        ts = sub["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        cents = np.floor(sub["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        dt = ts[-1] - ts
        score = float(
            np.add.reduceat(
                cents.astype(np.float64)
                * np.exp2(-dt / (24.0 * 3_600_000_000)),
                [0],
            )[0]
        )
        rows.append(
            {
                "user_id": int(uid),
                "n_events": len(sub),
                "score_micro": int(np.floor(score * (1_000_000 / 100.0))),
            }
        )
    exp = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_ewma_decay_direction(ray_session):
    """An old burst decays; an identical recent burst doesn't."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.events import ewma_user_score

    H = 3_600_000_000
    t = pa.table(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pa.array([0, 48 * H, 0, H], pa.timestamp("us")),
            "user_id": [1, 1, 2, 2],
            "value": [100.0, 1.0, 100.0, 1.0],
        }
    )
    got = (
        ewma_user_score(ray.data.from_arrow(t), halflife_hours=24.0)
        .to_pandas()
        .set_index("user_id")["score_micro"]
    )
    # user 1: $100 (=10000c) decayed 48h (2 halflives -> /4) + $1 (=100c)
    #   -> 2600 cents -> 26_000_000 micro-dollars
    # user 2: $100 decayed 1h + $1 -> ~$98.2 -> bigger
    assert got[2] > got[1]
    assert abs(got[1] - int((10000 * 0.25 + 100) * 1_000_000 / 100 // 1)) <= 1


def test_path_trigrams_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from grawler_ray.functions.events import path_trigrams

    sf = "/root/testdata/sf0.001"
    got = (
        path_trigrams(
            ray.data.read_parquet(
                f"{sf}/events.parquet",
                columns=["event_id", "ts", "user_id", "event_type"],
            )
        )
        .to_pandas()
        .sort_values(["step1_type", "step2_type", "step3_type"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT step1_type, step2_type, step3_type,
                   count(*)::BIGINT AS n_paths
        FROM (SELECT event_type AS step1_type,
                     lead(event_type, 1) OVER w AS step2_type,
                     lead(event_type, 2) OVER w AS step3_type
              FROM '{sf}/events.parquet'
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        WHERE step2_type IS NOT NULL AND step3_type IS NOT NULL
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_path_trigrams_user_boundaries(ray_session):
    """Triples never cross users; a 3-event user yields exactly one."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.events import path_trigrams

    t = pa.table(
        {
            "event_id": [1, 2, 3, 4, 5, 6, 7],
            "ts": pa.array([1, 2, 3, 4, 1, 2, 3], pa.timestamp("us")),
            "user_id": [7, 7, 7, 7, 9, 9, 9],
            "event_type": ["a", "b", "a", "b", "a", "a", "a"],
        }
    )
    got = (
        path_trigrams(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values(["step1_type", "step2_type", "step3_type"])
        .reset_index(drop=True)
    )
    # user 7: (a,b,a), (b,a,b); user 9: (a,a,a); nothing spans 7->9
    assert got.values.tolist() == [
        ["a", "a", "a", 1],
        ["a", "b", "a", 1],
        ["b", "a", "b", 1],
    ]


def test_user_paths_cap_and_order(ray_session):
    """Path follows (ts, event_id) order and max_steps caps the string
    while n_events stays the true total."""
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.events import user_paths

    t = pa.table(
        {
            # event 4 ties event 3 on ts; event_id breaks the tie
            "event_id": [1, 2, 4, 3, 9],
            "ts": pa.array([10, 20, 30, 30, 5], pa.timestamp("us")),
            "user_id": [7, 7, 7, 7, 9],
            "event_type": ["a", "b", "d", "c", "z"],
        }
    )
    out = (
        user_paths(ray.data.from_arrow(t), max_steps=3)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[7, "path"] == "a>b>c" and out.loc[7, "n_events"] == 4
    assert out.loc[9, "path"] == "z" and out.loc[9, "n_events"] == 1


def test_user_paths_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from grawler_ray.functions.events import user_paths

    sf = "/root/testdata/sf0.001"
    got = (
        user_paths(
            ray.data.read_parquet(
                f"{sf}/events.parquet",
                columns=["event_id", "ts", "user_id", "event_type"],
            ),
            max_steps=7,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH o AS (SELECT user_id, event_type, ts, event_id,
                      row_number() OVER (
                          PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM '{sf}/events.parquet'),
        n AS (SELECT user_id, count(*)::BIGINT AS n_events
              FROM '{sf}/events.parquet' GROUP BY user_id)
        SELECT n.user_id, n.n_events,
               string_agg(o.event_type, '>' ORDER BY o.ts, o.event_id) AS path
        FROM n JOIN o ON n.user_id = o.user_id AND o.rn <= 7
        GROUP BY n.user_id, n.n_events ORDER BY n.user_id"""
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_global_running_sum_multiblock(ray_session):
    """The range-partitioned prefix-sum equals the serial cumsum with
    MANY blocks in play (per-block offsets actually exercised)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.events import global_running_sum

    rng = np.random.default_rng(3)
    n = 5000
    order = rng.integers(0, 365, n)          # heavy duplicate order keys
    tie = rng.permutation(n).astype(np.int64)  # unique ties
    val = rng.integers(-50, 100, n).astype(np.int64)
    t = pa.table(
        {
            "d": pa.array(order, pa.int64()),
            "k": pa.array(tie, pa.int64()),
            "v": pa.array(val, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(16)
    got = (
        global_running_sum(ds, order_col="d", tie_col="k", value_col="v")
        .to_pandas()
        .set_index("k")["cum"]
    )
    ser = np.lexsort((tie, order))
    exp_cum = val[ser].cumsum()
    exp = dict(zip(tie[ser], exp_cum))
    assert len(got) == n
    assert all(got[k] == exp[k] for k in exp)


def test_global_ntile_vs_duckdb(ray_session):
    """SQL NTILE fill rule (first n%k tiles fat) reproduced across many
    blocks, including duplicate order keys and n not divisible by k."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.events import global_ntile

    rng = np.random.default_rng(11)
    n = 4001  # deliberately not divisible by 7
    df = pd.DataFrame(
        {
            "p": rng.integers(0, 500, n).astype(np.int64),
            "k": rng.permutation(n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(16)
    got = (
        global_ntile(ds, order_col="p", tie_col="k", k=7)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT k, CAST(ntile(7) OVER (ORDER BY p, k) AS BIGINT) AS tile "
        "FROM df ORDER BY k"
    ).df()
    pd.testing.assert_frame_equal(
        got.rename(columns={"tile": "tile"}), exp, check_dtype=False
    )


def test_rank_by_key_vs_duckdb(ray_session):
    """RANK() with ties over a low-cardinality key matches SQL."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.events import rank_by_key

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "d": rng.integers(0, 40, n).astype(np.int64),  # heavy ties
            "id": rng.permutation(n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    got = (
        rank_by_key(ds, key_col="d", id_col="id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT id, CAST(rank() OVER (ORDER BY d) AS BIGINT) AS rnk "
        "FROM df ORDER BY id"
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_new_users_daily_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from grawler_ray.functions.events import new_users_daily

    sf = "/root/testdata/sf0.001"
    got = (
        new_users_daily(ray.data.read_parquet(f"{sf}/events.parquet"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH f AS (SELECT user_id, min(ts) AS ft
                  FROM '{sf}/events.parquet' GROUP BY user_id)
        SELECT date_trunc('day', ft) AS day, count(*)::BIGINT AS new_users
        FROM f GROUP BY 1 ORDER BY 1"""
    ).df()
    got["day"] = pd.to_datetime(got["day"])
    exp["day"] = pd.to_datetime(exp["day"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["new_users"].sum() == duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]


def test_user_gap_moments_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from grawler_ray.functions.events import user_gap_moments

    sf = "/root/testdata/sf0.001"
    got = (
        user_gap_moments(ray.data.read_parquet(f"{sf}/events.parquet"))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH d AS (SELECT user_id,
                          date_diff('microsecond',
                                    lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id),
                                    ts) AS g
                   FROM '{sf}/events.parquet')
        SELECT user_id, count(g)::BIGINT AS n_gaps,
               coalesce(sum(g), 0)::BIGINT AS sum_us,
               coalesce(sum((g // 1000000) * (g // 1000000)), 0)::BIGINT AS sumsq_s
        FROM d GROUP BY user_id ORDER BY user_id"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_session_stats(ray_session):
    from grawler_ray.functions.events import session_stats

    out = (
        session_stats(_events(ray_session), gap_minutes=30)
        .to_pandas()
        .set_index("user_id")
    )
    # user 1: sessions {e1,e2} and {e3,e5} -> 2 sessions, 4 events, max 2
    assert out.loc[1, "n_sessions"] == 2
    assert out.loc[1, "n_events"] == 4
    assert out.loc[1, "max_session_events"] == 2
    # user 2: one single-event session
    assert out.loc[2, "n_sessions"] == 1
    assert out.loc[2, "n_events"] == 1
    assert out.loc[2, "max_session_events"] == 1


def test_session_stats_agrees_with_sessionize(ray_session):
    """Rollup consistency on real data: session_stats must equal the
    groupby of sessionize's per-event output."""
    import ray.data

    from grawler_ray.functions.events import session_stats, sessionize

    ev = ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts"],
    )
    got = (
        session_stats(ev).to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    per_event = sessionize(ev).to_pandas()
    per_sess = (
        per_event.groupby(["user_id", "session_id"]).size().rename("c").reset_index()
    )
    exp = (
        per_sess.groupby("user_id")
        .agg(n_sessions=("c", "size"), n_events=("c", "sum"), max_session_events=("c", "max"))
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hopping_counts(ray_session):
    from grawler_ray.functions.events import hopping_counts

    out = (
        hopping_counts(_events(ray_session))
        .to_pandas()
        .set_index("w_start")
        .sort_index()
    )
    HOP = 1_800_000_000
    t0 = dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp()
    base = int(t0 * 1_000_000)
    # events at t0+0,10,50,80min and t0+2h; 1h windows hop 30min: each event
    # in exactly 2 windows (its half-hour bucket and the one before)
    # windows cover [w, w+1h): e1@0 e2@10 e3@50 e5@80 e4@120 (minutes)
    assert out.loc[base - HOP, "n"] == 2      # e1, e2 (tail of the window)
    assert out.loc[base, "n"] == 3            # e1, e2, e3
    assert out.loc[base + HOP, "n"] == 2      # e3, e5
    assert out.loc[base + 2 * HOP, "n"] == 1  # e5 only
    assert out.loc[base + 4 * HOP, "n"] == 1  # e4 (other user, 2h)
    assert out["n"].sum() == 2 * 5           # every event exactly twice


def test_hopping_counts_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from grawler_ray.functions.events import hopping_counts

    sf = "/root/testdata/sf0.001"
    got = (
        hopping_counts(ray.data.read_parquet(f"{sf}/events.parquet"))
        .to_pandas()
        .sort_values("w_start")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT (epoch_us(ts) // 1800000000 - k.k) * 1800000000 AS w_start,
               count(*)::BIGINT AS n,
               sum(CAST(floor(value*100.0+0.5) AS BIGINT))::BIGINT AS sum_cents
            FROM '{sf}/events.parquet' CROSS JOIN (SELECT unnest([0,1]) AS k) k
            GROUP BY w_start ORDER BY w_start"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hopping_counts_random_brute_force(ray_session):
    """Random timestamps vs a brute-force membership check: every event
    lands in exactly the windows [w, w+size) that contain it."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from grawler_ray.functions.events import hopping_counts

    rng = np.random.default_rng(9)
    base = 1_700_000_000_000_000  # epoch us
    ts_us = base + rng.integers(0, 12 * 3_600_000_000, 400)
    vals = rng.uniform(0, 50, 400).round(2)
    t = pa.table(
        {
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    SIZE, HOP = 3_600_000_000, 1_800_000_000
    got = (
        hopping_counts(ray.data.from_arrow(t), SIZE, HOP)
        .to_pandas()
        .set_index("w_start")
        .sort_index()
    )
    exp_n: collections.Counter = collections.Counter()
    exp_s: collections.Counter = collections.Counter()
    for u, v in zip(ts_us.tolist(), vals.tolist()):
        w = (u // HOP) * HOP
        while w > u - SIZE:
            exp_n[w] += 1
            exp_s[w] += int(np.floor(v * 100.0 + 0.5))
            w -= HOP
    assert dict(zip(got.index, got["n"])) == dict(exp_n)
    assert dict(zip(got.index, got["sum_cents"])) == dict(exp_s)


def test_concurrent_users_sweep_line_serial_oracle(ray_session):
    """Distributed sweep-line concurrency must equal the serial recurrence
    on a random fixture with overlapping spans, nested spans, touching
    endpoints and single-event users; peak must be > 1 and the final
    boundary must close everything (n_open == 0)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from grawler_ray.functions.events import concurrent_users

    rng = np.random.default_rng(23)
    rows = []
    eid = 0
    for uid in range(40):
        n = int(rng.integers(1, 6))  # some single-event users
        start = int(rng.integers(0, 500))
        tss = start + np.sort(rng.integers(0, 300, size=n))
        for t in tss:
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp(int(t) * 1_000_000, unit="us"),
                    "user_id": uid,
                    "event_type": "x",
                    "value": 1.0,
                }
            )
            eid += 1
    df = pd.DataFrame(rows)
    got = (
        concurrent_users(ray.data.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("t_us")
        .reset_index(drop=True)
    )
    # serial sweep
    us = df["ts"].astype("datetime64[us]").astype("int64")
    spans = (
        pd.DataFrame({"u": df.user_id, "t": us}).groupby("u")["t"].agg(["min", "max"])
    )
    deltas = {}
    for a, b in zip(spans["min"], spans["max"]):
        deltas[a] = deltas.get(a, 0) + 1
        deltas[b + 1] = deltas.get(b + 1, 0) - 1
    ts_sorted = sorted(deltas)
    run, expect = 0, []
    for t in ts_sorted:
        run += deltas[t]
        expect.append((t, run))
    assert list(zip(got.t_us, got.n_open)) == expect
    assert got.n_open.max() > 1
    assert got.n_open.iloc[-1] == 0


def test_span_overlap_counts_vs_brute_force(ray_session):
    """Rank-lookup overlap counts must equal the brute-force pairwise
    check, including non-overlapping isolated spans (count 0) and
    touching endpoints (inclusive overlap); the broadcast guard raises."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest
    import ray.data

    from grawler_ray.functions.events import span_overlap_counts

    rng = np.random.default_rng(31)
    rows, eid = [], 0
    for uid in range(30):
        if uid == 29:  # isolated span far away
            tss = [10_000_000, 10_000_500]
        elif uid == 28:  # touches uid 0's start exactly (inclusive)
            tss = [0, 0]
        else:
            start = int(rng.integers(0, 400))
            tss = (start + np.sort(rng.integers(0, 200, size=3))).tolist()
        for t in tss:
            rows.append(
                {"event_id": eid, "ts": pd.Timestamp(int(t), unit="us"),
                 "user_id": uid, "event_type": "x", "value": 1.0}
            )
            eid += 1
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        span_overlap_counts(ds).to_pandas().set_index("user_id")["n_overlap"]
    )
    us = df["ts"].astype("datetime64[us]").astype("int64")
    sp = pd.DataFrame({"u": df.user_id, "t": us}).groupby("u")["t"].agg(["min", "max"])
    for u in sp.index:
        brute = sum(
            1
            for v in sp.index
            if v != u
            and sp["min"][v] <= sp["max"][u]
            and sp["max"][v] >= sp["min"][u]
        )
        assert got[u] == brute, u
    assert got[29] == 0
    with _pytest.raises(ValueError, match="broadcast_max_spans"):
        span_overlap_counts(ds, broadcast_max_spans=3)
