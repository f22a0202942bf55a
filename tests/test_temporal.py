"""As-of / range join semantics on hand-built frames (ties, no-match,
multi-key); full-table parity vs DuckDB's native ASOF JOIN runs in
test_oracle_parity (ev_asof_join / ev_range_count)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from btd.temporal import asof_join, range_join_count


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=s)


def test_asof_join_ties_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (2, _ts(10), "b"), (1, _ts(2), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 5.0), (1, _ts(3), 2.0), (2, _ts(11), 9.0)],
        "k long, ts timestamp, v double",
    )
    got = {
        r.tag: (r.v_asof, r.ts_asof)
        for r in asof_join(left, right, on="k", right_cols=["v"]).collect()
    }
    assert got["a"] == (5.0, _ts(10))  # equal ts matches (inclusive)
    assert got["b"] == (None, None)  # only future right rows
    assert got["c"] == (None, None)  # right starts later
    # all left rows survive, exactly once
    assert len(got) == 3


def test_asof_join_ignores_null_right_ts(spark):
    """A right row with NULL ts must never match (DuckDB/kdb ASOF
    semantics) — without the filter it would sort nulls-first and act
    as an 'earlier than everything' state row."""
    left = spark.createDataFrame(
        [(1, _ts(10), "a")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, _ts(3), 2.0)],
        "k long, ts timestamp, v double",
    )
    got = {
        r.tag: (r.v_asof, r.ts_asof)
        for r in asof_join(left, right, on="k", right_cols=["v"]).collect()
    }
    assert got["a"] == (2.0, _ts(3))
    # and with ONLY a null-ts right row: no match at all
    right2 = spark.createDataFrame(
        [(1, None, 99.0)], "k long, ts timestamp, v double"
    )
    got2 = asof_join(left, right2, on="k", right_cols=["v"]).collect()
    assert (got2[0].v_asof, got2[0].ts_asof) == (None, None)


def test_range_join_count_window_edges(spark):
    left = spark.createDataFrame(
        [(1, _ts(30), "a")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(30), 0.0),  # at left ts: counted
         (1, _ts(20), 0.0),  # inside window: counted
         (1, _ts(31), 0.0),  # future: not counted
         (2, _ts(25), 0.0)],  # other key: not counted
        "k long, ts timestamp, v double",
    )
    rows = range_join_count(
        left, right, on="k", window_seconds=10
    ).collect()
    assert len(rows) == 1
    assert rows[0].n_in_range == 2
    # boundary: ts exactly window_seconds before left ts is included
    # (window 10 catches ts=20); window 9 excludes it
    rows = range_join_count(
        left, right, on="k", window_seconds=9
    ).collect()
    assert rows[0].n_in_range == 1



def test_asof_join_random_vs_python(spark):
    """Randomized as-of join vs a pure-Python oracle: many keys, dense
    timestamp collisions between sides (but unique per (key, ts) on
    the right, per the operator contract)."""
    import random

    rng = random.Random(13)
    rights = {}
    right_rows = []
    for k in range(6):
        for ts in rng.sample(range(100), 25):
            v = float(rng.randint(0, 999))
            rights[(k, ts)] = v
            right_rows.append((k, _ts(ts), v))
    left_rows = [
        (k, _ts(rng.randrange(100)), i)
        for i, k in enumerate(rng.choices(range(8), k=120))
    ]
    left = spark.createDataFrame(
        left_rows, "k long, ts timestamp, row_id long"
    )
    right = spark.createDataFrame(
        right_rows, "k long, ts timestamp, v double"
    )
    got = {
        r.row_id: (r.v_asof, r.ts_asof)
        for r in asof_join(left, right, on="k", right_cols=["v"]).collect()
    }
    assert len(got) == len(left_rows)
    for k, lts, rid in left_rows:
        lsec = lts.minute * 60 + lts.second
        cands = [
            (ts, v) for (rk, ts), v in rights.items()
            if rk == k and ts <= lsec
        ]
        if cands:
            bts, bv = max(cands)
            assert got[rid] == (bv, _ts(bts)), (k, lsec)
        else:
            assert got[rid] == (None, None), (k, lsec)


def test_asof_join_null_payload_is_atomic(spark):
    """Regression: a matched right row whose payload column is NULL
    must yield (v_asof=NULL, ts_asof=match ts) — not a stitched row
    combining an older row's value with the newer row's timestamp
    (per-column fills would do exactly that)."""
    left = spark.createDataFrame(
        [(1, _ts(10), "a")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 2.0), (1, _ts(8), None)],
        "k long, ts timestamp, v double",
    )
    rows = asof_join(left, right, on="k", right_cols=["v"]).collect()
    assert len(rows) == 1
    assert rows[0].ts_asof == _ts(8)
    assert rows[0].v_asof is None  # DuckDB ASOF semantics


def _day(d):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=d)


def test_cohort_retention_weekly_cells(spark):
    from btd.temporal import cohort_retention

    # 2024-01-01 is a Monday: user 1 joins week 0, active weeks 0,1,3;
    # user 2 joins week 1, active weeks 1,2; user 3 joins week 0 only.
    rows = [
        (1, _day(0)), (1, _day(2)), (1, _day(8)), (1, _day(21)),
        (2, _day(7)), (2, _day(15)),
        (3, _day(4)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.isoformat(), r.offset_weeks): r.n_users
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # users 1 and 3 in the week-0 cohort
        ("2024-01-01", 1): 1,  # user 1 back in week 1
        ("2024-01-01", 3): 1,  # user 1 back in week 3
        ("2024-01-08", 0): 1,  # user 2 cohort
        ("2024-01-08", 1): 1,  # user 2 back in week 2
    }


def test_funnel_strict_ordering_and_first_touch(spark):
    from btd.temporal import funnel

    rows = [
        # u1 completes in order: view, click, purchase
        (1, _ts(0), "view"), (1, _ts(10), "click"), (1, _ts(20), "purchase"),
        # u2: purchase BEFORE first view — must not count at stage 3
        (2, _ts(5), "purchase"), (2, _ts(10), "view"), (2, _ts(15), "click"),
        # u3: click before view only — stage 2 not reached
        (3, _ts(0), "click"), (3, _ts(5), "view"),
        # u4: never views
        (4, _ts(0), "click"), (4, _ts(1), "purchase"),
        # u5: view then click at the SAME ts (>= boundary counts)
        (5, _ts(0), "view"), (5, _ts(0), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.step: (r.step_idx, r.n_users) for r in
           funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {
        "view": (0, 4),      # u1 u2 u3 u5
        "click": (1, 3),     # u1, u2 (click after view), u5 (same-ts)
        "purchase": (2, 1),  # only u1 purchases after the click anchor
    }


def test_funnel_first_touch_maximizes_later_stages(spark):
    from btd.temporal import funnel

    # anchor at the FIRST view (t=0) lets the t=5 click qualify even
    # though a later view (t=10) would disqualify it
    rows = [(1, _ts(0), "view"), (1, _ts(5), "click"), (1, _ts(10), "view")]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.step: r.n_users for r in funnel(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_moving_avg_frame_values(spark):
    from btd.temporal import moving_avg

    rows = [
        (1, 1, "2024-01-01 00:00:00", 10.0),
        (1, 2, "2024-01-01 00:01:00", 20.0),
        (1, 3, "2024-01-01 00:02:00", 60.0),
        (1, 4, "2024-01-01 00:03:00", 30.0),
        (2, 5, "2024-01-01 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.event_id: r.mavg for r in moving_avg(df).collect()}
    assert got == {
        1: 10.0,
        2: 15.0,
        3: 30.0,
        4: pytest.approx(round((20 + 60 + 30) / 3, 6)),
        5: 5.0,
    }


def test_hopping_windows_double_count(spark):
    from btd.temporal import hopping_window_counts

    rows = [
        (1, "2024-01-01 00:01:00", 1.0),   # windows 23:55 and 00:00
        (2, "2024-01-01 00:06:00", 2.0),   # windows 00:00 and 00:05
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        str(r.window_start): (r.n_events, r.total)
        for r in hopping_window_counts(df).collect()
    }
    # every event lands in exactly window/slide = 2 windows
    assert sum(n for n, _ in got.values()) == 4
    assert got["2024-01-01 00:00:00"] == (2, 3.0)
    assert got["2023-12-31 23:55:00"] == (1, 1.0)
    assert got["2024-01-01 00:05:00"] == (1, 2.0)


def test_upsert_merge_semantics(spark):
    from btd.materialize import upsert

    ex = spark.createDataFrame(
        [("a", 1, "old"), ("b", 2, "keep"), ("dup", 3, "x"),
         ("dup", 3, "y")],
        "k string, k2 long, payload string",
    )
    up = spark.createDataFrame(
        [("a", 1, "new"), ("c", 9, "insert"), ("amb", 5, "q"),
         ("amb", 5, "p")],
        "k string, k2 long, payload string",
    )
    got = {(r.k, r.k2): r.payload
           for r in upsert(ex, up, ["k", "k2"]).collect()}
    assert got == {
        ("a", 1): "new",       # update wins
        ("b", 2): "keep",      # untouched survives
        ("c", 9): "insert",    # new key inserts
        ("dup", 3): "x",       # existing dup keys collapse, min tuple
        ("amb", 5): "p",       # ambiguous update keys: deterministic
    }
    import pytest as _pt

    with _pt.raises(ValueError):
        upsert(ex, up.drop("payload"), ["k"])


def test_funnel_rejects_repeated_steps(spark):
    """A repeated step name would be satisfied by the SAME event twice
    (anchoring uses t >= anchor) — rejected up front instead of
    silently overcounting."""
    import pytest as _pt

    from btd.temporal import funnel

    ev = spark.createDataFrame(
        [("u", "view", "2024-01-01 00:00:00")],
        "user_id string, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with _pt.raises(ValueError, match="distinct"):
        funnel(ev, ["view", "view"])


def test_upsert_map_column_and_helper_name_collision(spark):
    """Unorderable (map) columns must not enter the tiebreak ORDER BY
    (AnalysisException otherwise), and user columns named _pri/_rk
    must not collide with the helper columns."""
    from btd.materialize import upsert

    ex = spark.createDataFrame(
        [("a", {"x": 1}, "old", 7), ("b", {"y": 2}, "keep", 8)],
        "k string, props map<string,int>, payload string, _pri long",
    )
    up = spark.createDataFrame(
        [("a", {"x": 9}, "new", 7), ("c", {"z": 3}, "ins", 9)],
        "k string, props map<string,int>, payload string, _pri long",
    )
    got = {r.k: (r.payload, dict(r.props)) for r in
           upsert(ex, up, ["k"]).collect()}
    assert got == {
        "a": ("new", {"x": 9}),
        "b": ("keep", {"y": 2}),
        "c": ("ins", {"z": 3}),
    }


def test_upsert_nested_map_columns_excluded(spark):
    """Maps nested inside arrays/structs are just as unorderable as
    top-level ones — ORDER BY raises at plan time if they leak into
    the tiebreak (r4 advice)."""
    from btd.materialize import upsert

    schema = (
        "k string, payload string, tags array<map<string,int>>, "
        "meta struct<m: map<string,int>, v: int>"
    )
    ex = spark.createDataFrame(
        [("a", "old", [{"x": 1}], ({"q": 1}, 5))], schema
    )
    up = spark.createDataFrame(
        [("a", "new", [{"x": 9}], ({"q": 2}, 6)),
         ("b", "ins", [], ({}, 0))],
        schema,
    )
    got = {r.k: (r.payload, r.meta.v) for r in
           upsert(ex, up, ["k"]).collect()}
    assert got == {"a": ("new", 6), "b": ("ins", 0)}
