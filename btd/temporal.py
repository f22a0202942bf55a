"""Temporal joins the DataFrame API lacks as primitives: as-of join
and range join, composed from equi-shuffles + windows so they scale
like any sort-merge join (no driver loops, no cross joins).

The reference has no temporal operators (its only timestamps are job
logs); these serve the transcript/events layer the north rule adds —
"attach the latest state as-of this turn" is the canonical feature-
engineering join over event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: each left row gains the right row with the
    greatest ``right_ts <= left_ts`` for the same ``on`` key (NULLs if
    none) — DuckDB/kdb ``ASOF JOIN`` semantics.

    Plan shape: union both sides, ONE shuffle on the key, and a running
    ``last(ignorenulls)`` window ordered by (ts, side) — right rows
    sort before left rows at equal timestamps, so ties match. Cost is
    one exchange + one in-partition sort regardless of how many left
    rows share a right match (a join+filter+row_number formulation
    pays a shuffle of the full match cross-product instead).

    Right rows should be unique per (key, ts) — with duplicates, which
    one wins is the union's sort tie, matching DuckDB's "arbitrary
    single match" but not necessarily the same arbitrary one.

    Right rows with a NULL timestamp are dropped: NULLs sort first in
    the window order and would otherwise act as an "earlier than
    everything" state row; DuckDB/kdb ASOF never matches them.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    right = right.where(F.col(right_ts).isNotNull())
    left_cols = left.columns
    ld = dict(left.dtypes)

    # The whole right payload travels as ONE struct, filled atomically
    # by a single last(ignorenulls): filling each column independently
    # would stitch values from DIFFERENT right rows whenever the
    # matched row carries a NULL in some payload column (a frankenrow
    # no real right row equals). The struct itself is non-null for
    # every right row — even an all-NULL-fields one — so the window
    # always picks the matched row wholesale.
    r_struct = F.struct(
        *[F.col(c).alias(c) for c in right_cols],
        F.col(right_ts).alias("_rts"),
    )
    l_part = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        F.lit(None)
        .cast(right.select(r_struct.alias("_r")).schema["_r"].dataType)
        .alias("_r"),
    )
    r_part = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ld[c]).alias(c) for c in left_cols],
        r_struct.alias("_r"),
    )
    unioned = l_part.unionByName(r_part)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "_side",
        *left_cols,
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return (
        filled.where(F.col("_side") == 1)
        .select(
            *left_cols,
            *[F.col(f"_r.{c}").alias(f"{c}{suffix}") for c in right_cols],
            F.col("_r._rts").alias(f"{right_ts}{suffix}"),
        )
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 600,
    out: str = "n_in_range",
    left_id: str | None = None,
) -> DataFrame:
    """Per left row: COUNT of right rows with the same key and
    ``left_ts - window <= right_ts <= left_ts`` (a trailing-window
    interval join).

    Scalable shape: both sides bucketed to ``window_seconds``-wide
    epochs and the LEFT side exploded to its two candidate buckets, so
    the join is EQUI on (key, bucket) — shuffle ∝ rows, not the range
    cross-product a raw theta-join pays — then the exact range
    predicate filters within buckets and a final aggregation restores
    one row per left row.

    ``left_id``: a column that uniquely identifies left rows. Pass it
    whenever one exists — the fallback (monotonically_increasing_id)
    is only stable when the left plan enumerates partitions in a
    deterministic order (true for scans; NOT guaranteed if a stage is
    partially recomputed above an unordered shuffle, where stale and
    fresh ids could split/merge a row's two exploded bucket copies).
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / window_seconds)
    # row id BEFORE the explode — a nondeterministic id projected in the
    # same select as a generator is evaluated per exploded copy
    if left_id is not None:
        l1 = left.withColumn("_rid", F.col(left_id))
    else:
        l1 = left.withColumn("_rid", F.monotonically_increasing_id())
    l2 = l1.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_lts"),
        "_rid",
        F.explode(F.array(lb - 1, lb)).alias("_bucket"),
        *[F.col(c) for c in left.columns],
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        rb.alias("_bucket"),
        F.col(right_ts).alias("_rts"),
    )
    joined = l2.join(r2, ["_k", "_bucket"], "left").withColumn(
        "_hit",
        (
            F.col("_rts").isNotNull()
            & (F.col("_rts") <= F.col("_lts"))
            & (
                F.col("_rts")
                >= F.col("_lts") - F.expr(f"INTERVAL {window_seconds} SECOND")
            )
        ).cast("long"),
    )
    return (
        joined.groupBy("_rid", *left.columns)
        .agg(F.sum("_hit").alias(out))
        .drop("_rid")
    )


def cohort_retention(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """(cohort_week, offset_weeks, n_users): the classic retention
    triangle — users grouped by the ISO week of their FIRST event,
    counted in every later week they remain active. The product-health
    readout every event pipeline ships.

    Two keyed exchanges, both with map-side partial aggregation:
    (1) min-ts per user (the cohort), broadcast-joined back onto the
    event stream (users ≪ events; Catalyst picks broadcast when the
    per-user table fits, sort-merge otherwise — no hand forcing), and
    (2) distinct-user count per (cohort, offset) cell. Output cells
    are ≤ weeks², tiny at any corpus scale. offset = whole weeks
    between the Monday-truncated event week and cohort week — both
    engines truncate to Monday, so the day gap is an exact multiple
    of 7 and integer division is exact.
    """
    first = events.groupBy(F.col(user).alias("_u")).agg(
        F.to_date(F.date_trunc("week", F.min(ts))).alias("cohort_week")
    )
    act = events.select(
        F.col(user).alias("_u"),
        F.to_date(F.date_trunc("week", F.col(ts))).alias("week"),
    )
    return (
        act.join(first, "_u")
        .select(
            "cohort_week",
            F.floor(F.datediff("week", "cohort_week") / 7).alias(
                "offset_weeks"
            ),
            "_u",
        )
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count_distinct("_u").alias("n_users"))
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_idx, n_users): ordered-funnel conversion — how many
    users performed step[0], then step[1] at-or-after their first
    step[0], then step[2] at-or-after that, … Strictly ordered (a
    purchase BEFORE the first view does not count), first-touch
    semantics (each stage anchors at the user's EARLIEST qualifying
    event, which maximizes later-stage matches — the standard funnel
    definition).

    One shuffle total, no joins, no windows, no Python UDFs: a single
    per-user aggregate collects the SORTED timestamp array of each
    step's events, then JVM array expressions resolve the chain —
    anchor_k = first element of arr_k that is >= anchor_{k-1}
    (try_element_at of a higher-order filter — NULL, not ANSI error,
    when a user never reaches a stage). Per-user state is the
    user's own event timestamps for the named steps — bounded by
    per-user activity, the same envelope sessionization carries; the
    final counts are a tiny global rollup.

    ``steps`` must be distinct: stages anchor with ``t >= anchor``, so
    a repeated step name would let the SAME event satisfy both its
    stages and silently overcount — rejected up front instead.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(
            "funnel steps must be distinct (a repeated step would be "
            f"satisfied by the same event twice): {steps}"
        )
    aggs = [
        F.sort_array(
            F.collect_list(
                F.when(F.col(type_col) == s, F.col(ts))
            )
        ).alias(f"_a{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.groupBy(F.col(user).alias("_u")).agg(*aggs)
    anchor = F.try_element_at(F.col("_a0"), F.lit(1))
    reached = [anchor.isNotNull()]
    for i in range(1, len(steps)):
        nxt = F.try_element_at(
            F.filter(F.col(f"_a{i}"), lambda t: t >= anchor), F.lit(1)
        )
        reached.append(nxt.isNotNull())
        anchor = nxt
    counted = per_user.select(
        *[
            F.when(r, F.lit(1)).otherwise(F.lit(0)).alias(f"_r{i}")
            for i, r in enumerate(reached)
        ]
    ).agg(*[F.sum(f"_r{i}").alias(f"_n{i}") for i in range(len(steps))])
    rows = [
        F.struct(
            F.lit(s).alias("step"),
            F.lit(i).alias("step_idx"),
            F.col(f"_n{i}").alias("n_users"),
        )
        for i, s in enumerate(steps)
    ]
    return counted.select(
        F.explode(F.array(*rows)).alias("_e")
    ).select("_e.step", "_e.step_idx", "_e.n_users")


def moving_avg(
    events: DataFrame,
    value: str = "value",
    user: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    window_rows: int = 3,
) -> DataFrame:
    """(user_id, event_id, ts, mavg): trailing ``window_rows``-row
    moving average of ``value`` per user in (ts, tiebreak) order — the
    smoothing/trend primitive every event pipeline ships.

    ONE shuffle (window partitioned by user); the frame is
    rowsBetween(-(n-1), 0) so state per row is bounded by the frame,
    not the partition. The deterministic tiebreak makes frame
    membership — and therefore the float sum — identical across
    engines; addends are summed in frame order on both, so ROUND(,6)
    sits far above any drift.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user)
        .orderBy(F.col(ts), F.col(tiebreak))
        .rowsBetween(-(window_rows - 1), 0)
    )
    return events.select(
        user,
        tiebreak,
        ts,
        F.round(F.avg(value).over(w), 6).alias("mavg"),
    )


def hopping_window_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """(window_start, n_events, total): overlapping (hopping)
    event-time windows — each event lands in window/slide windows
    (2 here), the batch twin of the streaming hopping aggregation and
    the shape behind "10-minute rate, refreshed every 5".

    Spark's window() generator expands each row to its owning windows
    (narrow — no self-join against a calendar table), then ONE
    partial-aggregated exchange keyed by window start. Window starts
    are epoch-aligned to the slide, so the DuckDB twin can enumerate
    the same starts arithmetically. total is ROUND(,4): a per-window
    double sum whose summation-order drift sits ~5 orders below the
    rounding step at any realistic occupancy.
    """
    return (
        events.groupBy(F.window(F.col(ts), window, slide).alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value), 4).alias("total"),
        )
        .select(
            F.col("_w.start").alias("window_start"), "n_events", "total"
        )
    )


def zscore_outliers(
    events: DataFrame,
    value: str = "value",
    key: str = "user_id",
    threshold: float = 2.0,
) -> DataFrame:
    """(event_id, user_id, value, z): events whose ``value`` sits more
    than ``threshold`` sample standard deviations from that user's own
    mean — the per-entity anomaly gate (fraud spikes, runaway agents,
    sensor faults) every event pipeline ships.

    Plan: ONE exchange — a window keyed by user computes mean and
    stddev_samp over the full partition frame, then the z filter is a
    narrow projection. Per-user state is two running moments, not the
    row set, so a hot user costs bandwidth, not memory. Keys with a
    single event (stddev NULL) and zero-variance keys (stddev 0 —
    try_divide, since ANSI ``/`` would throw where DuckDB yields NULL)
    produce NULL z and are filtered — both engines agree NULL fails
    the predicate. z is ROUND(,6), computed as (value - mean)/stddev
    with the identical aggregate definitions DuckDB uses, so the twin
    hashes identically.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key)
    z = F.try_divide(
        F.col(value) - F.avg(value).over(w), F.stddev_samp(value).over(w)
    )
    return (
        events.select(
            "event_id", key, value, F.round(z, 6).alias("z")
        )
        .where(F.abs(F.col("z")) > threshold)
    )
