"""Batch sessionization: gap-based session identification over an
event stream, as two window passes (lag → boundary flag → running sum)
— the classic Catalyst-native formulation; one shuffle on the key.

The streaming twin (arbitrary-state applyInPandasWithState) lives in
btd.streaming; this is the backfill/batch path over the same events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """(key, session_id, n_events, session_start, session_end): events
    of a key belong to one session while consecutive gaps stay within
    ``gap_minutes``. session_id numbers a key's sessions from 1 in time
    order (deterministic).

    ``tiebreak``: a column that uniquely orders rows sharing a
    timestamp. The boundary flags and the running sum are two window
    passes over the same sort; with tied timestamps and no tiebreak,
    identical row order across the passes is a Catalyst implementation
    detail (child-ordering reuse), not a guarantee — pass one (e.g. an
    event id) whenever ties are possible.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    extra = [tiebreak] if tiebreak else []
    w = Window.partitionBy(key).orderBy(*order)
    gap = F.unix_timestamp(F.col(ts)) - F.unix_timestamp(
        F.lag(ts).over(w)
    )
    flagged = events.select(
        key,
        ts,
        *extra,
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1)
        .otherwise(0)
        .alias("_new_session"),
    )
    with_id = flagged.select(
        key,
        ts,
        F.sum("_new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return with_id.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    )
