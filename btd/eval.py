"""Extraction-quality evaluation: distributed set precision/recall.

The north rule's headline acceptance metric is "triple P/R >= 0.95 vs
reference" — at 10^12-turn scale the comparison itself must be a
cluster job, not a driver-side diff (the pytest asserts in
tests/test_extract.py collect both sides; this operator is the same
measurement as ONE keyed full-outer join + a 1-row rollup, usable on
the full corpus).

Set semantics: both sides are reduced to DISTINCT key tuples first
(standard for extraction eval — emitting a true triple twice is not
extra credit, missing it twice is not double penalty).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def set_pr(
    got: DataFrame, gold: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """1 row: (tp, fp, fn, precision, recall, f1) of ``got`` vs
    ``gold``, compared as SETS of ``keys`` tuples.

    Plan: distinct each side on the keys, ONE full-outer equi-join on
    those same keys (both sides arrive hashed identically, so the join
    adds no exchange beyond the distincts), presence flags, then a
    1-row global aggregate with map-side partials. Nothing driver-side
    at any corpus size; skew is a non-issue because the join key is
    the full tuple (unique per side after distinct — no hot key can
    exist).

    Ratios are ROUND(,6); tp/fp/fn are exact longs. Empty-side
    conventions: precision is NULL when got is empty, recall NULL when
    gold is empty (0/0 is unmeasured, not zero).
    """
    keys = list(keys)
    g = got.select(*keys).distinct().withColumn("_got", F.lit(1))
    d = gold.select(*keys).distinct().withColumn("_gold", F.lit(1))
    j = g.join(d, keys, "full_outer")
    agg = j.agg(
        F.count(F.when(F.col("_got").isNotNull() & F.col("_gold").isNotNull(), 1)).alias("tp"),
        F.count(F.when(F.col("_got").isNotNull() & F.col("_gold").isNull(), 1)).alias("fp"),
        F.count(F.when(F.col("_got").isNull() & F.col("_gold").isNotNull(), 1)).alias("fn"),
    )
    # try_divide: 0/0 → NULL under ANSI mode (Spark 4 default) instead
    # of a job-killing DIVIDE_BY_ZERO — the "unmeasured" convention
    prec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    f1 = F.try_divide(2 * prec * rec, prec + rec)
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
