"""Stable per-conversation turn ordering (north-rule invariant:
per-turn text equality under stable (conv_id, turn_idx) ordering).

The input may arrive in any row order; every downstream stage keys on
(conv_id, turn_idx) so ordering is logical, not physical. Window ops
shuffle once on conv_id; at 100 TB that shuffle is the extraction
pipeline's only wide dependency before linking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Adds ``turn_rank`` = dense position of the turn inside its
    conversation (1-based), ordered by turn_idx with ts as tiebreak.

    For well-formed data turn_rank == turn_idx + 1; divergence flags
    gaps/duplicates upstream.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return transcripts.withColumn("turn_rank", F.row_number().over(w))


def with_prev_text(transcripts: DataFrame, n_prev: int = 1) -> DataFrame:
    """Context windowing: attach the previous n turn texts (array) for
    context-aware extraction. One shuffle on conv_id, reused by any
    later per-conversation stage (co-partitioned)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    cols = [F.lag("text", i).over(w) for i in range(n_prev, 0, -1)]
    return transcripts.withColumn(
        "prev_texts", F.filter(F.array(*cols), lambda x: x.isNotNull())
    )


def check_turn_integrity(transcripts: DataFrame) -> DataFrame:
    """Per-conversation integrity: duplicate turn_idx or text drift.
    Returns one row per conv with counts; empty-violation convs have
    n_dup_turns == 0."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            (
                F.count(F.lit(1)) - F.count_distinct("turn_idx")
            ).alias("n_dup_turns"),
            F.min("turn_idx").alias("min_turn_idx"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
    )
