"""Distinct subjects (reference problem 1).

The reference spends two chained MapReduce jobs + a filesystem
round-trip on this (problems/Distinct.java:25-108); here it is one
shuffle with partial aggregation. Note the reference counts DISTINCT
SUBJECTS only — not subjects ∪ objects — despite its problem statement
(report/report.md:41 vs Distinct.java:40-41); the code is the spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_subjects(triples: DataFrame) -> DataFrame:
    """DISTINCT subject values (job 1 of the reference chain)."""
    return triples.select("subject").distinct()


def distinct_subject_count(triples: DataFrame) -> DataFrame:
    """COUNT(DISTINCT subject) — the whole 2-job chain as one agg.

    Partial aggregation map-side replaces the reference's
    "emit only subject" manual pruning (Distinct.java:40-41); the
    single-reducer sum job (Distinct.java:60-87) is the driver-side
    final merge of ``count_distinct`` — no single-reducer bottleneck.
    """
    return triples.agg(F.count_distinct("subject").alias("n_distinct_subjects"))


def distinct_spo_counts(triples: DataFrame) -> DataFrame:
    """COUNT(DISTINCT subject / predicate / object) in ONE pass.

    The north rule asks for all three node-role cardinalities (the
    reference only shipped subjects — Distinct.java:40-41); Spark plans
    multi-distinct aggregation as a single Expand + two-level hash agg,
    so this is still one scan of the input.
    """
    return triples.agg(
        F.count_distinct("subject").alias("n_distinct_subjects"),
        F.count_distinct("predicate").alias("n_distinct_predicates"),
        F.count_distinct("object").alias("n_distinct_objects"),
    )
