"""Out/in-degree and degree histograms (reference problems 2-3).

problems/Outdegree.java:25-138 / Indegree.java:25-137: two chained jobs
(count per node, then histogram of counts). Both collapse to two hash
aggregations in one plan; Spark's partial aggregation plays the
reference's combiner role and the histogram's second shuffle is tiny
(one row per distinct degree).

Semantics preserved exactly: degree counts ROWS (duplicate edges
counted — Outdegree.java:63-66 counts values, not distinct objects);
histograms are emitted ascending by degree, which the reference gets
implicitly from the shuffle sort (SURVEY.md §2.6 T3) and we make
explicit with orderBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def outdegree(triples: DataFrame) -> DataFrame:
    """(node, degree): outgoing edge count per subject, duplicates kept."""
    return (
        triples.groupBy(F.col("subject").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def indegree(triples: DataFrame) -> DataFrame:
    """(node, degree): incoming edge count per object, duplicates kept."""
    return (
        triples.groupBy(F.col("object").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def degree_histogram(degrees: DataFrame) -> DataFrame:
    """degree → number of nodes with that degree, ascending by degree."""
    return (
        degrees.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


def outdegree_histogram(triples: DataFrame) -> DataFrame:
    return degree_histogram(outdegree(triples))


def indegree_histogram(triples: DataFrame) -> DataFrame:
    return degree_histogram(indegree(triples))


def histogram_text_lines(hist: DataFrame) -> DataFrame:
    """(degree, n_nodes) → reference TextOutputFormat lines:
    ``degree<TAB>n_nodes``, ascending by degree (the reducer-sort order
    the published CSVs carry — report/outdegree-distribution.csv)."""
    return hist.orderBy("degree").select(
        F.concat_ws(
            "\t",
            F.col("degree").cast("string"),
            F.col("n_nodes").cast("string"),
        ).alias("value")
    )
