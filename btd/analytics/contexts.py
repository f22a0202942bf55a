"""Same-triple-different-contexts (reference problem 6).

problems/SameTripleDifferentContexts.java:125-276: the composite triple
is the shuffle key and distinct contexts are counted in an in-reducer
HashSet (:163-172), which the report flags as both shuffle-heavy
(report/report.md:390-392) and an OOM risk (:453-455). Here the same
semantics are ``groupBy(s,p,o).agg(count_distinct(ctx))`` — partial
aggregation slashes the shuffle and Spark's agg spills instead of
OOMing. ``approx_count_distinct`` is offered as the report's
"bloom filter" alternative (:453-484).

Empty context counts as ONE distinct context (the empty Text enters the
HashSet); we keep absent-context as ``''`` — never NULL — so
``count_distinct`` matches (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_contexts_per_triple(
    triples: DataFrame, approximate: bool = False
) -> DataFrame:
    """(subject, predicate, object, n_contexts)."""
    agg = (
        F.approx_count_distinct("context")
        if approximate
        else F.count_distinct("context")
    )
    return triples.groupBy("subject", "predicate", "object").agg(
        agg.alias("n_contexts")
    )


def top_k_contexts(triples: DataFrame, k: int = 10) -> DataFrame:
    """Top-k triples by distinct-context count, ascending output, with
    the reference's (count, triple) tie-break
    (SameTripleDifferentContexts.java:60-63)."""
    top = (
        distinct_contexts_per_triple(triples)
        .orderBy(
            F.desc("n_contexts"), F.desc("subject"), F.desc("predicate"), F.desc("object")
        )
        .limit(k)
    )
    return top.orderBy("n_contexts", "subject", "predicate", "object")
