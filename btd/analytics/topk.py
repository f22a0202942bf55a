"""Top-K nodes by outdegree (reference problem 4).

The reference hand-builds in-mapper bounded min-heaps flushed to a
single reducer (problems/TopKOutdegree.java:159-216, K=10 at :31).
Spark's ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
per-partition top-K + driver merge — the same algorithm, built in.

Tie-break preserved: the reference heap orders by (degree, node) so
kept rows and their order are deterministic (TopKOutdegree.java:52-55);
output ascending like the reference's position-0..9 emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btd.analytics.degrees import outdegree


def top_k_outdegree(triples: DataFrame, k: int = 10) -> DataFrame:
    """Top-k (node, degree) by outdegree, ascending (degree, node)."""
    top = (
        outdegree(triples)
        .orderBy(F.desc("degree"), F.desc("node"))
        .limit(k)
    )
    # Re-sort ascending for golden-output parity; k rows, driver-cheap.
    return top.orderBy("degree", "node")
