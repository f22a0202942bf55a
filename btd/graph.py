"""Graph analytics over the materialized KG: PageRank as iterated
DataFrame joins (GraphFrames-style, dependency-free).

Same execution discipline as connected components (btd.link.canonical):
driver-side fixed-iteration loop, one shuffle per iteration (join ranks
to out-edges, re-aggregate by destination), ``localCheckpoint`` lineage
cuts managed by :class:`btd.ckpt.CheckpointLoop` so superseded
iterations' blocks are freed instead of pinning executor storage for
the session. Dangling nodes (no out-edges) redistribute uniformly, so
ranks sum to n throughout — the invariant the tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btd.ckpt import CheckpointLoop


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 5,
) -> DataFrame:
    """edges(src, dst) → (node, rank); ranks sum to #nodes.

    Duplicate edges count as parallel edges (weight = multiplicity),
    matching the reference's duplicate-preserving degree semantics.

    ``checkpoint_interval``: iterations chained lazily between eager
    ``localCheckpoint`` cuts. Each cut is a job barrier; between cuts
    the iterations pipeline inside one job (the dangling-mass scalar
    per iteration becomes a nested broadcast subquery). Lineage depth
    stays bounded by the interval either way — raise it when per-job
    latency dominates (small graphs), lower toward 1 when an
    iteration's shuffle is itself huge.
    """
    loop = CheckpointLoop(edges.sparkSession)
    # explode, not union-of-projections: one evaluation of the edge
    # subtree for the node set
    nodes = loop.static(
        edges.select(
            F.explode(F.array(F.col(src), F.col(dst))).alias("node")
        ).distinct()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # pre-join static structure once; re-used every iteration
    ew = loop.static(
        edges.select(F.col(src).alias("node"), F.col(dst).alias("dst_node"))
        .join(out_deg, "node")
    )
    # static set of dangling nodes (no out-edges) — computed once
    dangling_nodes = loop.static(nodes.join(out_deg, "node", "left_anti"))

    ranks = nodes.withColumn("rank", F.lit(1.0))
    for it in range(n_iter):
        contribs = (
            ew.join(ranks, "node")
            .groupBy(F.col("dst_node").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("recv"))
        )
        # dangling mass as a lazy 1-row aggregate cross-joined in — no
        # per-iteration driver action; the checkpoint below is the only
        # job each iteration runs
        dm = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("recv"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_interval == 0 or it == n_iter - 1:
            ranks = loop.step(ranks)
    loop.close()  # statics freed; final ranks keeps its checkpoint
    return ranks
