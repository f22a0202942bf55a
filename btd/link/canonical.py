"""Canonicalization: connected components over same-as edges +
deterministic canonical-ID election (min entity_id per component).

Implementation is min-label propagation as an iterated DataFrame
self-join — the GraphFrames-style approach without the dependency.
Each iteration: push every node's current label across all edges (both
directions), keep the min. Converges in O(component diameter)
iterations; entity same-as components are shallow (chains/stars of
surface variants), so diameter — not log(n) large-star/small-star —
is the right complexity target, and each iteration is one shuffle.
Catalyst can't express fixpoints, so the loop is driver-side with
``localCheckpoint`` per iteration to cut lineage (SURVEY.md §7.3);
:class:`btd.ckpt.CheckpointLoop` frees superseded iterations' blocks
so the loop doesn't pin executor storage for the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btd.ckpt import CheckpointLoop


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """nodes(entity_id) + edges(id_a, id_b) →
    (entity_id, canonical_id = min entity_id of the component)."""
    loop = CheckpointLoop(nodes.sparkSession)
    # undirected: both directions once, reused every iteration. Explode,
    # not union-of-projections — a union's branches each re-evaluate the
    # (possibly expensive) edge subtree; explode reads it once.
    und = loop.static(
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    labels = loop.step(
        nodes.select("entity_id", F.col("entity_id").alias("canonical_id"))
    )

    for _ in range(max_iter):
        msgs = und.join(
            labels, und.src == labels.entity_id, "inner"
        ).select(F.col("dst").alias("entity_id"), "canonical_id")
        new_labels = loop.step(
            labels.select("entity_id", "canonical_id")
            .unionByName(msgs)
            .groupBy("entity_id")
            .agg(F.min("canonical_id").alias("canonical_id")),
            free_prev=False,  # convergence diff below still reads labels
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "entity_id")
            .where(F.col("n.canonical_id") != F.col("o.canonical_id"))
            .limit(1)
            .count()
        )
        loop.release_prev()
        labels = new_labels
        if changed == 0:
            break
    loop.close()  # statics freed; final labels keeps its checkpoint
    return labels


def canonicalize_entities(entities: DataFrame, same_as: DataFrame) -> DataFrame:
    """entities(entity_id, surface) + same_as(id_a, id_b, score) →
    ENTITIES schema (entity_id, canonical_id, surface)."""
    labels = connected_components(entities.select("entity_id"), same_as)
    return entities.join(labels, "entity_id").select(
        "entity_id", "canonical_id", "surface"
    )
