"""End-to-end KG construction pipeline (north rule): transcripts →
extraction → linking → canonicalization → materialized graph, with
checkpoint-resumable stage boundaries.

Stage graph (each stage = one materialized output + manifest):
  1. triples_raw   — pandas-UDF relation extraction (narrow)
  2. mentions      — pandas-UDF mention spans (narrow)
  3. same_as       — LSH blocking self-join + batched scoring
  4. entities      — connected components + canonical-ID election
  5. kg_triples    — triples with canonicalized subj/obj, partitioned

Rerunning run() skips any stage whose manifest is present — the
"resumable from checkpoint with per-partition lineage" contract.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: Gazetteer bound: the mention stage compiles its trie regex from at
#: most this many surfaces, selected by triple-mention frequency
#: (desc), surface (asc) — a deterministic top-N aggregation, NOT an
#: unbounded driver collect. At 10^12-turn scale the distinct-surface
#: set is unbounded; the trie pattern + UDF closure must stay driver-
#: sized. Truncation is logged (no silent caps).
DEFAULT_GAZETTEER_CAP = 100_000

from btd.extract.mentions import detect_mentions
from btd.extract.relations import extract_triples
from btd.link.blocking import candidate_pairs
from btd.link.canonical import canonicalize_entities
from btd.link.scoring import score_candidates
from btd.materialize import read_stage, stage_complete, write_stage


def run(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    score_threshold: float = 0.6,
    force: bool = False,
    gazetteer_cap: int = DEFAULT_GAZETTEER_CAP,
    max_block_size: int | None = 1024,
) -> dict[str, DataFrame]:
    """Run all stages; returns {stage: DataFrame} of stage outputs."""
    paths = {
        s: os.path.join(out_dir, s)
        for s in ("triples_raw", "mentions", "same_as", "entities", "kg_triples")
    }

    #: directory partitioning per stage — the "partitioned Iceberg
    #: triple and entity tables" layout (pred has low cardinality and
    #: is the dominant query filter on a KG; partition pruning applies)
    partitioning: dict[str, list[str] | None] = {
        "kg_triples": ["pred"],
    }

    def stage(name: str, build) -> DataFrame:
        if force or not stage_complete(paths[name]):
            write_stage(
                build(),
                paths[name],
                stage=name,
                partition_by=partitioning.get(name),
            )
        return read_stage(spark, paths[name])

    # Defensive fan-out: a narrow input (few/one parquet files, or
    # unsplittable gz — the same physics the reference hit on S3 gz
    # chunks) caps every narrow stage at the scan's parallelism. One
    # cheap shuffle here unlocks the cluster; a well-partitioned big
    # table (partitions >= target) passes through untouched.
    target = spark.sparkContext.defaultParallelism * 2
    if transcripts.rdd.getNumPartitions() < target:
        transcripts = transcripts.repartition(target)

    triples_raw = stage("triples_raw", lambda: extract_triples(transcripts))

    # mention surfaces: extraction-observed subj/obj surfaces, BOUNDED
    def _mentions() -> DataFrame:
        # top-N by mention frequency (ties → lexicographic): the heavy
        # aggregation runs on the cluster; only <= cap+1 (surface,
        # count) rows ever reach the driver, however large the corpus.
        # cap+1 so truncation is detected without a second count job.
        freq = (
            triples_raw.select(
                F.explode(F.array("subj", "obj")).alias("s")
            )
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        top = (
            freq.orderBy(F.desc("n"), F.asc("s"))
            .limit(gazetteer_cap + 1)
            .collect()
        )
        if len(top) > gazetteer_cap:
            top = top[:gazetteer_cap]
            log.warning(
                "gazetteer truncated to top %d surfaces by frequency "
                "(rarest kept: %r with %d mentions); rarer surfaces "
                "will not get mention spans",
                gazetteer_cap,
                top[-1]["s"],
                top[-1]["n"],
            )
        surfaces = [r["s"] for r in top]
        # regex-scan DISTINCT texts, then equi-join spans back to turns:
        # transcript corpora repeat text heavily (boilerplate tool
        # output, templated turns), so the Python-regex cost tracks
        # distinct texts, not turns; the join is spans-side small and
        # AQE broadcasts it
        uniq = transcripts.select("text").distinct()
        spans = detect_mentions(uniq, surfaces or ["<none>"], keys=("text",))
        return (
            transcripts.select("conv_id", "turn_idx", "text")
            .join(spans, "text")
            .select("conv_id", "turn_idx", "surface", "start", "end")
        )

    mentions = stage("mentions", _mentions)

    def _entities_raw() -> DataFrame:
        # explode, not union-of-projections: one scan of the stage
        return (
            triples_raw.select(
                F.explode(F.array("subj", "obj")).alias("surface")
            )
            .distinct()
            .withColumn("entity_id", F.col("surface"))
        )

    def _same_as() -> DataFrame:
        # block purging on by default (max_block_size): at 10^12 turns
        # a non-discriminating block key (dense numeric-ish surfaces
        # sharing a minhash band) otherwise grows quadratically — see
        # btd/link/blocking.py. None disables for full-recall runs.
        ents = _entities_raw()
        pairs = candidate_pairs(ents, max_block_size=max_block_size)
        return score_candidates(pairs, ents, threshold=score_threshold)

    same_as = stage("same_as", _same_as)

    def _entities() -> DataFrame:
        return canonicalize_entities(_entities_raw(), same_as)

    entities = stage("entities", _entities)

    def _kg() -> DataFrame:
        subj_map = entities.select(
            F.col("surface").alias("subj"),
            F.col("canonical_id").alias("subj_id"),
        )
        obj_map = entities.select(
            F.col("surface").alias("obj"), F.col("canonical_id").alias("obj_id")
        )
        # entity dictionary ≪ triples at scale → broadcast both maps
        return (
            triples_raw.join(F.broadcast(subj_map), "subj")
            .join(F.broadcast(obj_map), "obj")
            .select(
                F.col("subj_id").alias("subj"),
                "pred",
                F.col("obj_id").alias("obj"),
                "conv_id",
                "turn_idx",
            )
        )

    kg_triples = stage("kg_triples", _kg)

    return {
        "triples_raw": triples_raw,
        "mentions": mentions,
        "same_as": same_as,
        "entities": entities,
        "kg_triples": kg_triples,
    }
