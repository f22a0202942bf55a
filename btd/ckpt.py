"""Checkpoint hygiene for iterative driver loops.

``localCheckpoint`` cuts lineage (mandatory for fixpoint loops — the
plan would otherwise grow per iteration) but its blocks stay in
executor storage memory for the session lifetime: a 10-iteration
PageRank leaves 10 superseded rank snapshots cached. On a shared
long-lived cluster (or this repo's bench session) that steals storage
from every later job — measured 2.3s → 9.2s regression on an unrelated
aggregation after one PageRank run.

``CheckpointLoop`` tracks which persisted RDD each checkpoint created
and frees a step's blocks as soon as the next step's checkpoint has
materialized — eager ``localCheckpoint`` guarantees the successor no
longer reads them. Static inputs (edge lists) stay pinned until
``close()``; the loop's final result keeps its checkpoint (the caller
consumes it).

Ownership is read off the checkpointed DataFrame itself: its analyzed
plan is a ``LogicalRDD`` wrapping exactly the persisted RDD, so the id
is exact even when concurrent jobs in the same SparkSession persist
RDDs at the same time (a before/after diff of
``getPersistentRDDs`` would mis-attribute those and later unpersist
someone else's cache). The diff remains only as a fallback if the
py4j plan accessor ever changes shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _persistent_ids(spark: SparkSession) -> set[int]:
    return {int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}


def _checkpoint_owned(spark: SparkSession, df: DataFrame) -> tuple[DataFrame, set[int]]:
    """localCheckpoint ``df`` and return (checkpointed df, the id set of
    the persisted RDD it owns)."""
    before = _persistent_ids(spark)
    out = df.localCheckpoint()
    try:
        ids = {int(out._jdf.queryExecution().analyzed().rdd().id())}
    except Exception:  # py4j internals moved: fall back to the diff
        ids = _persistent_ids(spark) - before
    return out, ids


class CheckpointLoop:
    """Scoped manager for an iterative algorithm's checkpoints."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._static_ids: set[int] = set()
        self._step_ids: set[int] = set()
        self._deferred: set[int] = set()

    def static(self, df: DataFrame) -> DataFrame:
        """Checkpoint a loop-invariant input; freed at ``close()``."""
        out, ids = _checkpoint_owned(self._spark, df)
        self._static_ids |= ids
        return out

    def step(self, df: DataFrame, free_prev: bool = True) -> DataFrame:
        """Checkpoint one iteration's state; frees the previous
        iteration's blocks (the new checkpoint is already material).
        Pass ``free_prev=False`` when the loop still reads the previous
        state after this call (e.g. a convergence diff), then call
        :meth:`release_prev` once done with it."""
        out, new = _checkpoint_owned(self._spark, df)
        if free_prev:
            self._free(self._step_ids)
        else:
            self._deferred |= self._step_ids
        self._step_ids = new
        return out

    def release_prev(self) -> None:
        """Free blocks of steps retained with ``free_prev=False``."""
        self._free(self._deferred)
        self._deferred = set()

    def rollback_step(self) -> None:
        """Free the CURRENT step's blocks and restore the previous step
        (retained with ``free_prev=False``) as current — for loops
        whose convergence check decides the newest step is not needed
        and the PREVIOUS state is the result the caller keeps."""
        self._free(self._step_ids)
        self._step_ids = self._deferred
        self._deferred = set()

    def close(self, keep_last: bool = True) -> None:
        """Free static checkpoints, any deferred prior-step blocks, and
        (unless ``keep_last``) the final step's. Call after the last
        ``step()`` has been produced — its materialized data no longer
        depends on the statics."""
        self._free(self._static_ids)
        self._static_ids = set()
        self._free(self._deferred)  # loop may exit before release_prev
        self._deferred = set()
        if not keep_last:
            self._free(self._step_ids)
            self._step_ids = set()

    def _free(self, ids: set[int]) -> None:
        jmap = self._spark.sparkContext._jsc.getPersistentRDDs()
        for rid in ids:
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)
