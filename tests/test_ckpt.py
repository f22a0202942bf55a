"""CheckpointLoop ownership: each step owns exactly the RDD its own
localCheckpoint persisted — never a concurrently persisted one."""

from __future__ import annotations

from btd.ckpt import CheckpointLoop, _checkpoint_owned, _persistent_ids


def test_checkpoint_owned_is_exact(spark):
    df = spark.range(50).selectExpr("id", "id * 2 AS y")
    before = _persistent_ids(spark)
    out, ids = _checkpoint_owned(spark, df)
    try:
        # exactly one new persisted RDD, and it is the one we own
        assert len(ids) == 1
        assert ids <= _persistent_ids(spark) - before
        assert out.count() == 50
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in ids:
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)


def test_loop_does_not_free_foreign_persist(spark):
    """An RDD persisted by 'someone else' while the loop runs must
    survive step() frees and close() — the ownership id comes from the
    checkpointed plan, not a global before/after diff."""
    foreign = spark.range(100).persist()
    foreign.count()
    try:
        loop = CheckpointLoop(spark)
        state = loop.step(spark.range(10).selectExpr("id AS a"))
        # a concurrent persist between steps (the mis-attribution window
        # of the old diff approach)
        foreign2 = spark.range(200).persist()
        foreign2.count()
        state = loop.step(state.selectExpr("a + 1 AS a"))
        loop.close(keep_last=False)
        live = _persistent_ids(spark)
        assert foreign.rdd.id() in live or foreign.storageLevel.useMemory
        assert foreign2.storageLevel.useMemory
        assert foreign2.count() == 200
    finally:
        foreign.unpersist()
        foreign2.unpersist()
