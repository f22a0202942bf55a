"""Salted aggregation must be exactly equivalent to the direct groupBy
on skewed data (the fixture's hot subject)."""

from __future__ import annotations

from pyspark.sql import functions as F

from btd.skew import salted_count, salted_count_distinct, salted_self_join


def test_salted_count_equiv(spark, triples_df):
    direct = {
        r.subject: r.cnt
        for r in triples_df.groupBy("subject")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    salted = {
        r.subject: r.cnt
        for r in salted_count(triples_df, "subject").collect()
    }
    assert salted == direct
    assert max(direct.values()) > 100  # fixture really is skewed


def test_salted_count_spreads_key_only_frame(spark):
    """A frame projected down to the key column alone must STILL
    spread a hot key over multiple salts (regression: a pure row-hash
    salt was a function of the key, one group per key)."""
    from pyspark.sql import functions as F

    df = spark.range(2000).repartition(8).select(F.lit("hot").alias("k"))
    salted = {r.k: r.cnt for r in salted_count(df, "k").collect()}
    assert salted == {"hot": 2000}
    n_groups = (
        df.select(
            "k",
            F.pmod(
                F.xxhash64("k") + F.spark_partition_id(), F.lit(16)
            ).alias("s"),
        )
        .distinct()
        .count()
    )
    assert n_groups > 1, "hot key still funnels to a single salt"


def _unsalted_pairs(blocks):
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(b, "k")
        .where(F.col("a.i") < F.col("b.i"))
        .select(F.col("a.i").alias("id_a"), F.col("b.i").alias("id_b"))
        .distinct()
    )


def test_salted_self_join_equiv_on_hot_band(spark):
    """One band key holds 80 of 100 ids (a viral band): the salted
    self-join must return the exact pair set of the direct join."""
    blocks = spark.range(100).select(
        F.when(F.col("id") < 80, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        F.col("id").alias("i"),
    )
    direct = {(r.id_a, r.id_b) for r in _unsalted_pairs(blocks).collect()}
    salted = {
        (r.id_a, r.id_b)
        for r in salted_self_join(blocks, "k", "i", n_salts=8).collect()
    }
    assert salted == direct
    assert len(direct) > 80 * 79 // 2  # hot band dominates the pair set


def test_candidate_pairs_salted_matches_unsalted(spark):
    """The blocking stage with salt_hot_bands on must emit the same
    candidate set (duplicate surfaces → shared bands → hot keys)."""
    from btd.link.blocking import candidate_pairs

    rows = [
        (f"e{i}", "acme corp" if i % 3 else f"widget co {i}")
        for i in range(60)
    ]
    ents = spark.createDataFrame(rows, ["entity_id", "surface"])
    plain = {(r.id_a, r.id_b) for r in candidate_pairs(ents).collect()}
    salted = {
        (r.id_a, r.id_b)
        for r in candidate_pairs(ents, salt_hot_bands=8).collect()
    }
    assert salted == plain and plain


def test_minhash_candidates_salted_matches_unsalted(spark):
    """Dedup band join with salting on: same candidate pairs (the
    repeated boilerplate text is the hot band)."""
    from btd.dataops.dedup import minhash_candidates

    rows = [
        (
            i,
            "the quick brown fox jumps over the lazy dog again"
            if i % 2
            else f"document {i} body text with words {i * 7} {i * 13}",
        )
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = {(r.id_a, r.id_b) for r in minhash_candidates(docs).collect()}
    salted = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(docs, salt_hot_bands=8).collect()
    }
    assert salted == plain and plain


def test_salted_count_distinct_equiv(spark, triples_df):
    direct = {
        r.subject: r.cnt
        for r in triples_df.groupBy("subject")
        .agg(F.count_distinct("context").alias("cnt"))
        .collect()
    }
    salted = {
        r.subject: r.cnt
        for r in salted_count_distinct(
            triples_df, "subject", "context"
        ).collect()
    }
    assert salted == direct
