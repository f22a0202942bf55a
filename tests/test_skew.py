"""Salted aggregation must be exactly equivalent to the direct groupBy
on skewed data (the fixture's hot subject)."""

from __future__ import annotations

from pyspark.sql import functions as F

from btd.skew import salted_count, salted_count_distinct


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
