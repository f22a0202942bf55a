"""Bucketed tables: a join on the bucket key must not shuffle either
side (the 100 TB co-location story, proven at the plan level)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from btd.catalog import drop, save_bucketed, table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    save_bucketed(orders, "b_orders", "o_orderkey", 8)
    save_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    yield
    drop(spark, "b_orders")
    drop(spark, "b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    """These tiny test tables would otherwise broadcast-join, which
    hides the bucketing effect under test."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed, no_broadcast):
    j = table(spark, "b_orders").join(table(spark, "b_lineitem"), "o_orderkey")
    plan = _plan(j)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in plan, plan


def test_bucketed_join_correct(spark, bucketed):
    j = table(spark, "b_orders").join(table(spark, "b_lineitem"), "o_orderkey")
    plain = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").join(
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "o_orderkey",
    )
    assert j.count() == plain.count()


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    agg = (
        table(spark, "b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in _plan(agg)