"""Bucketed-table catalog: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of the linking/materialize joins is the
shuffle of the big fact side. Bucketing writes the table pre-hashed on
the join key (``bucketBy``), so any later equi-join or aggregation on
that key reads co-located buckets and skips the exchange entirely —
the plan-level proof is asserted in tests/test_catalog.py (no Exchange
under the SortMergeJoin).

Iceberg would subsume this with partition transforms + sorted files;
in this sandbox the built-in session catalog (parquet + Derby-free
in-memory metastore) provides the same physical property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    name: str,
    key: str | list[str],
    n_buckets: int = 16,
) -> None:
    """Persist df hash-bucketed (and sorted) on the join/agg key."""
    keys = [key] if isinstance(key, str) else key
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(name)
    )


def table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def drop(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
