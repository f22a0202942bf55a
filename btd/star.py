"""Star-schema → triples bridge for the driver's correctness gate.

FIXTURES.md §3: the reference analyses are expressed over graph edges
derived from the TPC-H-ish testdata so both engines (Spark, DuckDB
oracle) run the same logical query:

- ``orders``:   (customer) --ordered-->  (order),      context ''
- ``lineitem``: (order)    --contains--> (part),       context = supplier
- blank-node analog: ``o_custkey % 10 = 0`` / ``l_partkey % 7 = 0``
  get a ``_:`` prefix so startswith('_') predicates fire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _iri(prefix: str, key):
    return F.concat(F.lit(f"<{prefix}"), key.cast("string"), F.lit(">"))


def _maybe_blank(prefix: str, key, mod: int):
    return F.when(
        key % mod == 0, F.concat(F.lit(f"_:{prefix}"), key.cast("string"))
    ).otherwise(_iri(prefix, key))


def edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """triples(subject, predicate, object, context) over the star schema."""
    orders = load(spark, sf_dir, "orders").select(
        _maybe_blank("c", F.col("o_custkey"), 10).alias("subject"),
        F.lit("<ordered>").alias("predicate"),
        _iri("o", F.col("o_orderkey")).alias("object"),
        F.lit("").alias("context"),
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        _iri("o", F.col("l_orderkey")).alias("subject"),
        F.lit("<contains>").alias("predicate"),
        _maybe_blank("p", F.col("l_partkey"), 7).alias("object"),
        _iri("s", F.col("l_suppkey")).alias("context"),
    )
    return orders.unionByName(lineitem)


#: DuckDB twin of :func:`edges` — keep semantics in lockstep.
EDGES_SQL = """
SELECT CASE WHEN o_custkey % 10 = 0
            THEN '_:c' || CAST(o_custkey AS VARCHAR)
            ELSE '<c' || CAST(o_custkey AS VARCHAR) || '>' END AS subject,
       '<ordered>' AS predicate,
       '<o' || CAST(o_orderkey AS VARCHAR) || '>' AS object,
       '' AS context
FROM orders
UNION ALL
SELECT '<o' || CAST(l_orderkey AS VARCHAR) || '>' AS subject,
       '<contains>' AS predicate,
       CASE WHEN l_partkey % 7 = 0
            THEN '_:p' || CAST(l_partkey AS VARCHAR)
            ELSE '<p' || CAST(l_partkey AS VARCHAR) || '>' END AS object,
       '<s' || CAST(l_suppkey AS VARCHAR) || '>' AS context
FROM lineitem
"""
