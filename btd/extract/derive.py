"""Derive a deterministic transcripts table from the driver's ``events``
testdata (TESTDATA.md) — the north-rule input shape
(conv_id, turn_idx, role, text, tool, ts) synthesized at small scale
with NO external data, identically expressible in Spark and DuckDB so
every KG stage gets a full SQL oracle twin.

Construction: one event = one turn; conversations keyed by user;
turn_idx = rank of the event inside its conversation by (ts, event_id);
turn text is a templated sentence the relation extractor understands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    uid = F.col("user_id").cast("string")
    t = ev.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    text = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit("u"), uid, F.lit(" uses "), F.col("event_type"), F.lit(".")),
    ).otherwise(
        F.concat(
            F.lit("u"), uid, F.lit(" met with crew "), F.col("event_type"), F.lit(".")
        )
    )
    role = (
        F.when(F.col("turn_idx") % 3 == 0, "user")
        .when(F.col("turn_idx") % 3 == 1, "assistant")
        .otherwise("tool")
    )
    return t.select(
        F.concat(F.lit("conv"), uid).alias("conv_id"),
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        F.col("event_type").alias("tool"),
        "ts",
    )


#: DuckDB twin — keep in lockstep with transcripts_from_events.
TRANSCRIPTS_SQL = """
SELECT 'conv' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
            AS INTEGER) AS turn_idx,
       CASE CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
                 AS INTEGER) % 3
            WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       CASE WHEN event_id % 2 = 0
            THEN 'u' || CAST(user_id AS VARCHAR) || ' uses ' || event_type || '.'
            ELSE 'u' || CAST(user_id AS VARCHAR) || ' met with crew ' || event_type || '.'
       END AS text,
       event_type AS tool,
       ts
FROM events
"""
