"""Structured Streaming layer.

The reference is batch-only (report/report.md:646, "No real time
computations"), so none of this is parity-critical — it extends the
engine the way a production transcript pipeline would run: transcripts
arrive continuously, extraction is incremental (narrow → append mode),
and event-time windowed aggregation with a watermark bounds state for
late data. The same extraction kernel (btd.extract.relations) serves
batch and streaming — one codepath to validate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btd.extract.relations import extract_triples
from btd.schema import TRANSCRIPTS


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript parquet (schema enforced —
    streaming sources never infer)."""
    return spark.readStream.schema(TRANSCRIPTS).parquet(path)


def stream_extract_triples(transcripts: DataFrame) -> DataFrame:
    """Incremental KG extraction: stateless/narrow, so append-mode with
    no watermark needed; each micro-batch extracts independently."""
    return extract_triples(transcripts)


def windowed_turn_counts(
    transcripts: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time turns-per-conversation-per-window with a watermark
    bounding state: late rows beyond the watermark are dropped, state
    for closed windows is evicted — the thing that makes this runnable
    forever at 10^12-turn scale."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide or window).alias("w"),
            "conv_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            # exact distinct aggs are unsupported on streaming DFs;
            # approx (HLL) is the streaming-native answer
            F.approx_count_distinct("role").alias("n_roles"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id",
            "n_turns",
            "n_roles",
        )
    )


def run_to_memory(df: DataFrame, name: str) -> None:
    """Drain all available input synchronously into a memory sink —
    the local smoke path (production uses kafka/iceberg sinks with
    checkpointLocation)."""
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
