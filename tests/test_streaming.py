"""Streaming smoke: incremental extraction equals the batch extractor;
windowed aggregation with watermark produces complete windows."""

from __future__ import annotations

import pytest

from btd.extract.relations import extract_triples
from btd.streaming import (
    run_to_memory,
    stream_extract_triples,
    stream_transcripts,
    windowed_turn_counts,
)


@pytest.fixture(scope="module")
def tx_path(spark, transcripts_df, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("txstream") / "transcripts")
    transcripts_df.write.parquet(p)
    return p


def test_stream_extraction_equals_batch(spark, transcripts_df, tx_path):
    stream = stream_transcripts(spark, tx_path)
    assert stream.isStreaming
    run_to_memory(stream_extract_triples(stream), "stream_triples")
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM stream_triples").collect()
    }
    expected = {tuple(r) for r in extract_triples(transcripts_df).collect()}
    assert got == expected


def test_windowed_turn_counts(spark, transcripts_df, tx_path):
    stream = stream_transcripts(spark, tx_path)
    run_to_memory(
        windowed_turn_counts(stream, "60 minutes"), "turn_windows"
    )
    # append mode emits only watermark-closed windows; verify every
    # emitted window against a batch recomputation
    got = spark.sql("SELECT * FROM turn_windows").collect()
    batch = {
        (r.window_start, r.window_end, r.conv_id): (r.n_turns, r.n_roles)
        for r in windowed_turn_counts(transcripts_df, "60 minutes").collect()
    }
    assert len(batch) > 0
    for r in got:
        key = (r.window_start, r.window_end, r.conv_id)
        assert batch[key] == (r.n_turns, r.n_roles)


def test_zscore_anomaly_stream_carries_state_across_batches(
    spark, tmp_path
):
    """The Welford state must merge across micro-batches: 9 calm
    events arrive in batch 1, the spike in batch 2 — it can only be
    flagged if batch 2 sees batch 1's (n, mean, M2)."""
    import os
    import time

    from btd.streaming import run_to_memory, zscore_anomaly_stream

    d = str(tmp_path / "ev")
    os.makedirs(d)
    calm = spark.createDataFrame(
        [(i, f"2024-01-01 00:0{i}:00", 1, 10.0 + (i % 2)) for i in range(9)],
        "event_id long, ts_s string, user_id long, value double",
    ).selectExpr("event_id", "CAST(ts_s AS timestamp) AS ts", "user_id", "value")
    spike = spark.createDataFrame(
        [(9, "2024-01-01 01:00:00", 1, 1000.0)],
        "event_id long, ts_s string, user_id long, value double",
    ).selectExpr("event_id", "CAST(ts_s AS timestamp) AS ts", "user_id", "value")
    calm.coalesce(1).write.parquet(d + "/b1")
    time.sleep(1.1)  # distinct modTime so the file source orders batches
    spike.coalesce(1).write.parquet(d + "/b2")

    stream = (
        spark.readStream.schema(calm.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/b*/")
    )
    run_to_memory(zscore_anomaly_stream(stream, threshold=2.0), "zs_anom")
    got = spark.sql("SELECT * FROM zs_anom").collect()
    assert [r["event_id"] for r in got] == [9]
    assert got[0]["n_prior"] == 9  # proves batch-1 state reached batch 2
    assert got[0]["z"] > 2


def test_zscore_anomaly_stream_skips_null_values(spark, tmp_path):
    """A NULL value must neither score nor poison the running sums —
    the SQL twin's aggregates skip NULLs (review finding r4)."""
    import os

    from btd.streaming import run_to_memory, zscore_anomaly_stream

    d = str(tmp_path / "evn")
    os.makedirs(d)
    rows = [(i, f"2024-01-01 00:0{i}:00", 1, 10.0 + (i % 2)) for i in range(8)]
    rows.append((8, "2024-01-01 00:08:00", 1, None))  # the poison pill
    rows.append((9, "2024-01-01 01:00:00", 1, 1000.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    ).selectExpr("event_id", "CAST(ts_s AS timestamp) AS ts", "user_id", "value")
    df.coalesce(1).write.parquet(d + "/b1")
    stream = spark.readStream.schema(df.schema).parquet(d + "/b1")
    run_to_memory(zscore_anomaly_stream(stream, threshold=2.0), "zs_null")
    got = spark.sql("SELECT * FROM zs_null").collect()
    assert [r["event_id"] for r in got] == [9]
    assert got[0]["n_prior"] == 8  # the NULL did not count


def test_zscore_anomaly_stream_large_magnitude_stability(spark, tmp_path):
    """Catastrophic-cancellation regression (r4 advice): with naive
    (n, Σv, Σv²) state, a constant history at large magnitude can
    compute a tiny positive variance where true variance is exactly 0,
    flipping the var>0 emission predicate. The shifted-origin moments
    make var EXACTLY 0 for constant input — no spurious anomalies —
    while a genuine spike on the same offset is still flagged."""
    import os
    import time

    from btd.streaming import run_to_memory, zscore_anomaly_stream

    d = str(tmp_path / "evbig")
    os.makedirs(d)
    c = 123456789.125  # large offset, exactly representable
    rows = [(i, f"2024-01-01 00:0{i}:00", 1, c) for i in range(9)]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    ).selectExpr(
        "event_id", "CAST(ts_s AS timestamp) AS ts", "user_id", "value"
    )
    spike = spark.createDataFrame(
        [(9, "2024-01-01 01:00:00", 1, c + 5000.0)],
        "event_id long, ts_s string, user_id long, value double",
    ).selectExpr(
        "event_id", "CAST(ts_s AS timestamp) AS ts", "user_id", "value"
    )
    df.coalesce(1).write.parquet(d + "/b1")
    time.sleep(1.1)
    spike.coalesce(1).write.parquet(d + "/b2")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/b*/")
    )
    run_to_memory(zscore_anomaly_stream(stream, threshold=2.0), "zs_big")
    got = spark.sql("SELECT * FROM zs_big").collect()
    # constant rows never emit (var is exactly 0 despite the offset);
    # the spike arrives with zero prior variance, so it does not emit
    # either under the var>0 guard — the whole stream stays silent
    assert got == []
    # same offset WITH real jitter: the spike must still be caught
    d2 = str(tmp_path / "evbig2")
    os.makedirs(d2)
    rows2 = [
        (i, f"2024-01-01 00:0{i}:00", 1, c + (i % 2)) for i in range(9)
    ]
    rows2.append((9, "2024-01-01 01:00:00", 1, c + 5000.0))
    df2 = spark.createDataFrame(
        rows2, "event_id long, ts_s string, user_id long, value double"
    ).selectExpr(
        "event_id", "CAST(ts_s AS timestamp) AS ts", "user_id", "value"
    )
    df2.coalesce(1).write.parquet(d2 + "/b1")
    stream2 = spark.readStream.schema(df2.schema).parquet(d2 + "/b1")
    run_to_memory(zscore_anomaly_stream(stream2, threshold=2.0), "zs_big2")
    got2 = spark.sql("SELECT * FROM zs_big2").collect()
    assert [r["event_id"] for r in got2] == [9]
    assert got2[0]["z"] > 2
