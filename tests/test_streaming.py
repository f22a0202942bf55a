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
