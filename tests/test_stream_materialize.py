"""Streaming materialization: exactly-once across a stop/restart —
no duplicate triples, no gaps, partitioned output."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from btd.extract.relations import extract_triples
from btd.schema import TRANSCRIPTS
from btd.streaming import stream_materialize_triples


def test_exactly_once_across_restart(spark, transcripts_df, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    half1 = transcripts_df.where(F.col("conv_id") < "conv0015")
    half2 = transcripts_df.where(F.col("conv_id") >= "conv0015")
    half1.coalesce(1).write.parquet(f"{src}/drop1")

    def start():
        stream = spark.readStream.schema(TRANSCRIPTS).parquet(f"{src}/drop*/")
        return stream_materialize_triples(stream, out, ckpt)

    q = start()
    q.processAllAvailable()
    q.stop()
    n_after_1 = spark.read.parquet(out).count()
    assert n_after_1 == extract_triples(half1).count()

    # second drop lands while the query is DOWN; restart must pick up
    # only the new files (WAL) — no reprocessing of drop1
    half2.coalesce(1).write.parquet(f"{src}/drop2")
    q = start()
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    expected = extract_triples(transcripts_df)
    assert got.count() == expected.count()  # no dups, no gaps
    g = {tuple(r) for r in got.select("subj", "pred", "obj", "conv_id", "turn_idx").collect()}
    e = {tuple(r) for r in expected.collect()}
    assert g == e
    # partitioned layout on disk
    assert any(d.startswith("pred=") for d in os.listdir(out))
