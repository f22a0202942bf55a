"""End-to-end KG pipeline: P/R vs ground truth after linking,
checkpoint resume, lineage manifests."""

from __future__ import annotations

import json
import os

import pytest

from btd import pipeline
from btd.fixtures import GAZETTEER
from btd.materialize import MANIFEST, read_manifest, stage_complete


@pytest.fixture(scope="module")
def pipe_out(spark, transcripts_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg"))
    res = pipeline.run(spark, transcripts_df, out)
    return out, res


def test_end_to_end_pr(spark, pipe_out, transcripts_fixture):
    """North-rule gate: canonicalized triples match ground truth at
    P/R >= 0.95 (here exactly, by construction of the fixture)."""
    out, res = pipe_out
    _, expected_list = transcripts_fixture
    # map gazetteer canonicals to elected representatives (min surface)
    rep = {c: min(fs) for c, fs in GAZETTEER.items()}
    expected = {(rep[a], p, rep[b]) for a, p, b in expected_list}
    got = {(r.subj, r.pred, r.obj) for r in res["kg_triples"].collect()}
    tp = len(got & expected)
    assert tp / len(got) >= 0.95, "precision"
    assert tp / len(expected) >= 0.95, "recall"


def test_all_stage_manifests(pipe_out):
    out, _ = pipe_out
    for s in ("triples_raw", "mentions", "same_as", "entities", "kg_triples"):
        p = os.path.join(out, s)
        assert stage_complete(p)
        m = read_manifest(p)
        assert m["stage"] == s
        assert m["n_rows"] == sum(m["partitions"].values())
        assert m["n_rows"] > 0


def test_resume_skips_completed_stages(spark, pipe_out, transcripts_df):
    out, first = pipe_out
    # poison one upstream manifest mtime marker: rerun must NOT rewrite
    before = {
        s: os.path.getmtime(os.path.join(out, s, MANIFEST))
        for s in ("triples_raw", "entities")
    }
    res2 = pipeline.run(spark, transcripts_df, out)
    after = {
        s: os.path.getmtime(os.path.join(out, s, MANIFEST))
        for s in ("triples_raw", "entities")
    }
    assert before == after, "completed stages were recomputed"
    assert res2["kg_triples"].count() == first["kg_triples"].count()


def test_resume_recomputes_missing_stage(spark, pipe_out, transcripts_df):
    out, first = pipe_out
    n_before = first["kg_triples"].count()
    os.remove(os.path.join(out, "kg_triples", MANIFEST))
    res = pipeline.run(spark, transcripts_df, out)
    assert stage_complete(os.path.join(out, "kg_triples"))
    assert res["kg_triples"].count() == n_before


def test_lineage_column_written(spark, pipe_out):
    out, _ = pipe_out
    df = spark.read.parquet(os.path.join(out, "kg_triples"))
    assert "_lineage_part" in df.columns
    m = read_manifest(os.path.join(out, "kg_triples"))
    got = {
        str(r._lineage_part): r.n
        for r in df.groupBy("_lineage_part").count().withColumnRenamed("count", "n").collect()
    }
    assert got == {k: v for k, v in m["partitions"].items()}


def test_gazetteer_cap_bounds_mention_surfaces(
    spark, transcripts_df, tmp_path, caplog
):
    """The fixture's distinct surface count exceeds the cap: the
    mention stage must (a) keep only the top-cap surfaces by frequency
    and (b) log the truncation (no silent caps)."""
    import logging

    from pyspark.sql import functions as F

    from btd.extract.relations import extract_triples

    cap = 3
    freq = (
        extract_triples(transcripts_df)
        .select(F.explode(F.array("subj", "obj")).alias("s"))
        .groupBy("s")
        .count()
    )
    n_surfaces = freq.count()
    assert n_surfaces > cap, "fixture must exceed the cap for this test"
    expected = {
        r["s"]
        for r in freq.orderBy(F.desc("count"), F.asc("s")).limit(cap).collect()
    }
    with caplog.at_level(logging.WARNING, logger="btd.pipeline"):
        res = pipeline.run(
            spark, transcripts_df, str(tmp_path / "kg"), gazetteer_cap=cap
        )
        got = {r.surface for r in res["mentions"].collect()}
    assert got <= expected
    assert any("gazetteer truncated" in r.message for r in caplog.records)


def test_iceberg_path_gated_off_in_sandbox(spark):
    """No iceberg-spark-runtime jar here: have_iceberg is False and
    write_stage takes the parquet+manifest fallback even for
    table-identifier-looking paths under a dir (the dispatch requires
    BOTH a catalog and a slash-free identifier)."""
    from btd.materialize import have_iceberg

    assert have_iceberg(spark) is False
