"""Live Iceberg stage round-trip — jar-gated.

The sandbox has no iceberg-spark-runtime jar, so this module SKIPS
cleanly here (the parquet+manifest fallback is covered by
tests/test_pipeline.py::test_iceberg_path_gated_off_in_sandbox).
Where the jar exists, run this file ALONE — Spark jars load at JVM
start, so the shared test session must not already be up:

    ICEBERG_JARS=/path/to/iceberg-spark-runtime-3.5_2.13-1.6.1.jar \
        python -m pytest tests/test_iceberg_live.py -x -q

The spark-submit twin of this config is documented in README.md
("Iceberg on a real cluster").
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ICEBERG_JARS"),
    reason="iceberg-spark-runtime jar not in this environment; "
    "set ICEBERG_JARS=/path/to/jar and run this file alone",
)


def test_iceberg_stage_roundtrip_live(tmp_path):
    """One KG stage table through the REAL catalog: write via
    write_stage_iceberg (identity-partitioned on pred, lineage column
    riding along), read back via spark.table, check rows, partition
    values, and that the pred filter prunes to one partition's rows."""
    from pyspark.sql import SparkSession

    from btd.materialize import have_iceberg, write_stage_iceberg

    active = SparkSession.getActiveSession()
    if active is not None and not have_iceberg(active):
        pytest.skip(
            "a non-Iceberg SparkSession is already up in this JVM; "
            "run this file alone"
        )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("btd-iceberg-live")
        .config("spark.jars", os.environ["ICEBERG_JARS"])
        .config(
            "spark.sql.catalog.btd", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.btd.type", "hadoop")
        .config("spark.sql.catalog.btd.warehouse", str(tmp_path / "wh"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        assert have_iceberg(spark)
        df = spark.range(100).selectExpr(
            "concat('s', id) AS subj",
            "CASE WHEN id % 2 = 0 THEN 'uses' ELSE 'met_with' END AS pred",
            "concat('o', id % 7) AS obj",
        )
        write_stage_iceberg(df, "btd.db.kg_triples", partition_by=["pred"])
        back = spark.table("btd.db.kg_triples")
        assert back.count() == 100
        assert "_lineage_part" in back.columns  # lineage survives
        assert {
            r.pred for r in back.select("pred").distinct().collect()
        } == {"uses", "met_with"}
        assert back.where("pred = 'uses'").count() == 50
        # identity partitioning is real: the partition column appears in
        # the table's partition spec, so the pred filter prunes files
        spec = spark.sql(
            "SELECT partition FROM btd.db.kg_triples.files LIMIT 1"
        ).columns
        assert spec == ["partition"]
        spark.sql("DROP TABLE btd.db.kg_triples")
    finally:
        spark.stop()
