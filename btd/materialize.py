"""Graph materialization with per-partition lineage + checkpoint-
resumable stage boundaries (north rule).

Iceberg is the target table format on a real cluster; its jars are not
in this sandbox, so the writer is feature-flagged: Iceberg when a
catalog is configured, else partitioned Parquet + a JSON manifest with
the identical logical layout (SURVEY.md §7.4 sandbox constraints).
A stage is "done" iff its manifest exists and row counts match —
pipeline.run() skips completed stages on restart.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_btd_manifest.json"


def have_iceberg(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is on the classpath+conf."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_stage_iceberg(
    df: DataFrame,
    table: str,
    partition_by: list[str] | None = None,
) -> None:
    """Iceberg stage write — the real-cluster path the north rule
    names ("partitioned Iceberg triple and entity tables"). Requires
    an Iceberg catalog on the classpath (``have_iceberg``); this
    sandbox has no iceberg-spark-runtime jar, so the path is exercised
    only by its guard test and on real deployments.

    Identity-partitioned on the same columns as the parquet fallback;
    Iceberg's own manifests subsume the JSON manifest (per-file row
    counts, snapshot lineage, atomic replace) and ``_lineage_part``
    still rides along as a data column.
    """
    out = df.withColumn("_lineage_part", F.spark_partition_id())
    w = out.writeTo(table).using("iceberg")
    for c in partition_by or []:
        w = w.partitionedBy(F.col(c))
    w.createOrReplace()


def write_stage(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    stage: str = "",
) -> dict:
    """Write a stage output with lineage + manifest; returns the manifest.

    Lineage: every row carries ``_lineage_part`` (the writing task's
    partition id) so any output row maps back to the exact input split
    that produced it; the manifest records per-partition row counts.

    On a real Iceberg deployment, :func:`write_stage_iceberg` is the
    drop-in replacement for this writer — there the stage bookkeeping
    this function does by hand (manifest, per-partition counts,
    ``stage_complete``) is subsumed by Iceberg snapshots and its own
    manifests, so the pipeline's stage()/read_stage() pair would read
    ``spark.table(...)`` and test snapshot existence instead of files.
    This sandbox has no Iceberg jar, so that path is not auto-
    dispatched (and is exercised only by its guard test).
    """
    out = df.withColumn("_lineage_part", F.spark_partition_id())
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    # lineage counts come from the files just written (columnar scan of
    # one int column) — counting the input DataFrame instead would run
    # the whole upstream computation a second time
    per_part = [
        (r["_lineage_part"], r["n"])
        for r in df.sparkSession.read.parquet(path)
        .groupBy("_lineage_part")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    manifest = {
        "stage": stage,
        "path": path,
        "partition_by": partition_by or [],
        "n_rows": int(sum(n for _, n in per_part)),
        "partitions": {str(p): int(n) for p, n in sorted(per_part)},
        "format": "parquet",
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def stage_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST)) and os.path.exists(
        os.path.join(path, "_SUCCESS")
    )


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_lineage_part")


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def upsert(
    existing: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE semantics without a table format: rows from ``updates``
    replace same-key rows in ``existing``; unmatched existing rows
    survive; brand-new keys insert — the incremental-maintenance
    primitive for the materialized KG (re-extracting one day of
    transcripts must not rewrite the whole graph). Where Iceberg is
    live, MERGE INTO does this transactionally; this operator is the
    engine-side batch twin the parquet+manifest fallback uses.

    Plan: union the two sides with a priority tag, ONE window keyed on
    ``keys`` ordered by priority, keep rank 1 — a single exchange,
    no join, and Spark 4 prunes it map-side (WindowGroupLimit) so only
    candidate winners travel the wire. If ``updates`` carries
    duplicate keys itself that's caller ambiguity — tie-broken
    deterministically by the remaining ORDERABLE columns (map columns
    are excluded from the tiebreak: ORDER BY on a map raises, and so
    does hashing one without a legacy flag — rows identical in every
    orderable column but differing in a map tie arbitrarily, the one
    documented hole). Helper columns are name-collision-checked
    against the input schema.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType, MapType, StructType

    cols = existing.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: {cols} vs {updates.columns}"
        )
    pri, rk = "_pri", "_rk"
    while pri in cols or rk in cols:
        pri, rk = pri + "_", rk + "_"
    tagged = updates.select(*cols).withColumn(
        pri, F.lit(0)
    ).unionByName(existing.select(*cols).withColumn(pri, F.lit(1)))

    def _has_map(dt) -> bool:
        # a map NESTED in an array/struct is just as unorderable as a
        # top-level one — ORDER BY raises AnalysisException either way
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    unorderable = {
        f.name for f in existing.schema.fields if _has_map(f.dataType)
    }
    rest = [
        F.col(c) for c in cols if c not in keys and c not in unorderable
    ]
    w = Window.partitionBy(*keys).orderBy(F.col(pri), *rest)
    return (
        tagged.withColumn(rk, F.row_number().over(w))
        .where(F.col(rk) == 1)
        .select(*cols)
    )
