"""SparkSession builder tuned for this engine.

Local mode here stands in for a multi-executor cluster: the confs below
(AQE, skew-join splitting, Arrow batching, shuffle partitions ≈ cores)
are exactly what we'd ship to a 1000-executor job; only master/memory
are sandbox-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "btd",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: parallelism for local mode (``local[cores]``); default
    ``$SPARK_GRAFT_CPUS`` or ``*``. On a real cluster this builder is
    used with ``spark-submit --py-files`` and master comes from the
    submit environment — the SQL confs are cluster-valid as-is.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or None
    master = f"local[{cores}]" if cores else "local[*]"
    shuffle_partitions = shuffle_partitions or (cores or os.cpu_count() or 8)
    # Under spark-submit the master (and deploy mode) come from the
    # submit command line — PythonRunner exports PYSPARK_GATEWAY_PORT —
    # and a builder-set master would override it. Only pin local[N]
    # when self-launched (tests, bench, python -m btd.cli).
    b = SparkSession.builder.appName(app_name)
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        b = b.master(master)
    b = (
        b
        # AQE: runtime coalescing + skew-join splitting — the explicit
        # skew story for hot entities (SURVEY.md §4: power-law degree,
        # max outdegree 1.4M in the reference data).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas-UDF boundary (input_hint: vectorized
        # pandas/Arrow UDFs, no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamps for the DuckDB oracle comparison.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("BTD_DRIVER_MEM", "24g"))
        # catalog warehouse for bucketed tables (btd.catalog); kept out
        # of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("BTD_WAREHOUSE", "/tmp/btd_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
