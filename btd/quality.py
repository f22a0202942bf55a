"""Data-quality operators: table profiling and constraint checking.

A 100 TB ingest pipeline runs these before anything else — nulls where
the extractor expects text, duplicate keys that double-count degrees,
dangling foreign keys that silently drop joins. Both operators are
single-pass Catalyst aggregations; nothing touches the driver beyond
the tiny result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value):
    one row per profiled column, min/max rendered as strings so the
    long format is schema-stable across column types.

    Numeric columns are profiled NUMERICALLY (typed min/max, then
    rendered) — lexicographic min/max of stringified numbers is both
    semantically wrong ("10" < "9") and engine-unstable (Java's
    shortest-round-trip Double.toString vs DuckDB's float formatting
    diverge on scientific-notation thresholds, e.g. 1.0E-4 vs 0.0001,
    which then shifts the lexicographic extremes). Fractional values
    render with a fixed ``%.6f`` format after ROUND(,6) (+0.0 kills
    the -0.0 class), integers via plain cast — both render
    identically in Spark and DuckDB. Non-numeric columns keep the
    cast-then-min lexicographic contract (order-preserving for ISO
    timestamps/dates; the only option for maps/arrays).

    ONE aggregation pass over the table. ``exact=True`` uses
    count_distinct — Catalyst compiles multiple distinct aggregates
    via Expand (input replicated once per distinct column), the
    standard exact-profile cost; at 100 TB set ``exact=False`` for
    approx_count_distinct (HLL++, one pass, no Expand) — the counts
    are then estimates, everything else stays exact. The single
    result row pivots to long form with stack(), driver-free.
    """
    from pyspark.sql.types import FractionalType, NumericType

    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    # rsd applies to the HLL++ path only; estimates are deterministic
    # (fixed hash, no RNG), and at cardinalities far below the register
    # count they land exact — tighter rsd widens that regime (measured:
    # rsd 0.002 is exact through ~150 distinct; the gate leans on this)
    cd = (
        F.count_distinct
        if exact
        else (lambda c: F.approx_count_distinct(c, rsd))
    )

    def _rendered(agg_fn, c):
        dt = df.schema[c].dataType
        if isinstance(dt, FractionalType):
            v = F.round(agg_fn(F.col(c)), 6) + F.lit(0.0)
            # NULL-guard: format_string("%.6f", NULL) is not NULL-safe
            # across engines; an all-NULL column must profile to NULL
            return F.when(v.isNotNull(), F.format_string("%.6f", v))
        if isinstance(dt, NumericType):
            return agg_fn(F.col(c)).cast("string")
        return agg_fn(F.col(c).cast("string"))

    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            cd(F.col(c)).alias(f"_nd_{c}"),
            _rendered(F.min, c).alias(f"_mn_{c}"),
            _rendered(F.max, c).alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)",
        "_n AS n_rows",
    ).select(
        "column",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def fk_violations(
    child: DataFrame, key: str, parent: DataFrame, pkey: str
) -> DataFrame:
    """Child rows whose ``key`` has no match in ``parent.pkey`` —
    referential-integrity violations as a DataFrame (count it, sample
    it, or quarantine-write it). NULL keys are violations too (a NULL
    FK never joins; surfacing it here beats losing the row silently in
    a downstream inner join).

    One left-anti equi-join; Catalyst broadcasts the parent key set
    when it is dimension-sized, else shuffles both sides on the key —
    exactly the plan the real join downstream would use, so checking
    costs no more than one of the joins it protects.
    """
    keys = parent.select(F.col(pkey).alias(key)).where(
        F.col(key).isNotNull()
    ).distinct()
    return child.join(keys, on=key, how="left_anti")


def constraint_report(
    checks: dict[str, DataFrame],
) -> DataFrame:
    """(constraint, n_violations): count each named violation frame —
    the one-line health readout a pipeline gates deploys on. Counts
    run as independent jobs (each a single aggregate); the union of
    1-row frames is driver-free."""
    from functools import reduce

    parts = [
        df.agg(
            F.lit(name).alias("constraint"),
            F.count(F.lit(1)).alias("n_violations"),
        )
        for name, df in checks.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows belonging to a key group that occurs more than once — the
    uniqueness-constraint violation set (every member of a duplicated
    group is returned, so the caller sees WHAT collided, not just that
    something did).

    One window count over the key exchange — no self-join, no groupBy
    + join-back round trip; at scale this is the same single shuffle
    the dedup that would FIX the violation costs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_kc", F.count(F.lit(1)).over(w))
        .where(F.col("_kc") > 1)
        .drop("_kc")
    )
