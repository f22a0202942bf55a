"""Skew handling for hot keys (north rule: frequent speakers / common
tools; reference data: power-law degree with max outdegree 1.4M —
report/report.md:566-581).

Two-level salted aggregation: groupBy(key, salt) partial counts, then
groupBy(key) final sum — the same math as the reference's combiners
(Percentages.java:83) but with an explicit fan-out factor for keys so
hot that even partial aggregation leaves one reducer swamped. For
joins, AQE skew-split (enabled in btd.session) is preferred; explicit
salting (salted_count* for aggregations, salted_self_join for band
self-joins) is for keys so hot that even AQE's split granularity
leaves one reducer swamped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key: str, n_salts: int = 16, out: str = "cnt"
) -> DataFrame:
    """COUNT(*) per key, skew-safe.

    Salt = a deterministic hash of the whole row PLUS the input
    partition id, spread over n_salts buckets. No rand(): a retried
    task recomputes identical salts (spark_partition_id is stable per
    task), so shuffle retries can't double/drop rows. The partition-id
    term matters when the caller projected the frame down to the key
    column alone — a row hash would then be a pure function of the
    key (one salt per key, zero spreading; caught in the round-2
    self-review); with it, a hot key's rows still fan out across as
    many salts as input partitions. Stage 1 shuffles on (key, salt) so
    a hot key spreads over reducers; stage 2 shuffles only the salt
    partials per key.
    """
    salt = F.pmod(
        F.xxhash64(*df.columns) + F.spark_partition_id(), F.lit(n_salts)
    ).alias("_salt")
    partial = (
        df.select(key, salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias(out))


def salted_self_join(
    blocks: DataFrame,
    key: str,
    id_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Self-join of ``blocks(key, id_col)`` on ``key`` producing
    ordered pairs ``(id_a, id_b)`` with ``id_a < id_b``, salted against
    hot keys (the LSH band / block-key joins in btd.link.blocking and
    btd.dataops.dedup — a viral surface form or stopword-ish band puts
    one key's whole posting list on one reducer).

    Left rows get a deterministic salt (hash of (key, id) — no rand();
    reruns agree); right rows are replicated once per salt, so the join
    stays EQUI on (key, salt) and a hot key's pair workload spreads
    over ``n_salts`` reducers. Each (left, right) row pair meets on
    exactly one salt value, so pre-``distinct`` multiplicity — and
    therefore the result multiset — is identical to the unsalted join.
    Cost: the right side shuffles ``n_salts``× its size; use for band
    joins whose posting lists are skewed, not as the default.
    """
    a = blocks.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("id_a"),
        F.pmod(F.xxhash64(F.col(key), F.col(id_col)), F.lit(n_salts)).alias(
            "_salt"
        ),
    )
    b = blocks.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("id_b"),
        F.explode(
            F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")
        ).alias("_salt"),
    )
    return (
        a.join(b, ["_k", "_salt"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def salted_count_distinct(
    df: DataFrame,
    key: str | list[str],
    value: str,
    n_salts: int = 16,
    out: str = "cnt",
) -> DataFrame:
    """COUNT(DISTINCT value) per key (single or composite), skew-safe:
    salt by the VALUE hash so duplicates of one value land in the same
    bucket (stage-1 distinct stays correct), then sum per-bucket
    distinct counts."""
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*keys, value, salt)
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(value).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_partial").cast("long").alias(out)
    )
