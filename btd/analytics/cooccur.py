"""Basket co-occurrence: item pairs that appear together, counted by
shared basket — association mining's candidate-pair primitive (the
support-counting pass of A-Priori / market-basket analysis), and on a
KG the "entities mentioned in the same context" affinity signal.

The scale discipline is the per-basket self-join: pair volume is
Σ m_b² over basket sizes m_b — bounded by the data model's basket
width, NOT the corpus size, so it stays linear as baskets accumulate.
The hazard is a pathological mega-basket (one basket holding 10⁵
items → 10¹⁰ pairs); ``max_basket_size`` purges those before pairing,
the same guard the LSH blocking join uses (btd/link/blocking.py).
The pair aggregation itself keys on (item_a, item_b) — hot ITEMS are
harmless because no shuffle keys on a single item.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def basket_cooccurrence(
    df: DataFrame,
    basket: str,
    item: str,
    min_shared: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_baskets): unordered item pairs co-occurring
    in at least ``min_shared`` distinct baskets, item_a < item_b.

    Plan: distinct (basket, item) — one exchange that also de-dupes
    repeated items within a basket — then a self-equi-join on basket
    (co-partitioned: both sides arrive hashed by basket, so the join
    itself is shuffle-free on top of the distinct), then one
    partial-aggregated count keyed by the pair. With
    ``max_basket_size``, basket widths are counted with a window over
    the same basket-hashed exchange and oversized baskets dropped
    before pairing (purged baskets would dominate pair volume while
    carrying near-zero signal — every pair in a mega-basket has
    support ≥ its size only from itself).
    """
    items = df.select(
        F.col(basket).alias("_b"), F.col(item).alias("_i")
    ).distinct()
    if max_basket_size is not None:
        w = Window.partitionBy("_b")
        items = (
            items.withColumn("_sz", F.count(F.lit(1)).over(w))
            .where(F.col("_sz") <= max_basket_size)
            .drop("_sz")
        )
    a = items
    b = items.select("_b", F.col("_i").alias("_j"))
    return (
        a.join(b, "_b")
        .where(F.col("_i") < F.col("_j"))
        .groupBy(
            F.col("_i").alias("item_a"), F.col("_j").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .where(F.col("n_baskets") >= min_shared)
    )
