"""Candidate-pair blocking: hand-rolled MinHash-LSH, pure Catalyst.

Hand-rolled rather than pyspark.ml MinHashLSH so hashes are
deterministic across runs/engines (md5-based, no seeded JVM RNG) and
there is no MLlib/Vector dependency — every step is DataFrame ops that
whole-stage-codegen.

Pipeline: normalize surface → char-3gram shingles (explode) →
NUM_HASHES min-hashes (one groupBy) → LSH bands → self-join on band key.
A second, cheap blocker on the last name-token catches person-name
variants whose shingle jaccard is too low for LSH (standard multi-pass
blocking). Self-join is on (band, key) — at scale AQE skew-split
handles hot bands (stopword-ish tokens), and candidates are
deduplicated before scoring so each pair is scored once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUM_HASHES = 8
BAND_SIZE = 2  # 4 bands × 2 rows


def normalize(col):
    """Lowercase, strip punctuation, drop legal suffixes, squeeze spaces."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", "")
    c = F.regexp_replace(c, r"\b(corp|corporation|inc|llc|co|ltd)\b", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def shingles(col, n: int = 3):
    """Distinct char n-grams of a (short) string, as an array column."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(0, greatest(length({col}) - {n}, 0)),"
            f" i -> substring({col}, i + 1, {n}))"
        )
    )


def minhash_signatures(entities: DataFrame) -> DataFrame:
    """entities(entity_id, surface) → (entity_id, sig_0..sig_{k-1}).

    min-hash_i = MIN over shingles of md5(i || shingle): one explode +
    one groupBy with k partial-aggregated mins — a single shuffle keyed
    on entity_id regardless of k.
    """
    sh = entities.select(
        "entity_id",
        F.explode(shingles("norm")).alias("shingle"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i) + ":"), F.col("shingle")))).alias(
            f"sig_{i}"
        )
        for i in range(NUM_HASHES)
    ]
    return sh.groupBy("entity_id").agg(*aggs)


def candidate_pairs(
    entities: DataFrame, salt_hot_bands: int | None = None
) -> DataFrame:
    """entities(entity_id, surface) → (id_a, id_b) candidate pairs,
    id_a < id_b, deduplicated across blockers.

    ``salt_hot_bands``: replicate-salt the band self-join over that
    many salts (btd.skew.salted_self_join) when a viral surface form
    makes one band's posting list swamp a reducer past what AQE
    skew-split fixes; result is identical either way.
    """
    ents = entities.withColumn("norm", normalize(F.col("surface")))

    # --- blocker 1: MinHash-LSH bands -------------------------------
    sigs = minhash_signatures(ents)
    n_bands = NUM_HASHES // BAND_SIZE
    bands = sigs.select(
        "entity_id",
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(str(b)),
                            *[
                                F.col(f"sig_{b * BAND_SIZE + r}")
                                for r in range(BAND_SIZE)
                            ],
                        )
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("block_key"),
    )

    # --- blocker 2: last name-token ----------------------------------
    tokens = ents.select(
        "entity_id",
        F.concat(F.lit("tok:"), F.element_at(F.split("norm", " "), -1)).alias(
            "block_key"
        ),
    )

    blocks = bands.unionByName(tokens)
    if salt_hot_bands:
        from btd.skew import salted_self_join

        return salted_self_join(
            blocks, "block_key", "entity_id", n_salts=salt_hot_bands
        )
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(b, "block_key")
        .where(F.col("a.entity_id") < F.col("b.entity_id"))
        .select(
            F.col("a.entity_id").alias("id_a"),
            F.col("b.entity_id").alias("id_b"),
        )
        .distinct()
    )
