"""Kernel equivalence: the BLAS fast paths must produce exactly the
rows of their Catalyst fold-per-pair counterparts (same ROUND(,6)
values) — the license for substituting them in the driver contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from btd.dataops.similarity import (
    blas_near_dup,
    blas_topk,
    brute_force_topk,
    cosine_near_dup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    df.persist()
    df.count()
    return df


def test_blas_topk_equals_fold_topk(spark, emb):
    fold = {tuple(r) for r in brute_force_topk(emb, 3).collect()}
    blas = {tuple(r) for r in blas_topk(emb, 3).collect()}
    assert blas == fold


def test_blas_near_dup_equals_fold_near_dup(spark, emb):
    fold = {tuple(r) for r in cosine_near_dup(emb, 0.4).collect()}
    blas = {tuple(r) for r in blas_near_dup(emb, 0.4).collect()}
    assert blas == fold
    assert len(fold) > 0  # threshold low enough to be non-trivial


def test_lsh_near_dup_precision_and_recall_vs_blas(spark, emb):
    """The bucketed 100 TB near-dup path vs the exact baseline:
    precision must be 1 (every emitted pair is an exact-baseline pair
    with the identical ROUND(,6) cosine — candidates are scored with
    the same float path, never estimated from the sketch) and recall
    must clear the floor the deterministic hyperplanes yield on this
    corpus. Random 64-dim vectors at cosine 0.45 are the adversarial
    recall case (collision p ≈ 0.65/plane); real near-dup corpora sit
    at cosine ≥ 0.99 where p ≈ 0.955 and table-recall ≈ 1 — pinned by
    the planted-duplicate test below."""
    from btd.dataops.similarity import auto_lsh_bits, lsh_near_dup

    exact = {tuple(r) for r in blas_near_dup(emb, 0.45).collect()}
    bits = auto_lsh_bits(emb.count())
    got = {
        tuple(r)
        for r in lsh_near_dup(emb, dim=64, threshold=0.45, bits=bits).collect()
    }
    assert got <= exact  # precision 1, cosines byte-identical
    assert len(exact) > 0
    assert len(got) / len(exact) >= 0.7  # deterministic: 5/7 here


def test_lsh_near_dup_finds_all_planted_duplicates(spark, emb):
    """At the operating point that matters for dedup (threshold 0.99),
    recall on true duplicates is exactly 1: an identical vector lands
    in the same bucket of EVERY table, so no planted copy can escape
    the candidate join."""
    from pyspark.sql import functions as F

    from btd.dataops.similarity import lsh_near_dup

    copies = emb.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    n_copies = copies.count()
    planted = emb.unionByName(copies)
    got = lsh_near_dup(planted, dim=64, threshold=0.99).where(
        (F.col("id_b") - F.col("id_a")) == 1_000_000
    )
    assert got.count() == n_copies > 0


def test_pair_scorer_matches_bucket_local_cosines(spark, emb):
    """_pair_scorer (the general external-candidate scorer) must emit
    the identical ROUND(,6) cosine as the bucket-local kernel for the
    same pairs — one float contract across both scoring backends."""
    import pyspark.sql.functions as F

    from btd.dataops.similarity import _pair_scorer, lsh_near_dup

    bucket_pairs = lsh_near_dup(emb, dim=64, threshold=0.3, bits=4)
    rescored = _pair_scorer(emb)(bucket_pairs.select("id_a", "id_b"))
    a = {(r.id_a, r.id_b): r.cosine for r in bucket_pairs.collect()}
    b = {(r.id_a, r.id_b): r.cosine for r in rescored.collect()}
    assert a and a == b
