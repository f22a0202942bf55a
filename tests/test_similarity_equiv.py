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
