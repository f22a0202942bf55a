"""Megacluster straggler benchmark: the round-4 shard fix measured.

The adversarial dedup corpus — every vector a near-duplicate of one
direction — lands ~entirely in ONE IVF cluster, so the bucket-local
kernel used to run as a single applyInPandas task doing O(n^2) work on
one core while 31 idled. `_bucket_local_pairs(shard_cap)` salts the hot
bucket's members into ceil(occ/cap) shards and replicates queries per
shard; this harness times threshold-mode scoring on that corpus
unsharded (cap = inf) vs sharded (cap = 4096) at fixed cores and
records the speedup + task fan-out. Output identity is asserted by
tests/test_similarity_equiv.py; this file is the wall-clock evidence.

Usage: python BENCH/megacluster.py → BENCH/megacluster_r04.json + one
JSON line. Size via BTD_MEGA_N (default 24000), dims BTD_MEGA_DIM (32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    from btd.session import get_spark

    n = int(os.environ.get("BTD_MEGA_N", "24000"))
    dim = int(os.environ.get("BTD_MEGA_DIM", "32"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("btd-megacluster", cores=cores, shuffle_partitions=cores)

    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    base = rng.randn(dim)
    base /= np.linalg.norm(base)
    rows = [
        (i, [float(x) for x in (base + 0.01 * rng.randn(dim))])
        for i in range(n)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(cores)
    emb.persist()
    emb.count()

    from btd.dataops.similarity import _bucket_local_pairs

    grouped = emb.select(
        F.lit(0).alias("bucket"),
        F.lit("b").alias("side"),
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )

    def run(cap: int) -> tuple[float, int]:
        t0 = time.perf_counter()
        cnt = (
            _bucket_local_pairs(grouped, threshold=0.999, shard_cap=cap)
            .distinct()
            .count()
        )
        return time.perf_counter() - t0, cnt

    # warm-up on a slice so JVM/Arrow startup is out of both timings
    _bucket_local_pairs(
        grouped.limit(512), threshold=0.999, shard_cap=10**9
    ).count()

    cap = 4096
    un_wall, un_pairs = run(10**9)
    sh_wall, sh_pairs = run(cap)
    assert un_pairs == sh_pairs, (un_pairs, sh_pairs)
    out = {
        "metric": "megacluster_shard_speedup",
        "value": round(un_wall / sh_wall, 2),
        "unit": "x (unsharded wall / sharded wall)",
        "n_vectors": n,
        "dim": dim,
        "cores": cores,
        "shard_cap": cap,
        "n_shards": -(-n // cap),
        "unsharded_wall_s": round(un_wall, 2),
        "sharded_wall_s": round(sh_wall, 2),
        "pairs": un_pairs,
        "note": "one all-near-dup IVF bucket; unsharded = ONE "
        "applyInPandas task doing O(n^2) scoring, sharded = "
        "ceil(n/cap) tasks of n x cap",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "megacluster_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
