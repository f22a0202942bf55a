"""Reference-workload throughput: the seven analyses over n-quad TEXT
(the reference's actual input format: regex parse + aggregate), on a
deterministic synthetic corpus, reported as statements/sec against the
reference's published EMR numbers (BASELINE.md: 0.53-1.31M stmts/s on
a 20-node cluster).

The corpus is generated in Spark (no driver-side loop): power-law
subjects (hot head like BTC-2010), ~30% blank subjects, ~15% blank
objects, ~30% missing contexts, duplicated (s,p,o) across contexts.
Written as 64 uncompressed text files — splittable, like the
reference's 321-chunk parallelism (report/report.md:539-552).

Usage: python BENCH/nquad_throughput.py [--statements 20000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = "/tmp/btd_nquads"


def generate(spark, n: int, path: str) -> None:
    from pyspark.sql import functions as F

    df = spark.range(n)
    rid = F.col("id")
    # power-law-ish subject id: xxhash spread, modulo a shrinking range
    # for a hot head (id bucket 0 gets ~10% of rows)
    h = F.abs(F.xxhash64(rid))
    sid = F.when(h % 10 == 0, F.lit(0)).otherwise(h % (n // 20))
    subject = F.when(
        sid % 10 < 3, F.concat(F.lit("_:b"), sid.cast("string"))
    ).otherwise(F.concat(F.lit("<http://ex.org/s/"), sid.cast("string"), F.lit(">")))
    predicate = F.concat(F.lit("<http://ex.org/p/"), (h % 12).cast("string"), F.lit(">"))
    oid = F.abs(F.xxhash64(rid, F.lit(1))) % (n // 10)
    obj = (
        F.when(oid % 20 < 3, F.concat(F.lit("_:ob"), oid.cast("string")))
        .when(
            oid % 20 < 6,
            F.concat(F.lit('"literal value '), oid.cast("string"), F.lit('"')),
        )
        .when(
            oid % 20 < 8,
            F.concat(
                F.lit('"'),
                (1990 + oid % 30).cast("string"),
                F.lit('-01-02"^^<http://www.w3.org/2001/XMLSchema#date>'),
            ),
        )
        .otherwise(F.concat(F.lit("<http://ex.org/o/"), oid.cast("string"), F.lit(">")))
    )
    cid = F.abs(F.xxhash64(rid, F.lit(2))) % 100
    line = F.when(
        cid < 30, F.format_string("%s %s %s .", subject, predicate, obj)
    ).otherwise(
        F.format_string(
            "%s %s %s <http://ctx.org/g/%s> .",
            subject,
            predicate,
            obj,
            (cid % 20).cast("string"),
        )
    )
    df.select(line.alias("value")).repartition(64).write.mode(
        "overwrite"
    ).text(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--statements", type=int, default=20_000_000)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from btd import analytics as A
    from btd.parse import read_nquads
    from btd.session import get_spark

    # 4x cores shuffle partitions: the (s,p,o)-keyed wide aggregations
    # (distinct contexts, dedup) hold ~250MB+ of string hash-agg state
    # per task at cores-many partitions and spill; 4x cuts task state
    # below memory (measured 2.2-2.8x on those jobs at 100M statements).
    # Matches SCALE.md guidance: size partitions to the job, err high.
    cores = (args.cores
             or int(os.environ.get("SPARK_GRAFT_CPUS", 0))
             or 32)
    spark = get_spark("btd-nquad-bench", cores=cores,
                      shuffle_partitions=cores * 4)
    marker = os.path.join(CORPUS_DIR, f"_gen_{args.statements}")
    if not os.path.exists(marker):
        generate(spark, args.statements, CORPUS_DIR)
        open(marker, "w").close()

    jobs = {
        "distinct": lambda t: A.distinct_subject_count(t),
        "outdegree_hist": A.outdegree_histogram,
        "indegree_hist": A.indegree_histogram,
        "topk_outdegree": lambda t: A.top_k_outdegree(t, 10),
        "percentages": lambda t: A.percentages(t),
        "distinct_contexts": A.distinct_contexts_per_triple,
        "dedup": A.remove_duplicate_triples,
    }
    # warm-up parse (page cache + codegen)
    n_parsed = read_nquads(spark, CORPUS_DIR).count()

    results = {}
    for name, fn in sorted(jobs.items()):
        t0 = time.perf_counter()
        fn(read_nquads(spark, CORPUS_DIR)).count()  # scan→parse→analyze
        wall = time.perf_counter() - t0
        results[name] = {
            "wall_sec": round(wall, 2),
            "stmts_per_sec": round(n_parsed / wall, 0),
        }
    print(
        json.dumps(
            {
                "metric": "nquad_analysis_throughput",
                "n_statements": n_parsed,
                "jobs": results,
                "reference_cluster_stmts_per_sec": {
                    "distinct": 1.06e6,
                    "outdegree_hist": 1.06e6,
                    "indegree_hist": 0.92e6,
                    "topk_outdegree": 1.11e6,
                    "percentages": 1.31e6,
                    "distinct_contexts": 0.53e6,
                    "dedup": 0.58e6,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
