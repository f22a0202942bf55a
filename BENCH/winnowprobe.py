"""Winnowing partial-overlap probe: the op's cost driver Σ df(fp)²
measured on a PLANTED corpus, at two scales, with the max_fp_df knob
quantified the way hubprobe measured the jaccard hub purge.

Three questions, each answered with a number instead of an argument:

1. WHY the op exists — planted partial-overlap pairs (a 30-token run
   shared between two otherwise-disjoint ~230-token documents,
   whole-doc Jaccard ≈ 0.07) must be found by winnow_near_dup
   (winnowing's covering property guarantees a shared fingerprint)
   and are invisible to whole-document MinHash at any realistic
   threshold: recall is reported for both on the same corpus.
2. WHAT the max_fp_df knob buys — a boilerplate block shared by
   ``boiler_frac`` of the corpus creates fingerprints with
   df ≈ boiler_docs, and pair volume is Σ df(fp)² (the mega-basket
   cost this op inherits from basket_cooccurrence); the probe times
   purged (max_fp_df) vs unpurged on the 1x corpus and reports
   speedup + emitted pair volume. The purge changes OUTPUT by
   contract (boilerplate-only pairs drop — near-zero signal).
3. DOES the purged path scale — the purged operator runs at 1x and
   10x the document count with planted-pair density held constant
   (pair volume grows linearly by construction); the wall ratio is
   the scaling evidence for SCALE.md.

Fixture is fully deterministic (no RNG): token ids are arithmetic in
the doc id. Usage: python BENCH/winnowprobe.py → BENCH/
winnowprobe_r05.json + one JSON line. Size via BTD_WINNOW_DOCS
(default 4000 at 1x).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus(spark, n_docs: int, boiler_every: int):
    """n_docs docs of ~200 private tokens; docs (2i, 2i+1) share a
    30-token planted run; every ``boiler_every``-th doc also carries a
    shared 30-token boilerplate block. All deterministic."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs)
    private = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(199)),
            lambda j: F.concat(F.lit("d"), F.col("id"), F.lit("w"), j),
        ),
    )
    # pair p = id // 2 shares run "p<p>t0..t29" between its two docs
    planted = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.concat(
                F.lit("p"), (F.col("id") / 2).cast("long"), F.lit("t"), j
            ),
        ),
    )
    boiler = F.when(
        F.col("id") % boiler_every == 0,
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda j: F.concat(F.lit("boilertok"), j),
            ),
        ),
    ).otherwise(F.lit(""))
    return base.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", private, planted, boiler).alias("text"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from btd.dataops.dedup import minhash_near_dup, winnow_near_dup
    from btd.session import get_spark

    n1 = int(os.environ.get("BTD_WINNOW_DOCS", "4000"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cap = int(os.environ.get("BTD_WINNOW_CAP", "64"))
    # boilerplate on EVERY doc — the realistic header/footer case, and
    # the one where Σ df(fp)² actually bites: ~11 winnowed fps × C(n,2)
    # pairs ≈ 88M intermediate at n=4000 without the purge
    boiler_every = int(os.environ.get("BTD_WINNOW_BOILER_EVERY", "1"))
    spark = get_spark("btd-winnowprobe", cores=cores,
                      shuffle_partitions=cores)

    # warm up codegen + Arrow/pandas workers so the first timed run
    # isn't charged JVM spin-up (the purge comparison is within-run)
    warm = _corpus(spark, 200, boiler_every)
    winnow_near_dup(warm).count()
    minhash_near_dup(warm, threshold=0.5).count()

    out: dict = {
        "metric": "winnow_partial_overlap_probe",
        "n_docs_1x": n1,
        "boiler_every": boiler_every,
        "cap": cap,
        "cores": cores,
    }

    def planted_recall(pairs, n_docs) -> float:
        """Fraction of the n_docs/2 planted (2i, 2i+1) pairs present."""
        hit = (
            pairs.where(
                (F.least("doc_id_a", "doc_id_b") % 2 == 0)
                & (
                    F.greatest("doc_id_a", "doc_id_b")
                    - F.least("doc_id_a", "doc_id_b")
                    == 1
                )
            )
            .select(F.least("doc_id_a", "doc_id_b"))
            .distinct()
            .count()
        )
        return hit / (n_docs // 2)

    levels = {}
    for tag, n in (("1x", n1), ("3x", 3 * n1), ("10x", 10 * n1)):
        docs = _corpus(spark, n, boiler_every)
        docs.persist()
        docs.count()
        lv: dict = {"n_docs": n}

        if tag in ("1x", "3x"):
            # unpurged winnow FIRST (any residual warmup biases
            # AGAINST the purge claim): Σ df(fp)² with the
            # boilerplate fingerprints at df = n — the quadratic the
            # knob removes, measured at 1x AND 3x so its GROWTH rate
            # (expect ~9x pairs for 3x docs) is on record; 10x
            # unpurged would emit C(40000,2) ≈ 800M pairs and is the
            # exact blow-up the purge exists to prevent
            t0 = time.perf_counter()
            wu = winnow_near_dup(docs)
            lv["winnow_unpurged_pairs"] = wu.count()
            lv["winnow_unpurged_wall_s"] = round(
                time.perf_counter() - t0, 2
            )

        # purged winnow: the 100 TB posture (boilerplate fps dropped)
        t0 = time.perf_counter()
        wp = winnow_near_dup(docs, max_fp_df=cap)
        lv["winnow_purged_pairs"] = wp.count()
        lv["winnow_purged_wall_s"] = round(time.perf_counter() - t0, 2)
        lv["winnow_recall_planted"] = round(planted_recall(wp, n), 4)
        if tag in ("1x", "3x"):
            lv["purge_speedup"] = round(
                lv["winnow_unpurged_wall_s"] / lv["winnow_purged_wall_s"],
                2,
            )

        if tag != "3x":
            # minhash on the SAME corpus: partial overlap is invisible
            # to whole-document similarity (J ~= 0.07 << threshold)
            t0 = time.perf_counter()
            mh = minhash_near_dup(docs, threshold=0.5).select(
                F.col("id_a").alias("doc_id_a"),
                F.col("id_b").alias("doc_id_b"),
            )
            lv["minhash_pairs"] = mh.count()
            lv["minhash_wall_s"] = round(time.perf_counter() - t0, 2)
            lv["minhash_recall_planted"] = round(
                planted_recall(mh, n), 4
            )

        docs.unpersist()
        levels[tag] = lv

    out["levels"] = levels
    out["purged_wall_ratio_10x"] = round(
        levels["10x"]["winnow_purged_wall_s"]
        / levels["1x"]["winnow_purged_wall_s"],
        2,
    )
    out["unpurged_pair_growth_3x"] = round(
        levels["3x"]["winnow_unpurged_pairs"]
        / levels["1x"]["winnow_unpurged_pairs"],
        2,
    )
    out["purged_pair_growth_3x"] = round(
        levels["3x"]["winnow_purged_pairs"]
        / levels["1x"]["winnow_purged_pairs"],
        2,
    )
    out["pair_reduction_1x"] = round(
        levels["1x"]["winnow_unpurged_pairs"]
        / levels["1x"]["winnow_purged_pairs"],
        1,
    )
    out["value"] = out["pair_reduction_1x"]
    out["note"] = (
        "planted pairs share a 30-token run in ~230-token docs "
        "(J~0.07): winnow must recall ~1.0, minhash ~0.0; purge "
        "speedup = unpurged/purged wall with boilerplate on every "
        "doc; purged_wall_ratio_10x ~ linear = scale-safe"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "winnowprobe_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
