"""Focused scale probe for the round-5 inference + KG-side BGP gates:
walls at sf0.1 / sf1 / sf10 (best of 2) for the fixpoint entailment
(`kg_infer`), CONSTRUCT (`ref_construct`), and the extraction-backed
BGP queries (`kg_bgp`, `kg_bgp_optional`) — the ops probe100.py does
not already cover. Same methodology as probe100: deterministic
key-shifted scale-ups (BENCH/make_scale.py), fixed 32 cores, min-wall
of 2 trials, session state reset between queries.

Usage: python BENCH/inferprobe.py → writes BENCH/inferprobe_r05.json
and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["kg_infer", "ref_construct", "kg_bgp", "kg_bgp_optional"]


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import cleanup, host_calibration
    from BENCH.make_scale import ensure
    from btd.session import get_spark

    trials = int(os.environ.get("BTD_INFERPROBE_TRIALS", "2"))
    calib = host_calibration()
    spark = get_spark("btd-inferprobe", cores=32, shuffle_partitions=64)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    levels = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", ensure(spark)),
        (
            "sf10",
            ensure(spark, out_dir=os.path.join(repo, "testdata_sf10"), factor=100),
        ),
    ]
    cleanup(spark)
    qs = entrymod.queries()
    out: dict = {
        "metric": "infer_bgp_scale_probe",
        "host_calib": calib,
        "cores": 32,
        "levels": {},
        "ratios": {},
        "trials_min_wall": trials,
    }
    for name, path in levels:
        walls = {}
        for q in QUERIES:
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                qs[q](spark, path).count()
                best = min(best, time.perf_counter() - t0)
                cleanup(spark)
            walls[q] = round(best, 2)
        out["levels"][name] = walls
    l01, l10 = out["levels"]["sf0.1"], out["levels"]["sf10"]
    for q in QUERIES:
        if l01.get(q, 0) > 0:
            out["ratios"][q] = round(l10[q] / l01[q], 1)
    out["note"] = (
        "ratios = wall(100x)/wall(1x) on 32 fixed cores; kg_infer's "
        "per-round work is the rule-body BGPs over the saturated graph "
        "(3 rules, fixpoint in 3 rounds on this corpus)"
    )
    with open(os.path.join(repo, "BENCH", "inferprobe_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
