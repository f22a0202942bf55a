"""Hub-purge benchmark: the Σ deg² guard measured on a planted hub.

The 100x probe's worst ratio is kg_neighbor_jaccard (15x wall at 10x
data) — inherent, not a layout bug: shared-neighbor pair volume is
Σ deg(neighbor)², so a non-discriminating hub grows pair volume
quadratically in its own degree while carrying ~zero signal (every
pair it generates has tiny jaccard). ``max_neighbor_degree`` /
``max_mid_fanout`` purge such hubs BEFORE pairing; this harness
plants one hub on an otherwise-sparse graph and times the operator
with the purge off vs on, recording wall + emitted pair volume. The
purge changes the OUTPUT by contract (hub contributions are dropped —
documented in both operators' docstrings), so unlike
BENCH/megacluster.py this is a cost-of-the-hub measurement, not an
identity-preserving rewrite: the number says what the knob buys when
a 100 TB corpus meets a stopword-grade entity.

Fixture: ``n_bg`` background nodes in chains of private mids
(deg ≤ 2 everywhere — linear work), plus ONE hub mid connecting
``hub_deg`` sources to ``hub_deg`` destinations (two_hop) /
``hub_deg`` nodes sharing one neighbor (jaccard) → hub pair volume
hub_deg² ≫ background.

Usage: python BENCH/hubprobe.py → BENCH/hubprobe_r04.json + one JSON
line. Size via BTD_HUB_DEG (default 4000), BTD_HUB_BG (default 200000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from btd.session import get_spark

    hub_deg = int(os.environ.get("BTD_HUB_DEG", "4000"))
    n_bg = int(os.environ.get("BTD_HUB_BG", "200000"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cap = int(os.environ.get("BTD_HUB_CAP", "64"))
    spark = get_spark("btd-hubprobe", cores=cores, shuffle_partitions=cores)

    # --- two_hop_reach fixture: src_i -> mid_i -> dst_i (background,
    # mid fan-out 1) + hs_j -> HUB -> hd_j (hub fan-in/out = hub_deg)
    bg = spark.range(n_bg).select(
        F.concat(F.lit("src"), "id").alias("subject"),
        F.concat(F.lit("mid"), "id").alias("object"),
    ).unionByName(
        spark.range(n_bg).select(
            F.concat(F.lit("mid"), "id").alias("subject"),
            F.concat(F.lit("dst"), "id").alias("object"),
        )
    )
    hub = spark.range(hub_deg).select(
        F.concat(F.lit("hs"), "id").alias("subject"),
        F.lit("HUB").alias("object"),
    ).unionByName(
        spark.range(hub_deg).select(
            F.lit("HUB").alias("subject"),
            F.concat(F.lit("hd"), "id").alias("object"),
        )
    )
    edges = bg.unionByName(hub).repartition(cores)
    edges.persist()
    edges.count()

    from btd.ontology import two_hop_reach

    out: dict = {
        "metric": "hub_purge_speedup",
        "unit": "x (unpurged wall / purged wall)",
        "hub_deg": hub_deg,
        "n_background_edges": 2 * n_bg,
        "cores": cores,
        "cap": cap,
    }

    t0 = time.perf_counter()
    rows_un = two_hop_reach(edges).count()
    wall_un = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows_p = two_hop_reach(edges, max_mid_fanout=cap).count()
    wall_p = time.perf_counter() - t0
    out["two_hop"] = {
        "unpurged_wall_s": round(wall_un, 2),
        "purged_wall_s": round(wall_p, 2),
        "speedup": round(wall_un / wall_p, 2),
        "rows_unpurged": rows_un,
        "rows_purged": rows_p,
    }
    edges.unpersist()

    # --- neighborhood_jaccard fixture: background nodes in 2-node
    # baskets (pair volume linear) + hub_deg nodes sharing ONE
    # neighbor (pair volume hub_deg²/2 ≈ 8M at the default)
    bgj = spark.range(n_bg).select(
        F.concat(F.lit("n"), "id").alias("node"),
        F.concat(F.lit("b"), (F.col("id") / 2).cast("long")).alias(
            "neighbor"
        ),
    )
    hubj = spark.range(hub_deg).select(
        F.concat(F.lit("n"), "id").alias("node"),
        F.lit("HUBN").alias("neighbor"),
    )
    basket = bgj.unionByName(hubj).repartition(cores)
    basket.persist()
    basket.count()

    from btd.analytics.cooccur import neighborhood_jaccard

    t0 = time.perf_counter()
    rows_un = neighborhood_jaccard(basket, "node", "neighbor").count()
    wall_un = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows_p = neighborhood_jaccard(
        basket, "node", "neighbor", max_neighbor_degree=cap
    ).count()
    wall_p = time.perf_counter() - t0
    out["neighbor_jaccard"] = {
        "unpurged_wall_s": round(wall_un, 2),
        "purged_wall_s": round(wall_p, 2),
        "speedup": round(wall_un / wall_p, 2),
        "rows_unpurged": rows_un,
        "rows_purged": rows_p,
    }
    basket.unpersist()

    out["value"] = out["neighbor_jaccard"]["speedup"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "hubprobe_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
