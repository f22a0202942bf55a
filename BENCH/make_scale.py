"""Deterministic 10x scale-up of the driver testdata (sf0.1 -> sf1).

No external data and no RNG: each table is the union of ``factor``
key-shifted copies of the sf0.1 original. Key offsets are multiples of
70 (= lcm(10, 7)) so the star bridge's blank-node predicates
(o_custkey % 10, l_partkey % 7 — btd/star.py) keep their hit ratios,
and the orders<->lineitem orderkey relationship is preserved copy-wise
(same offset on both sides). Document texts get a per-copy suffix
token so near-dup workload stays near-dup shaped (J ~ 0.9x across
copies) instead of collapsing into exact 10-copy clusters; embedding
copies are cyclically rotated (same norm/distribution, decorrelated
LSH/IVF buckets) so ANN cost scales like MORE DISTINCT vectors, not
like a 10-deep exact-duplicate pile-up whose intra-bucket pair count
is a quadratic artifact of the replication itself.

Usage: python BENCH/make_scale.py [out_dir] [factor]
Writes parquet tables under out_dir (default ./testdata_sf1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from btd.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

#: key columns to shift per table; every listed key gets its own
#: offset base (multiple of 70 above the column max)
KEYED = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: shared offset bases so FK pairs shift identically
SHARED = {
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "o_custkey": "custkey",
    "c_custkey": "custkey",
    "l_partkey": "partkey",
    "p_partkey": "partkey",
    "l_suppkey": "suppkey",
    "s_suppkey": "suppkey",
}
COPY_AS_IS = ["region", "nation"]


def _base(n: int) -> int:
    """Smallest multiple of 70 strictly above n."""
    return ((n // 70) + 1) * 70


def scale_table(df: DataFrame, keys: list[str], bases: dict[str, int],
                factor: int, suffix_text: bool) -> DataFrame:
    parts = []
    for i in range(factor):
        c = df
        for k in keys:
            off = bases[SHARED.get(k, k)] * i
            c = c.withColumn(k, (F.col(k) + F.lit(off)).cast(df.schema[k].dataType))
        if suffix_text and i > 0:
            c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" r{i}")))
        if "embedding" in df.columns and i > 0:
            # cyclic rotation by a copy-specific offset: norm-preserving,
            # deterministic, decorrelates hyperplane/centroid buckets
            dim = 64
            off = (i * 7) % dim
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", off + 1, dim - off),
                    F.slice("embedding", 1, off),
                ),
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def default_out_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )


def ensure(spark, out_dir: str | None = None, factor: int = 10) -> str:
    """Build the scaled tables if absent (idempotent). Completeness =
    the _COMPLETE marker recording THIS (factor, src) AND every table
    directory actually present — a marker alone can lie (the data was
    cleaned while the marker survived), and a marker from a different
    factor/src (e.g. a CLI build at factor=3) would silently skew the
    bench scale-probe ratios if reused (ADVICE r2)."""
    out_dir = out_dir or default_out_dir()
    marker = os.path.join(out_dir, "_COMPLETE")
    tables = list(COPY_AS_IS) + list(KEYED)
    if os.path.exists(marker):
        with open(marker) as f:
            recorded = f.read().strip()
        if recorded == f"factor={factor} src={SRC}" and all(
            os.path.isdir(os.path.join(out_dir, f"{t}.parquet"))
            for t in tables
        ):
            return out_dir

    bases: dict[str, int] = {}
    for tbl, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        for k in keys:
            fam = SHARED.get(k, k)
            mx = df.agg(F.max(k)).collect()[0][0]
            bases[fam] = max(bases.get(fam, 0), _base(int(mx)))

    os.makedirs(out_dir, exist_ok=True)
    for tbl in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{tbl}.parquet")
    for tbl, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        scaled = scale_table(df, keys, bases, factor, tbl == "documents")
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")
    with open(marker, "w") as f:
        f.write(f"factor={factor} src={SRC}\n")
    return out_dir


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else default_out_dir()
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(
        "make-scale", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ensure(spark, out_dir, factor)
    for tbl in list(COPY_AS_IS) + list(KEYED):
        print(tbl, spark.read.parquet(f"{out_dir}/{tbl}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
