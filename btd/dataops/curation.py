"""Corpus-curation composition: the filter→dedup→select chain a
training-data pipeline runs before tokenization, plus deterministic
sampling. All Catalyst; exact DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btd.dataops.textstats import fingerprints


def deterministic_sample(
    df: DataFrame, key: str, percent: int, method: str = "xxhash64"
) -> DataFrame:
    """Stable ~percent% sample keyed on a hash of ``key`` — the same
    rows every run, no RNG state; safe as a train/eval split at any
    scale (hash-partition independent).

    method='xxhash64' (default): cheapest, Spark-specific.
    method='md5': engine-portable (hex prefix bucket 0..255), used where
    a DuckDB oracle must select the identical rows.
    """
    if method == "xxhash64":
        return df.where(F.pmod(F.xxhash64(F.col(key)), F.lit(100)) < percent)
    bucket = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 2), 16, 10)
    return df.where(bucket.cast("int") < int(256 * percent / 100))


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Split each document's whitespace tokens into consecutive
    ``max_tokens``-sized chunks — the pre-tokenization packing step of
    a training pipeline (sequence models take bounded windows).

    Pure Catalyst: one explode of a per-doc chunk-index sequence + a
    slice per chunk; narrow (no shuffle), so it scales with the scan.
    Returns (doc_id, chunk_idx, chunk_text, n_tokens); a document
    shorter than ``max_tokens`` yields exactly one chunk.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil(n / F.lit(float(max_tokens))).cast("int"), F.lit(1)
    )
    with_idx = docs.select(
        "doc_id",
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    sl = F.slice(
        F.col("_toks"),
        F.col("chunk_idx") * max_tokens + 1,
        F.lit(max_tokens),
    )
    return with_idx.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", sl).alias("chunk_text"),
        F.size(sl).cast("long").alias("n_tokens"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per document, count distinct word
    ``n``-grams it shares with ANY benchmark document — the standard
    eval-leak check a training-data pipeline runs before tokenization
    (a doc with n_hits > 0 contains verbatim benchmark text).

    Scale shape: both sides explode to distinct n-gram shingles and
    meet in ONE equi-join keyed on the shingle — cost tracks shingle
    co-occurrence, never docs × benchmark. The benchmark side is
    typically tiny (eval sets) and AQE broadcasts it; hot shingles
    (boilerplate) are split by AQE skew handling, and a distinct on
    the benchmark shingles keeps multiplicity from inflating counts.

    Returns (doc_id, n_hits) for contaminated docs only.
    """
    from btd.dataops.dedup import word_shingles

    doc_sh = docs.select(
        "doc_id", F.explode(word_shingles(text_col, n)).alias("sh")
    )
    bench_sh = (
        benchmark.select(F.explode(word_shingles(text_col, n)).alias("sh"))
        .distinct()
    )
    return (
        doc_sh.join(bench_sh, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def stratified_sample(
    df: DataFrame,
    group: str,
    n_per_group: int,
    key: str,
) -> DataFrame:
    """Deterministic top-``n_per_group`` rows per group, ordered by
    md5(key) — the dataset-mixing primitive ("N docs per language /
    source") with no RNG state: same rows every run, every engine.

    One shuffle (window partitioned by group); the md5 order makes the
    pick uniform-ish over the group rather than biased by ingestion
    order. Rank ties are impossible while ``key`` is unique (md5
    collisions aside — tie-broken by key).
    """
    from pyspark.sql import Window

    h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(group).orderBy(h, F.col(key))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def curate(
    docs: DataFrame,
    min_tokens: int = 50,
    max_tokens: int = 5000,
    max_stopword_ratio: float = 0.35,
) -> DataFrame:
    """Quality-filter + content-dedup: keep docs inside the token budget
    with a sane stopword ratio, then one representative (min doc_id) per
    content fingerprint. Single plan: filter pushes to the scan, dedup
    is one exchange keyed on the fingerprint digest."""
    from btd.dataops.textstats import STOPWORDS

    toks = F.split("text", " ")
    n_toks = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))) / n_toks
    filtered = docs.where(
        (n_toks >= min_tokens)
        & (n_toks <= max_tokens)
        & (stop_ratio <= max_stopword_ratio)
    )
    fp = fingerprints(filtered)
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return keep.select("doc_id", "fingerprint")


def mix_sources(
    docs: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Weighted dataset mixing — the mixture-weights primitive of a
    pretraining data pipeline: keep each source's rows at its configured
    sampling rate (0..1), deterministically (md5-bucket rule, the
    engine-portable variant of :func:`deterministic_sample` — same rows
    every run, every engine, partition-independent). Sources absent
    from ``weights`` are dropped (rate 0), the explicit-manifest
    behavior a curated mix needs; rate 1.0 keeps a source whole.

    The weights table is broadcast (a mix manifest is always tiny);
    the filter is a narrow scan — no shuffle at any corpus size.
    Buckets are 16-bit md5 prefixes, so rates resolve to 1/65536
    granularity exactly and identically in the DuckDB oracle twin.
    """
    spark = docs.sparkSession
    w = spark.createDataFrame(
        [(s, int(round(r * 65536))) for s, r in sorted(weights.items())],
        f"{source_col} string, _keep_below int",
    )
    bucket = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 4), 16, 10
    ).cast("int")
    return (
        docs.join(F.broadcast(w), source_col)
        .where(bucket < F.col("_keep_below"))
        .drop("_keep_below")
    )
