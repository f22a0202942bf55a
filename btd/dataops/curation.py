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
