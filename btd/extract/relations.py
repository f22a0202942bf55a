"""Relation/triple extraction from turn text — vectorized pandas UDF.

The extractor is deliberately rule-based and deterministic (the
reference's regex-parsing spirit — RDFStatement.java:22 — vectorized):
a fixed set of relation patterns applied per Arrow batch with pandas
``str`` ops. The pure-Python twin in :mod:`btd.extract.oracle` defines
ground truth for the P/R >= 0.95 harness (BASELINE.json metric).

Scale notes: extraction is embarrassingly parallel (narrow, no
shuffle); Arrow batches of ~10k rows keep Python overhead amortized;
the regex set is compiled once per executor via closure capture, not
per batch.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: (pattern, predicate). Patterns anchor a full sentence; group a/b are
#: entity surface forms. Kept in lockstep with btd.fixtures.TEMPLATES.
#: Anchored at line start/end so entity surfaces may themselves contain
#: periods ('A. Johnson', 'Acme Corp.'); non-greedy + trailing \.$ keeps
#: the sentence dot out of the object surface.
REL_PATTERNS: list[tuple[str, str]] = [
    (r"^(?P<a>.+?) works at (?P<b>.+?)\.$", "works_at"),
    (r"^(?P<a>.+?) is located in (?P<b>.+?)\.$", "located_in"),
    (r"^(?P<a>.+?) acquired (?P<b>.+?)\.$", "acquired"),
    (r"^(?P<a>.+?) uses (?P<b>.+?)\.$", "uses"),
    (r"^(?P<a>.+?) met with (?P<b>.+?)\.$", "met_with"),
]

_TRIPLE_ARR = T.ArrayType(
    T.StructType(
        [
            T.StructField("subj", T.StringType()),
            T.StructField("pred", T.StringType()),
            T.StructField("obj", T.StringType()),
        ]
    )
)


def extract_relations_py(text: str) -> list[tuple[str, str, str]]:
    """Single-text extraction — shared kernel, also the oracle twin."""
    out = []
    for pat, pred in _COMPILED:
        for m in pat.finditer(text):
            out.append((m.group("a").strip(), pred, m.group("b").strip()))
    return out


_COMPILED = [(re.compile(p, re.MULTILINE), pred) for p, pred in REL_PATTERNS]


@F.pandas_udf(_TRIPLE_ARR)
def _extract_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # Iterator form: compiled patterns are reused across all batches of
    # a partition; per-batch work is a single pandas apply over strings
    # (string-bound, no per-row Python object churn beyond matches).
    for batch in texts:
        yield batch.map(extract_relations_py)


def extract_triples(transcripts: DataFrame) -> DataFrame:
    """transcripts → kg_triples(subj, pred, obj, conv_id, turn_idx).

    Surfaces are raw (pre-linking); provenance columns carry per-row
    lineage into the materialized graph.
    """
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.explode(_extract_udf(F.col("text"))).alias("t"),
        )
        .select(
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            "conv_id",
            "turn_idx",
        )
    )


#: pronoun subjects resolved from conversation context (windowed path)
PRONOUN_SUBJECTS = ("It", "He", "She", "They")


def extract_triples_windowed(transcripts: DataFrame) -> DataFrame:
    """Context-windowed extraction — the north-star's "window-orders
    turns per conversation" feeding the extractor: each turn sees the
    previous turn's text (btd.extract.turns.with_prev_text), and a
    pronoun-subject sentence ('It uses X.') resolves its subject to the
    previous turn's leading entity token; pronoun turns with no
    previous turn drop the triple. Narrow except the ONE conv_id
    window shuffle, which every per-conversation stage shares.
    """
    from btd.extract.turns import with_prev_text

    wt = with_prev_text(transcripts, n_prev=1)

    @F.pandas_udf(_TRIPLE_ARR)
    def _extract_ctx(text: pd.Series, prev: pd.Series) -> pd.Series:
        def go(t: str, p):
            out = []
            for s, pred, o in extract_relations_py(t):
                if s in PRONOUN_SUBJECTS:
                    if p is None:
                        continue
                    s = p.split(" ")[0]
                out.append((s, pred, o))
            return out

        return pd.Series([go(t, p) for t, p in zip(text, prev)])

    # try_: first turns have an empty prev_texts array (ANSI element_at
    # would throw on index -1); NULL means "no context"
    prev_col = F.try_element_at(F.col("prev_texts"), F.lit(-1))
    return (
        wt.select(
            "conv_id",
            "turn_idx",
            F.explode(_extract_ctx(F.col("text"), prev_col)).alias("t"),
        )
        .select(
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            "conv_id",
            "turn_idx",
        )
    )
