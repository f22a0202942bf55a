"""Batched mention detection — vectorized pandas UDF over turn text.

Finds entity-mention spans with a gazetteer-compiled alternation regex
(longest-match-first). Mentions feed the linking stage; relation
extraction (relations.py) is span-free and consumes raw text.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MENTION_ARR = T.ArrayType(
    T.StructType(
        [
            T.StructField("surface", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)


def build_mention_pattern(surfaces: list[str]) -> str:
    """Alternation of known surfaces, longest first so 'ACME Corporation'
    wins over 'ACME'. Word-boundary guarded."""
    alts = sorted(set(surfaces), key=len, reverse=True)
    return r"(?<![\w])(" + "|".join(re.escape(s) for s in alts) + r")(?![\w])"


def detect_mentions(transcripts: DataFrame, surfaces: list[str]) -> DataFrame:
    """transcripts → mentions(conv_id, turn_idx, surface, start, end).

    The gazetteer ships to executors inside the UDF closure (small dim —
    the broadcast-join analog for Python state). One compiled regex per
    executor, reused across Arrow batches.
    """
    pattern = build_mention_pattern(surfaces)

    @F.pandas_udf(_MENTION_ARR)
    def _detect(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rx = re.compile(pattern)

        def find(text: str):
            return [
                (m.group(1), m.start(1), m.end(1)) for m in rx.finditer(text)
            ]

        for batch in texts:
            yield batch.map(find)

    return (
        transcripts.select(
            "conv_id", "turn_idx", F.explode(_detect(F.col("text"))).alias("m")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.col("m.surface").alias("surface"),
            F.col("m.start").alias("start"),
            F.col("m.end").alias("end"),
        )
    )
