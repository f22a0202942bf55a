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


def _trie_pattern(words: set[str]) -> str:
    """Compile a word set into a character-trie regex.

    A flat longest-first alternation makes Python's `re` try every
    surface at every position — O(#surfaces × text) per turn, which at
    a 1.5k-entry gazetteer over 10M turns is the pipeline bottleneck.
    The trie shares prefixes so a position failing on its first chars
    costs O(1). Longest-match semantics are preserved: a node that is
    both terminal and prefix emits its continuation as a GREEDY
    optional group, so the regex engine extends before accepting
    (equivalence vs the naive alternation is property-tested).
    """
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}
    END = ""

    def emit(node: dict) -> str:
        if list(node) == [END]:
            return ""
        alts = []
        terminal = False
        for ch in sorted(node):
            if ch == END:
                terminal = True
            else:
                alts.append(re.escape(ch) + emit(node[ch]))
        if len(alts) == 1 and not terminal:
            return alts[0]
        return "(?:" + "|".join(alts) + ")" + ("?" if terminal else "")

    return emit(trie)


def build_mention_pattern(surfaces: list[str]) -> str:
    """Trie regex over the gazetteer, longest match at each position
    ('ACME Corporation' wins over 'ACME'). Word-boundary guarded.
    Deterministic: the pattern string is identical however the
    gazetteer was collected."""
    words = {s for s in surfaces if s}
    if not words:
        return r"(?!x)x"  # matches nothing
    return r"(?<![\w])(" + _trie_pattern(words) + r")(?![\w])"


def detect_mentions(
    transcripts: DataFrame,
    surfaces: list[str],
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """transcripts → mentions(*keys, surface, start, end).

    The gazetteer ships to executors inside the UDF closure (small dim —
    the broadcast-join analog for Python state). One compiled regex per
    executor, reused across Arrow batches. ``keys`` lets callers scan
    any text-keyed frame (e.g. DISTINCT texts — see pipeline._mentions).
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
            *keys, F.explode(_detect(F.col("text"))).alias("m")
        )
        .select(
            *keys,
            F.col("m.surface").alias("surface"),
            F.col("m.start").alias("start"),
            F.col("m.end").alias("end"),
        )
    )
