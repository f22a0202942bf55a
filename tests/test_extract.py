"""Extraction-layer tests: stable turn ordering invariant, mention
spans, relation extraction P/R vs the pure-Python oracle twin."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from btd.extract.mentions import build_mention_pattern, detect_mentions
from btd.extract.relations import extract_relations_py, extract_triples
from btd.extract.turns import check_turn_integrity, ordered_turns, with_prev_text
from btd.fixtures import GAZETTEER, surface_to_canonical


def test_ordered_turns_restores_order(spark, transcripts_df):
    out = ordered_turns(transcripts_df)
    bad = out.where(F.col("turn_rank") != F.col("turn_idx") + 1).count()
    assert bad == 0  # fixture has dense 0-based turn_idx


def test_per_turn_text_equality_invariant(spark, transcripts_df, transcripts_fixture):
    # north-rule invariant: text keyed by (conv_id, turn_idx) survives
    # any physical reordering / repartitioning
    rows, _ = transcripts_fixture
    expected = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
    shuffled = transcripts_df.repartition(13, "role")  # adversarial reshuffle
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in ordered_turns(shuffled).collect()
    }
    assert got == expected


def test_turn_integrity(spark, transcripts_df):
    bad = check_turn_integrity(transcripts_df).where(F.col("n_dup_turns") > 0)
    assert bad.count() == 0


def test_with_prev_text(spark, transcripts_df):
    out = with_prev_text(transcripts_df, 2)
    r = (
        out.where((F.col("conv_id") == "conv0005") & (F.col("turn_idx") == 2))
        .collect()[0]
    )
    prev = (
        transcripts_df.where(
            (F.col("conv_id") == "conv0005") & (F.col("turn_idx") < 2)
        )
        .orderBy("turn_idx")
        .collect()
    )
    assert r.prev_texts == [p.text for p in prev]


def test_mention_spans_match_python_re(spark, transcripts_df, transcripts_fixture):
    rows, _ = transcripts_fixture
    surfaces = sorted({s for forms in GAZETTEER.values() for s in forms})
    rx = re.compile(build_mention_pattern(surfaces))
    expected = set()
    for r in rows:
        for m in rx.finditer(r["text"]):
            expected.add((r["conv_id"], r["turn_idx"], m.group(1), m.start(1)))
    got = {
        (r.conv_id, r.turn_idx, r.surface, r.start)
        for r in detect_mentions(transcripts_df, surfaces).collect()
    }
    assert got == expected
    assert len(got) > 100  # fixture is mention-dense


def test_extraction_pr_vs_oracle(spark, transcripts_df, transcripts_fixture):
    """P/R >= 0.95 of the Spark pandas-UDF extractor vs ground truth
    (BASELINE.json metric). Surfaces mapped to canonicals via the
    gazetteer inverse — linking is tested separately."""
    rows, expected_list = transcripts_fixture
    s2c = surface_to_canonical()
    expected = set(expected_list)
    got = set()
    for r in extract_triples(transcripts_df).collect():
        a, b = s2c.get(r.subj), s2c.get(r.obj)
        if a and b:
            got.add((a, r.pred, b))
    tp = len(got & expected)
    precision = tp / len(got)
    recall = tp / len(expected)
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_spark_extractor_equals_python_twin(spark, transcripts_df, transcripts_fixture):
    rows, _ = transcripts_fixture
    expected = set()
    for r in rows:
        for s, p, o in extract_relations_py(r["text"]):
            expected.add((s, p, o, r["conv_id"], r["turn_idx"]))
    got = {
        (r.subj, r.pred, r.obj, r.conv_id, r.turn_idx)
        for r in extract_triples(transcripts_df).collect()
    }
    assert got == expected


def test_trie_pattern_equals_naive_alternation():
    """The trie-compiled gazetteer regex must match exactly what the
    naive longest-first alternation matches — same spans, same
    surfaces — on adversarial prefix-nested vocabularies."""
    import random
    import re

    from btd.extract.mentions import build_mention_pattern

    rng = random.Random(11)
    base = ["a", "ab", "abc", "crew", "crew scan", "crew scan x",
            "b.c", "b", "x+y", "x"]
    for trial in range(20):
        words = rng.sample(base, rng.randint(1, len(base)))
        naive = (r"(?<![\w])("
                 + "|".join(re.escape(s) for s in
                            sorted(set(words), key=lambda s: (-len(s), s)))
                 + r")(?![\w])")
        trie = build_mention_pattern(words)
        text = " ".join(rng.choice(base + ["zzz", "abcd", "crew scans"])
                        for _ in range(30))
        got_n = [(m.group(1), m.start(1), m.end(1))
                 for m in re.finditer(naive, text)]
        got_t = [(m.group(1), m.start(1), m.end(1))
                 for m in re.finditer(trie, text)]
        assert got_t == got_n, f"trial {trial}: {words}"
