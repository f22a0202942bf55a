"""Schema mining / assertion hygiene (btd.ontology) + the r4 textstats
and temporal additions: hand-checked semantics on tiny frames, the
hub-purge knob, and determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from btd.ontology import (
    infer_types,
    ontology_stats,
    resolve_conflicts,
    two_hop_reach,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, conv_id string, turn_idx int"
    )


def test_ontology_stats_counts_and_fanout(spark):
    t = _triples(
        spark,
        [
            ("a", "uses", "x", "c1", 0),
            ("a", "uses", "y", "c1", 1),
            ("b", "uses", "x", "c2", 0),
            ("b", "met_with", "z", "c2", 1),
        ],
    )
    rows = {r["pred"]: r for r in ontology_stats(t).collect()}
    assert rows["uses"]["n_triples"] == 3
    assert rows["uses"]["n_subjects"] == 2
    assert rows["uses"]["n_objects"] == 2
    assert rows["uses"]["avg_fanout"] == 1.5
    assert rows["met_with"]["n_triples"] == 1
    assert rows["met_with"]["avg_fanout"] == 1.0


def test_infer_types_majority_and_tiebreak(spark):
    t = _triples(
        spark,
        [
            ("a", "uses", "x", "c1", 0),
            ("a", "uses", "y", "c1", 1),
            ("a", "met_with", "z", "c1", 2),
            # b: 1 vote each -> lexicographically smaller pred wins
            ("b", "uses", "x", "c2", 0),
            ("b", "met_with", "z", "c2", 1),
        ],
    )
    got = {r["entity"]: r for r in infer_types(t).collect()}
    assert got["a"]["inferred_type"] == "uses"
    assert got["a"]["n_evidence"] == 2
    assert got["b"]["inferred_type"] == "met_with"
    assert got["b"]["n_evidence"] == 1


def test_resolve_conflicts_recency_wins(spark):
    t = _triples(
        spark,
        [
            ("a", "works_at", "OldCo", "c1", 0),
            ("a", "works_at", "NewCo", "c1", 5),
            ("a", "works_at", "MidCo", "c1", 3),
            ("b", "works_at", "OnlyCo", "c2", 0),
        ],
    )
    got = {r["subj"]: r for r in resolve_conflicts(t).collect()}
    assert got["a"]["obj_resolved"] == "NewCo"
    assert got["a"]["n_conflicting"] == 3
    assert got["b"]["obj_resolved"] == "OnlyCo"
    assert got["b"]["n_conflicting"] == 1


def test_resolve_conflicts_same_turn_tiebreak_deterministic(spark):
    # same (turn_idx, conv_id): obj ASC wins, regardless of layout
    rows = [("a", "p", o, "c1", 7) for o in ("zeta", "alpha", "mid")]
    t = _triples(spark, rows)
    for parts in (1, 8):
        got = resolve_conflicts(t.repartition(parts)).collect()
        assert len(got) == 1 and got[0]["obj_resolved"] == "alpha"


def test_two_hop_reach_exact_and_purge(spark):
    e = spark.createDataFrame(
        # s1 -> m1 -> {d1, d2}; s1 -> m2 -> d1 (overlap deduped)
        # s2 -> hub -> {d1..d4}
        [("s1", "m1"), ("s1", "m2"), ("s2", "hub"),
         ("m1", "d1"), ("m1", "d2"), ("m2", "d1"),
         ("hub", "d1"), ("hub", "d2"), ("hub", "d3"), ("hub", "d4")],
        "subject string, object string",
    )
    got = {r["src"]: r["n_two_hop"] for r in two_hop_reach(e).collect()}
    assert got["s1"] == 2  # d1, d2 — distinct across mids
    assert got["s2"] == 4
    # purge: the hub mid (out-degree 4) is dropped before pairing
    purged = {
        r["src"]: r["n_two_hop"]
        for r in two_hop_reach(e, max_mid_fanout=2).collect()
    }
    assert purged.get("s1") == 2
    assert "s2" not in purged


def test_heavy_hitters_df_not_cf_and_tiebreak(spark):
    from btd.dataops.textstats import heavy_hitters

    docs = spark.createDataFrame(
        [
            ("d1", "apple apple apple banana"),
            ("d2", "apple cherry"),
            ("d3", "banana cherry"),
        ],
        "doc_id string, text string",
    )
    got = heavy_hitters(docs, k=2).collect()
    # df: apple=2, banana=2, cherry=2 — collection freq would rank
    # apple first with 4; tie-break is term ASC so top-2 is apple,banana
    assert [(r["term"], r["df"]) for r in got] == [("apple", 2), ("banana", 2)]


def test_zscore_outliers_flags_spike_and_drops_degenerate(spark):
    from btd.temporal import zscore_outliers

    ev = spark.createDataFrame(
        [(i, "u1", 10.0) for i in range(9)]
        + [(9, "u1", 1000.0)]   # the spike
        + [(10, "u2", 5.0)]     # single event: stddev NULL -> dropped
        + [(11, "u3", 7.0), (12, "u3", 7.0)],  # zero variance -> dropped
        "event_id long, user_id string, value double",
    )
    got = zscore_outliers(ev, threshold=2.0).collect()
    assert [r["event_id"] for r in got] == [9]
    assert got[0]["z"] > 2


def test_dsir_weights_tilt_toward_target_domain(spark):
    from btd.dataops.textstats import dsir_weights

    docs = spark.createDataFrame(
        [
            ("t1", "the cat sat on the mat", "wiki"),
            ("t2", "the cat ate the fish", "wiki"),
            ("o1", "buy cheap pills online now", "spam"),
            ("o2", "the cat sat on the mat", "spam"),  # target-like text
        ],
        "doc_id string, text string, source string",
    )
    w = {r["doc_id"]: r["dsir_weight"] for r in
         dsir_weights(docs, target_source="wiki").collect()}
    # target-domain docs and target-LIKE text outrank out-of-domain
    assert w["t1"] > w["o1"]
    assert w["o2"] > w["o1"]  # weight follows TEXT, not the source label


def test_dsir_weights_empty_target_raises(spark):
    """A target_source matching no documents must fail fast with a
    clear error, not emit inf/NULL weights from a 0 denominator
    (r4 advice)."""
    import pytest

    from btd.dataops.textstats import dsir_weights

    docs = spark.createDataFrame(
        [("t1", "the cat sat", "wiki")],
        "doc_id string, text string, source string",
    )
    with pytest.raises(ValueError, match="no documents with source"):
        dsir_weights(docs, target_source="nope")


def test_temporal_triples_intervals_and_run_collapse(spark):
    from btd.ontology import temporal_triples

    t = _triples(
        spark,
        [
            ("a", "works_at", "OldCo", "c1", 0),
            ("a", "works_at", "OldCo", "c1", 1),  # re-assertion: collapses
            ("a", "works_at", "NewCo", "c1", 4),
            ("a", "works_at", "OldCo", "c1", 7),  # back again: NEW interval
            ("b", "works_at", "OnlyCo", "c2", 2),
        ],
    )
    rows = sorted(
        (
            (r["subj"], r["obj"], r["valid_from"], r["valid_to"])
            for r in temporal_triples(t).collect()
        )
    )
    assert rows == [
        ("a", "NewCo", 4, 7),
        ("a", "OldCo", 0, 4),
        ("a", "OldCo", 7, None),  # the live assertion
        ("b", "OnlyCo", 2, None),
    ]


def test_winnow_fingerprints_guarantee_and_short_docs(spark):
    """Winnowing guarantee: docs sharing a run of >= k+window-1 tokens
    share at least one fingerprint; unrelated docs share none; docs
    shorter than k+window-1 emit nothing."""
    from btd.dataops.textstats import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 = k+window-1
    docs = spark.createDataFrame(
        [
            ("d1", f"one two {shared} three four"),
            ("d2", f"five six seven {shared} eight"),
            ("d3", "nine ten eleven twelve thirteen fourteen fifteen"),
            ("d4", "too short"),
        ],
        "doc_id string, text string",
    )
    fp = winnow_fingerprints(docs, k=3, window=4).collect()
    by_doc: dict = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc["d1"] & by_doc["d2"], "shared run must share a fingerprint"
    assert not (by_doc["d1"] & by_doc["d3"])
    assert "d4" not in by_doc


def test_winnow_near_dup_catches_partial_overlap_minhash_misses(spark):
    """A shared 8-token run inside two long otherwise-different docs:
    Jaccard over full shingle sets is tiny (MinHash at 0.5 misses it)
    but winnowing's covering property guarantees shared fingerprints."""
    from btd.dataops.dedup import minhash_near_dup, winnow_near_dup

    shared = "the quick brown fox jumps over lazy dogs"
    filler_a = " ".join(f"alpha{i}" for i in range(40))
    filler_b = " ".join(f"beta{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, f"{filler_a} {shared}"), (2, f"{shared} {filler_b}"),
         (3, " ".join(f"gamma{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    pairs = winnow_near_dup(docs, k=3, window=4, min_shared=2).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["n_shared"] >= 2
    # the same pair is invisible to whole-document MinHash at 0.5
    mh = minhash_near_dup(docs, 0.5).collect()
    assert not any({r[0], r[1]} == {1, 2} for r in mh)
