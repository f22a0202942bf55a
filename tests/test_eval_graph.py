"""Unit fixtures for the round-3 graph/eval operators: distributed set
P/R (btd.eval), degree-oriented triangle counting, and neighborhood-
jaccard link prediction (btd.analytics.cooccur). The sf0.01 gate twins
live in tests/test_oracle_parity.py (kg_eval_pr, kg_triangles,
kg_neighbor_jaccard)."""

import pytest


def test_set_pr_counts_and_ratios(spark):
    from btd.eval import set_pr

    got = spark.createDataFrame(
        # (a,b) dup must collapse; (x,y) is the false positive
        [("a", "b"), ("a", "b"), ("c", "d"), ("x", "y")],
        "s string, o string",
    )
    gold = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")],
        "s string, o string",
    )
    r = set_pr(got, gold, ["s", "o"]).collect()[0]
    assert (r.tp, r.fp, r.fn) == (2, 1, 2)
    assert r.precision == pytest.approx(2 / 3, abs=1e-6)
    assert r.recall == pytest.approx(0.5, abs=1e-6)
    p, q = 2 / 3, 0.5
    assert r.f1 == pytest.approx(2 * p * q / (p + q), abs=1e-6)


def test_set_pr_empty_got_gives_null_precision(spark):
    from btd.eval import set_pr

    got = spark.createDataFrame([], "s string, o string")
    gold = spark.createDataFrame([("a", "b")], "s string, o string")
    r = set_pr(got, gold, ["s", "o"]).collect()[0]
    assert (r.tp, r.fp, r.fn) == (0, 0, 1)
    assert r.precision is None  # 0/0 is unmeasured, not zero
    assert r.recall == 0.0


def test_triangle_count_k4_with_noise(spark):
    """K4 (every node in 3 of the 4 triangles) plus a pendant edge,
    a duplicate, a reversed edge, and a self-loop — the normalization
    must erase direction/dups/loops; the pendant node has none."""
    from btd.graph import triangle_count

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (2, 1),          # reverse of an existing edge
        (3, 4),          # duplicate
        (4, 4),          # self-loop
        (4, 5),          # pendant
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_hub_star_has_none(spark):
    """A star (hub + leaves, no leaf-leaf edges) has zero triangles —
    and under degree-ordering the hub contributes zero wedges (all its
    edges orient INTO it), the property that keeps power-law graphs
    cheap."""
    from btd.graph import triangle_count

    df = spark.createDataFrame(
        [(0, i) for i in range(1, 20)], "src long, dst long"
    )
    assert triangle_count(df).count() == 0


def test_neighborhood_jaccard_values_and_purge(spark):
    from btd.analytics.cooccur import neighborhood_jaccard

    rows = [
        # N(1)={a,b}, N(2)={a,b}, N(3)={b,c}; hub neighbor h touches all
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "b"), (3, "c"),
        (1, "h"), (2, "h"), (3, "h"), (4, "h"),
    ]
    df = spark.createDataFrame(rows, "node long, nb string")
    got = {
        (r.node_a, r.node_b): (r.n_common, r.jaccard)
        for r in neighborhood_jaccard(
            df, "node", "nb", max_neighbor_degree=3
        ).collect()
    }
    # h purged (degree 4): degrees are post-purge (node 4 disappears)
    assert got == {
        (1, 2): (2, 1.0),
        (1, 3): (1, pytest.approx(1 / 3, abs=1e-6)),
        (2, 3): (1, pytest.approx(1 / 3, abs=1e-6)),
    }
    # without the cap, the hub links everyone (incl. node 4), J shifts
    full = {
        (r.node_a, r.node_b): r.n_common
        for r in neighborhood_jaccard(df, "node", "nb").collect()
    }
    assert (1, 4) in full and full[(1, 2)] == 3


def test_adamic_adar_values(spark):
    import math

    from btd.analytics.cooccur import adamic_adar

    rows = [
        # z1 shared by {1,2} (deg 2), z2 shared by {1,2,3} (deg 3)
        (1, "z1"), (2, "z1"), (1, "z2"), (2, "z2"), (3, "z2"),
    ]
    df = spark.createDataFrame(rows, "node long, nb string")
    got = {
        (r.node_a, r.node_b): r.aa_score
        for r in adamic_adar(df, "node", "nb").collect()
    }
    assert got == {
        (1, 2): pytest.approx(
            round(1 / math.log(2) + 1 / math.log(3), 6), abs=1e-9
        ),
        (1, 3): pytest.approx(round(1 / math.log(3), 6), abs=1e-9),
        (2, 3): pytest.approx(round(1 / math.log(3), 6), abs=1e-9),
    }


def test_postings_positions_and_min_df(spark):
    from btd.dataops.textstats import postings

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b a"), (3, "c c")],
        "doc_id long, text string",
    )
    got = {
        (r.term, r.doc_id): (r.tf, r.positions)
        for r in postings(docs).collect()
    }
    assert got[("a", 1)] == (2, "0,2")
    assert got[("a", 2)] == (1, "1")
    assert got[("c", 3)] == (2, "0,1")
    # min_df drops terms below the document-frequency floor
    kept = {r.term for r in postings(docs, min_df=2).collect()}
    assert kept == {"a", "b", "c"}
    kept3 = {r.term for r in postings(docs, min_df=3).collect()}
    assert kept3 == set()


def test_profile_table_values(spark):
    from btd.quality import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, s string"
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["k"].n_rows == 3 and got["k"].n_nulls == 0
    assert got["k"].n_distinct == 2
    assert (got["k"].min_value, got["k"].max_value) == ("1", "2")
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
    assert (got["s"].min_value, got["s"].max_value) == ("a", "b")
    # approx mode keeps the same shape (HLL exact at these cardinalities)
    approx = {r.column: r.n_distinct
              for r in profile_table(df, exact=False).collect()}
    assert approx == {"k": 2, "s": 2}


def test_profile_table_numeric_rendering(spark):
    """Numeric columns profile numerically (not lexicographically) and
    render engine-neutrally: ints plain cast, doubles fixed %.6f after
    ROUND(,6) — the r04 ev_profile hash miss was Java shortest-round-
    trip vs DuckDB float formatting diverging (1.0E-4 vs 0.0001)."""
    from btd.quality import profile_table

    df = spark.createDataFrame(
        [(9, 0.0001, None), (10, 490.02, None), (11, None, None)],
        "k long, v double, w double",
    )
    got = {r.column: r for r in profile_table(df).collect()}
    # numeric min/max: lexicographic would say min="10", max="9"
    assert (got["k"].min_value, got["k"].max_value) == ("9", "11")
    # fixed decimals, no scientific notation, no shortest-round-trip
    assert (got["v"].min_value, got["v"].max_value) == (
        "0.000100", "490.020000"
    )
    # all-NULL fractional column profiles to NULL, not "null"
    assert got["w"].min_value is None and got["w"].max_value is None


def test_fk_violations_and_nulls(spark):
    from btd.quality import fk_violations

    child = spark.createDataFrame(
        [(1, "x"), (9, "dangling"), (None, "nullkey")],
        "fk long, payload string",
    )
    parent = spark.createDataFrame([(1,), (2,), (None,)], "pk long")
    got = {r.payload for r in
           fk_violations(child, "fk", parent, "pk").collect()}
    assert got == {"dangling", "nullkey"}


def test_duplicate_keys_returns_whole_groups(spark):
    from btd.quality import constraint_report, duplicate_keys

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    dups = duplicate_keys(df, ["k"])
    assert {(r.k, r.v) for r in dups.collect()} == {(1, "a"), (1, "b")}
    rep = {r.constraint: r.n_violations for r in constraint_report(
        {"k_unique": dups, "clean": duplicate_keys(df, ["v"])}
    ).collect()}
    assert rep == {"k_unique": 2, "clean": 0}
