"""Parser golden tests against the reference's own fixture
(/root/reference/assets/sample.txt, 63 n-quad lines) and the synthetic
raw-text twin (FIXTURES.md §1)."""

from __future__ import annotations

import collections

from btd.fixtures import gen_triples, to_lines
from btd.parse import parse_metrics, parse_nquads, read_nquads, to_nquad_lines

SAMPLE = "/root/reference/assets/sample.txt"


def test_sample_txt_all_lines_parse(spark):
    df = read_nquads(spark, SAMPLE)
    assert df.count() == 63


def test_sample_txt_distinct_subjects(spark):
    # report/report.md:161-192: 9 distinct subjects in sample.txt
    df = read_nquads(spark, SAMPLE)
    assert df.select("subject").distinct().count() == 9


def test_sample_txt_outdegree_histogram(spark):
    # FIXTURES.md golden: {1:1, 6:6, 12:1, 14:1} on the 63-line file
    from btd.analytics import outdegree_histogram

    df = read_nquads(spark, SAMPLE)
    hist = {r["degree"]: r["n_nodes"] for r in outdegree_histogram(df).collect()}
    assert hist == {1: 1, 6: 6, 12: 1, 14: 1}


def test_sample_txt_field_shapes(spark):
    rows = read_nquads(spark, SAMPLE).collect()
    for r in rows:
        assert r.subject.startswith("<") or r.subject.startswith("_:")
        assert r.predicate.startswith("<") and r.predicate.endswith(">")
        assert r.context == "" or (
            r.context.startswith("<") and r.context.endswith(">")
        )


def test_typed_literal_captured_whole(spark):
    line = (
        '_:b1 <http://p> "1999-02-24"^^<http://www.w3.org/2001/XMLSchema#date> '
        "<http://ctx> ."
    )
    df = parse_nquads(spark.createDataFrame([(line,)], "value string"))
    r = df.collect()[0]
    assert r.object == '"1999-02-24"^^<http://www.w3.org/2001/XMLSchema#date>'
    assert r.context == "<http://ctx>"


def test_malformed_lines_dropped_and_counted(spark):
    rows = gen_triples(200, seed=7)
    lines = to_lines(rows, malformed_every=10, seed=7)
    n_bad = len(lines) - len(rows)
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    assert parse_nquads(df).count() == len(rows)
    m = parse_metrics(df).collect()[0]
    assert m["parsed"] == len(rows)
    assert m["dropped"] == n_bad


def test_roundtrip_parse_serialize(spark):
    rows = gen_triples(300, seed=11)
    lines = to_lines(rows)
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    parsed = parse_nquads(df)
    got = sorted(
        (r.subject, r.predicate, r.object, r.context) for r in parsed.collect()
    )
    assert got == sorted(rows)
    # serialize with context cleared: double-space golden shape
    out = to_nquad_lines(parsed).collect()
    assert all(l.value.endswith("  .") for l in out)


def test_empty_context_roundtrip_matches_python_oracle(spark):
    rows = gen_triples(500, seed=13)
    ctx_counter = collections.Counter(c == "" for *_, c in rows)
    lines = to_lines(rows)
    df = parse_nquads(spark.createDataFrame([(l,) for l in lines], "value string"))
    got = collections.Counter(r.context == "" for r in df.collect())
    assert got == ctx_counter


def test_dedup_reference_order_bytes_golden(spark):
    """The report's duplicate-then-diff procedure (report.md:364-376):
    duplicate sample.txt, run dedup, and the output must byte-match the
    deduplicated input — here strengthened to BYTE-IDENTICAL lines IN
    ORDER: descending (s,p,o) per RDFStatement.compareTo's inverted
    comparisons (RDFStatement.java:104-120) with the cleared-context
    double-space toString shape (RDFStatement.java:139-142)."""
    from btd.analytics.dedup import remove_duplicate_triples

    raw = spark.read.text(SAMPLE)
    doubled = raw.unionAll(raw)  # cat temp.txt >> sample.txt
    assert doubled.count() == 126
    deduped = remove_duplicate_triples(
        parse_nquads(doubled), order="reference"
    )
    got = [r.value for r in to_nquad_lines(deduped).collect()]

    # pure-Python oracle: distinct (s,p,o) of the single file, sorted
    # descending, reference toString with cleared context
    spo = {
        (r.subject, r.predicate, r.object)
        for r in parse_nquads(raw).collect()
    }
    expected = [
        f"{s} {p} {o}  ."
        for s, p, o in sorted(spo, reverse=True)
    ]
    assert got == expected  # byte-identical, order included
    # and the report's weaker sorted-diff check holds a fortiori
    assert sorted(got) == sorted(expected)


def test_histogram_text_bytes_golden(spark):
    """Byte-identical TextOutputFormat shape for the degree histogram:
    sample.txt's published outdegree distribution (report.md:196-198)
    as 'degree<TAB>count' ascending lines."""
    from btd.analytics import outdegree_histogram
    from btd.analytics.degrees import histogram_text_lines
    from btd.parse import read_nquads

    from btd.parse import parse_nquads

    # full 63-line sample.txt
    t = read_nquads(spark, "/root/reference/assets/sample.txt")
    lines = [
        r.value for r in histogram_text_lines(outdegree_histogram(t)).collect()
    ]
    assert lines == ["1\t1", "6\t6", "12\t1", "14\t1"]
    # the report's published histogram is for the ORIGINAL 27-line
    # sample (report.md:161-198): first 27 lines reproduce it exactly
    raw27 = spark.read.text("/root/reference/assets/sample.txt").limit(27)
    lines27 = [
        r.value
        for r in histogram_text_lines(
            outdegree_histogram(parse_nquads(raw27))
        ).collect()
    ]
    assert lines27 == ["2\t1", "3\t6", "7\t1"]


def test_packed_parse_equals_per_group_extract(spark):
    """The single-replace packed parse must agree with the per-group
    regexp_extract formulation on every grammar alternative plus
    replacement-template metacharacters in field values."""
    from pyspark.sql import functions as F

    from btd.parse import NQUAD_LINE_REGEX

    lines = [
        "<s> <p> <o> .",
        "<s> <p> <o> <c> .",
        '_:b1 <p> "lit with $1 and \\\\ and $0" .',
        '<s> <p> "1999-02-24"^^<http://www.w3.org/2001/XMLSchema#date> <c> .',
        "a:b <p> \"v\" .",
        "malformed",
        "garbage <s> <p> <o> . trailing",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    got = sorted(tuple(r) for r in parse_nquads(df).collect())
    v = F.col("value")
    ref = sorted(
        tuple(r)
        for r in df.where(v.rlike(NQUAD_LINE_REGEX))
        .select(
            *[
                F.regexp_extract(v, NQUAD_LINE_REGEX, i).alias(c)
                for i, c in enumerate(
                    ("subject", "predicate", "object", "context"), 1
                )
            ]
        )
        .collect()
    )
    assert got == ref and len(got) == 5


def test_gz_decompress_then_repartition(spark, tmp_path):
    """The reference's splittability ceiling (report/report.md:539-552:
    one .gz file = one split = one mapper) and the engine's escape
    hatch: a single-gz scan yields 1 partition; min_partitions
    repartitions the raw lines before the regex parse so the NFA work
    parallelizes. Result rows are identical either way."""
    import gzip

    from btd.fixtures import gen_triples, to_lines

    rows = gen_triples(300, seed=11)
    gz = tmp_path / "quads.nq.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(to_lines(rows)) + "\n")

    ceiling = read_nquads(spark, str(gz))
    assert ceiling.rdd.getNumPartitions() == 1  # the reference's trap

    fanned = read_nquads(spark, str(gz), min_partitions=8)
    assert fanned.rdd.getNumPartitions() == 8
    assert (
        sorted(map(tuple, fanned.collect()))
        == sorted(map(tuple, ceiling.collect()))
    )

    # a well-split input passes through untouched (no gratuitous shuffle)
    well_split = read_nquads(spark, SAMPLE, min_partitions=1)
    assert "Exchange" not in well_split._jdf.queryExecution().executedPlan().toString()
