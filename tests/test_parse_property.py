"""Property-based tests (hypothesis): serialize→parse is the identity
for any valid quad the reference grammar admits; malformed lines never
crash the parser, only drop."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from btd.parse import NQUAD_REGEX

_PAT = re.compile(NQUAD_REGEX)

# component strategies mirroring the grammar alternatives
# (RDFStatement.java:22)
iri = st.from_regex(r"<http://[a-z0-9/.#]{1,30}>", fullmatch=True)
bare = st.from_regex(r"[a-zA-Z0-9_:]{1,20}", fullmatch=True)
literal = st.from_regex(r'"[a-zA-Z0-9 .,]{0,30}"', fullmatch=True)
typed = st.builds(
    lambda v, t: f'"{v}"^^{t}',
    st.from_regex(r"[a-zA-Z0-9-]{1,20}", fullmatch=True),
    iri,
)

subject_s = st.one_of(iri, bare)
object_s = st.one_of(iri, literal, bare, typed)
context_s = st.one_of(st.just(""), iri)


def _py_parse(line: str):
    # matcher.matches() in the reference = anchored whole-line match
    m = _PAT.fullmatch(line)
    if not m:
        return None
    return (m.group(1), m.group(2), m.group(3), m.group(4) or "")


@settings(max_examples=300, deadline=None)
@given(s=subject_s, p=iri, o=object_s, c=context_s)
def test_serialize_parse_identity(s, p, o, c):
    line = f"{s} {p} {o} {c} ." if c else f"{s} {p} {o} ."
    got = _py_parse(line)
    assert got == (s, p, o, c), line


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=80))
def test_arbitrary_lines_never_crash(line):
    r = _py_parse(line.replace("\n", " "))
    if r is not None:
        s, p, o, c = r
        # whatever matches obeys the grammar's shape constraints
        assert p.startswith("<") and p.endswith(">")
        assert c == "" or (c.startswith("<") and c.endswith(">"))


def test_spark_agrees_with_python_regex_on_generated_sample(spark):
    """The JVM regex (Spark) and Python re agree on a deterministic
    sample of valid + invalid lines (same engine family, but comma
    semantics can differ — pin them)."""
    from btd.parse import parse_nquads

    lines = [
        "<http://a> <http://p> <http://b> .",
        "<http://a> <http://p> <http://b> <http://c> .",
        '_:b1 <http://p> "lit with spaces" .',
        '_:b1 <http://p> "1999-02-24"^^<http://x#date> <http://c> .',
        "bare:tok <http://p> bare2 .",
        "<unterminated <http://p> <http://b> .",
        "no predicate here .",
        "",
        "<http://a> <http://p> .",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    got = {
        (r.subject, r.predicate, r.object, r.context)
        for r in parse_nquads(df).collect()
    }
    expected = {r for r in (_py_parse(l) for l in lines) if r is not None}
    assert got == expected
