"""Deterministic synthetic fixtures (FIXTURES.md §1-2). Seed=42 always;
no wall-clock, no unseeded randomness — same bytes every run.

Two generators:
- :func:`gen_triples` — n-quad rows with power-law outdegree skew,
  blank nodes, empty contexts, repeated (s,p,o) under many contexts,
  exact duplicate quads, and typed literals (every edge case each
  reference analysis exercises).
- :func:`gen_transcripts` — north-rule transcript rows built from a
  fixed gazetteer + sentence templates so a pure-Python oracle
  extractor knows the exact (subj, pred, obj) set (P/R harness).
"""

from __future__ import annotations

import datetime as dt
import random

# --------------------------------------------------------------------------
# n-quad triples fixture
# --------------------------------------------------------------------------

PREDICATES = [f"<http://ex.org/p/{i}>" for i in range(12)]
CONTEXTS = [f"<http://ctx.org/g/{i}>" for i in range(20)]


def gen_triples(n: int = 2000, seed: int = 42) -> list[tuple[str, str, str, str]]:
    """Rows (subject, predicate, object, context); context '' when absent."""
    rng = random.Random(seed)
    rows: list[tuple[str, str, str, str]] = []
    n_subjects = max(10, n // 20)

    def subject(i: int) -> str:
        # ~30% blank subjects
        return f"_:b{i}" if i % 10 < 3 else f"<http://ex.org/s/{i}>"

    def obj(i: int) -> str:
        r = i % 20
        if r < 3:  # ~15% blank objects
            return f"_:ob{i}"
        if r < 6:  # plain literals
            return f'"literal value {i}"'
        if r < 8:  # typed literals (regex alternative 4)
            return f'"{1990 + i % 30}-01-02"^^<http://www.w3.org/2001/XMLSchema#date>'
        return f"<http://ex.org/o/{i}>"

    while len(rows) < n:
        # power-law-ish outdegree: subject 0 is hot (skew path)
        u = rng.random()
        si = 0 if u < 0.15 else rng.randint(1, n_subjects - 1)
        s = subject(si)
        p = rng.choice(PREDICATES)
        o = obj(rng.randint(0, 10 * n_subjects))
        # ~30% empty contexts
        c = "" if rng.random() < 0.3 else rng.choice(CONTEXTS)
        rows.append((s, p, o, c))
        # same (s,p,o) under several distinct contexts (A6 path)
        if rng.random() < 0.08:
            for _ in range(rng.randint(1, 5)):
                rows.append((s, p, o, rng.choice(CONTEXTS)))
        # exact duplicate quad (A8 path)
        if rng.random() < 0.05:
            rows.append((s, p, o, c))
    return rows[:n]


def to_lines(
    rows: list[tuple[str, str, str, str]],
    malformed_every: int = 0,
    seed: int = 42,
) -> list[str]:
    """Serialize rows as INPUT n-quad lines: ``s p o [ctx ].`` — single
    space before the dot when context is absent, like real BTC input.
    (The reference's double-space shape, RDFStatement.java:139-142, is
    an OUTPUT quirk its own regex cannot re-parse; see
    btd.parse.to_nquad_lines.) Optionally interleave malformed lines to
    exercise the parse-and-drop path."""
    rng = random.Random(seed)
    out: list[str] = []
    for i, (s, p, o, c) in enumerate(rows):
        out.append(f"{s} {p} {o} {c} ." if c else f"{s} {p} {o} .")
        if malformed_every and i % malformed_every == malformed_every - 1:
            out.append(rng.choice(["<only-subject>", "not a quad at all", "<a> <b>"]))
    return out


# --------------------------------------------------------------------------
# transcripts fixture (north rule)
# --------------------------------------------------------------------------

#: Fixed gazetteer: canonical entity -> surface forms (near-duplicates
#: feed the LSH-linking tests).
GAZETTEER: dict[str, list[str]] = {
    "acme_corp": ["Acme Corp", "ACME Corporation", "Acme Corp."],
    "globex": ["Globex", "Globex Inc"],
    "initech": ["Initech", "Initech LLC"],
    "alice": ["Alice Johnson", "A. Johnson"],
    "bob": ["Bob Smith", "Robert Smith"],
    "carol": ["Carol Diaz"],
    "paris": ["Paris"],
    "tokyo": ["Tokyo"],
    "spark": ["Apache Spark", "Spark"],
    "hadoop": ["Apache Hadoop", "Hadoop"],
}

#: Sentence templates: (template, predicate). {a}/{b} are entity
#: surface forms; the implied triple is (canonical_a, pred, canonical_b).
TEMPLATES: list[tuple[str, str]] = [
    ("{a} works at {b}.", "works_at"),
    ("{a} is located in {b}.", "located_in"),
    ("{a} acquired {b}.", "acquired"),
    ("{a} uses {b}.", "uses"),
    ("{a} met with {b}.", "met_with"),
]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["", "", "", "search", "search", "search", "calc", "browser"]  # hot 'search'


def gen_transcripts(
    n_convs: int = 40, turns_per_conv: int = 12, seed: int = 42
) -> tuple[list[dict], list[tuple[str, str, str]]]:
    """Returns (rows, expected_triples).

    rows: dicts matching btd.schema.TRANSCRIPTS; emitted deliberately
    OUT of turn_idx order (the stable-ordering invariant must restore
    them). expected_triples: canonical (subj, pred, obj) set the oracle
    extractor implies — ground truth for the P/R >= 0.95 check.
    """
    rng = random.Random(seed)
    ents = sorted(GAZETTEER)
    rows: list[dict] = []
    expected: list[tuple[str, str, str]] = []
    epoch = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
    for ci in range(n_convs):
        # hot conversations: a few convs get many more turns (skew)
        n_turns = turns_per_conv * (8 if ci < 2 else 1)
        conv = f"conv{ci:04d}"
        conv_rows = []
        for ti in range(n_turns):
            if rng.random() < 0.7:
                a, b = rng.sample(ents, 2)
                sa = rng.choice(GAZETTEER[a])
                sb = rng.choice(GAZETTEER[b])
                tmpl, pred = rng.choice(TEMPLATES)
                text = tmpl.format(a=sa, b=sb)
                expected.append((a, pred, b))
            else:
                text = f"Just a chatty turn number {ti} with no facts."
            conv_rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": ti,
                    "role": ROLES[ti % 3],
                    "text": text,
                    "tool": rng.choice(TOOLS),
                    "ts": epoch + dt.timedelta(minutes=ci * 1000 + ti),
                }
            )
        rng.shuffle(conv_rows)  # delivered out of order on purpose
        rows.extend(conv_rows)
    return rows, expected


def surface_to_canonical() -> dict[str, str]:
    """Inverse gazetteer: surface form -> canonical id."""
    return {s: c for c, forms in GAZETTEER.items() for s in forms}
