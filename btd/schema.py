"""Canonical StructTypes for the engine (SURVEY.md §1).

``''`` (empty string) — never NULL — encodes "absent context",
mirroring the reference's ``RDFStatement.setAll``
(/root/reference/src/ponzi/federico/bdc/utils/RDFStatement.java:74).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Parsed n-quad table — the reference's RDFStatement
#: (utils/RDFStatement.java:18-28) as a columnar DataFrame.
TRIPLES = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("context", T.StringType(), False),
    ]
)

#: North-rule input (BASELINE.json input_hint): multi-turn transcripts.
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

#: Extracted KG triples with provenance (north-rule output shape).
KG_TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
    ]
)

#: Entity table after linking/canonicalization.
ENTITIES = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical_id", T.StringType(), False),
        T.StructField("surface", T.StringType(), False),
    ]
)
