"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic byte-statistics "decode". Everything
Spark-side — schema, partitioning, UDF signature, batch shape — is real
and tested; swapping in PIL/librosa later only changes the kernel body.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row: payload + typed metadata (north-rule style: binary is
#: opaque; structure lives in columns Catalyst can prune/push down).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, byte_mean double, byte_min int, byte_max int"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents: payload = md5
    digest bytes of the text (stands in for image bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.to_binary(F.md5("text"), F.lit("hex")).alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.lit(4).cast("int").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False):
    """Real decode needs PIL — not in this container."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not installed); "
            "pass fake=True for the deterministic byte-stats stand-in"
        )
    import numpy as np

    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: whole Arrow batches in/out — the shape a real
    decode/resize/frame-sample kernel uses. Features here are byte
    statistics of the (fake-)decoded array.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            arrs = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(a) for a in arrs],
                    "byte_mean": [float(np.mean(a)) for a in arrs],
                    "byte_min": [int(a.min()) for a in arrs],
                    "byte_max": [int(a.max()) for a in arrs],
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)
