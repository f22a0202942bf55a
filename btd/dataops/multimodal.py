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


RESIZE_SCHEMA = (
    "media_id long, width int, height int, payload binary"
)


def resize_images(
    media: DataFrame, width: int = 2, height: int = 2, fake: bool = True
) -> DataFrame:
    """Arrow-batched resize over the binary column.

    Real implementation would decode → PIL/cv2 resize → re-encode; the
    deterministic stand-in block-averages the (fake-decoded) byte array
    down to width*height bytes, so output size, schema, and batch shape
    are exactly what the real kernel produces.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n_out = width * height
        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                a = decode_image(p, fake=fake).astype(np.float64)
                # block-average into n_out buckets (deterministic)
                idx = (np.arange(len(a)) * n_out) // max(len(a), 1)
                buckets = np.zeros(n_out)
                counts = np.bincount(idx, minlength=n_out)
                np.add.at(buckets, idx, a)
                outs.append(
                    bytes(
                        (buckets / np.maximum(counts, 1))
                        .astype(np.uint8)
                        .tolist()
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": outs,
                }
            )

    return media.mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(
    media: DataFrame, frame_bytes: int = 4, every_nth: int = 2, fake: bool = True
) -> DataFrame:
    """Frame sampling for video-like payloads: treat the payload as a
    sequence of fixed-size frames, keep every Nth (a real kernel swaps
    byte-slicing for a container demuxer; partitioning, explode shape,
    and per-batch memory behavior are identical)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                a = bytes(decode_image(p, fake=fake).tolist())
                n_frames = len(a) // frame_bytes
                for fi in range(0, n_frames, every_nth):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(a[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(kernel, FRAME_SCHEMA)
