"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing (schema, partition-friendly layout, Arrow batch
shapes, mapInPandas UDF signatures) is real and tested; the actual
media DECODE is stubbed behind ``_decode_image`` (the sandbox has no
image/audio libraries) — it raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (derived from
the payload bytes) exercises the full pipeline end-to-end.

Layout contract for 100 TB media tables: binaries ride in their own
column so Parquet keeps them in a separate chunk (column pruning means
metadata-only queries never touch the bytes); rows are processed in
bounded Arrow batches (``maxRecordsPerBatch`` caps batch memory =
batch_rows × max_media_size).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("media", T.BinaryType(), True),  # opaque payload
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(df: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table: the
    utf-8 text bytes stand in for an encoded image payload."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit("image/fake").alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def _decode_image(payload: bytes, fake: bool) -> tuple[int, int, np.ndarray]:
    """STUB: real decode needs an image library not present in this
    container.  The fake decoder derives (width, height, 8-dim feature)
    deterministically from the payload so the surrounding Spark
    pipeline is fully exercised and reproducible."""
    if not fake:
        raise NotImplementedError(
            "image decode requires pillow/opencv; not available here — "
            "pass fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feat = (
        np.frombuffer(digest[:32], dtype=np.uint8)
        .reshape(8, 4)
        .sum(axis=1)
        .astype(np.float32)
        / 1020.0
    )
    return width, height, feat


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over bounded Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                b = bytes(payload) if payload is not None else b""
                w, h, feat = _decode_image(b, fake=fake)
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        "width": w,
                        "height": h,
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "media").mapInPandas(run, FEATURE_SCHEMA)
