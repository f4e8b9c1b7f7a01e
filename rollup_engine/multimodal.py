"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing (schema, partition-friendly layout, Arrow batch
shapes, mapInPandas UDF signatures) is real and tested.  Image HEADER
decode (width/height) is REAL for PNG/GIF/BMP/JPEG — pure stdlib byte
parsing (``parse_image_header``), no image library needed.  Full PIXEL
decode (and therefore content-derived features) still needs a codec
library the sandbox lacks: for unrecognized payloads ``_decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (derived from the payload bytes) exercises
the full pipeline end-to-end; recognized headers always yield real
dimensions, with the feature vector derived from the payload digest
(documented stand-in for a model embedding).

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


def parse_image_header(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the container header — pure stdlib byte
    parsing, no image library.  Formats: PNG (IHDR, big-endian), GIF
    (87a/89a logical screen, little-endian), BMP (BITMAPINFOHEADER,
    little-endian; height may be negative for top-down rows), JPEG
    (first SOFn marker scan, big-endian).  Returns None when the
    payload is not a recognized image container."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h)
    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), abs(int(h))
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        # walk marker segments to the first start-of-frame
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None
            # JPEG permits runs of 0xFF fill bytes between segments
            # (ITU T.81 §B.1.1.2); the marker byte is the first
            # non-0xFF after the run.
            while i + 9 <= len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 9 > len(payload):
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h)
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    return None


def _digest_feature(digest: bytes) -> np.ndarray:
    """8-dim deterministic stand-in for a model embedding, derived from
    the payload digest (real content embeddings need a codec + model
    the sandbox lacks; the Spark-side shapes are identical)."""
    return (
        np.frombuffer(digest[:32], dtype=np.uint8)
        .reshape(8, 4)
        .sum(axis=1)
        .astype(np.float32)
        / 1020.0
    )


def _decode_image(payload: bytes, fake: bool) -> tuple[int, int, np.ndarray]:
    """Real header parse when the payload is a recognized image
    container; otherwise the deterministic fake decoder (``fake=True``)
    or NotImplementedError — full pixel decode needs an image library
    not present in this container."""
    digest = hashlib.sha256(payload).digest()
    dims = parse_image_header(payload)
    if dims is not None:
        return dims[0], dims[1], _digest_feature(digest)
    if not fake:
        raise NotImplementedError(
            "unrecognized image container: header parsing covers "
            "PNG/GIF/BMP/JPEG; full pixel decode requires pillow/opencv "
            "— pass fake=True for the deterministic stub"
        )
    return 64 + digest[0], 64 + digest[1], _digest_feature(digest)


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
