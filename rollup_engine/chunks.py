"""Compressed chunk storage: one row per (conv_id-hash bucket, time
chunk), the north star's storage-tier layout.

Raw turns are grouped by ``(pmod(xxhash64(conv_id), n_buckets),
date_trunc('day', ts))``, sorted by the stable ``(conv_id, turn_idx)``
order, and packed: timestamps delta-of-delta encoded, requested metric
streams Gorilla-XOR encoded (codec.py), row payloads (conv_id, turn_idx,
role, text, tool) kept as parallel arrays (parquet's own encodings
handle strings).  ``decode_chunks`` restores the exact original rows —
per-turn text equality under stable ordering is the pinned invariant
(BASELINE.json input_hint; tests/test_codec.py round-trips it).

Scale shape: the groupBy shuffles raw rows once on the chunk key; each
chunk is one applyInPandas group, bounded by (bucket, day) — the bucket
count is the knob that keeps groups executor-sized at 10^12 turns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec

DEFAULT_BUCKETS = 64


def chunk_schema(metric_cols: list[str]) -> T.StructType:
    fields = [
        T.StructField("conv_bucket", T.LongType(), False),
        T.StructField("time_chunk", T.TimestampType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("conv_ids", T.ArrayType(T.StringType()), False),
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType()), False),
        T.StructField("roles", T.ArrayType(T.StringType()), True),
        T.StructField("texts", T.ArrayType(T.StringType()), True),
        T.StructField("tools", T.ArrayType(T.StringType()), True),
        T.StructField("ts_enc", T.BinaryType(), False),
    ]
    for m in metric_cols:
        fields.append(T.StructField(f"{m}_gx", T.BinaryType(), True))
    return T.StructType(fields)


def encode_chunks(
    df: DataFrame,
    metric_cols: list[str] | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Transcript rows → compressed chunk rows."""
    metric_cols = metric_cols or []
    schema = chunk_schema(metric_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
        ts = pdf["ts"].values.astype("datetime64[us]").astype(np.int64)
        row = {
            "conv_bucket": pdf["conv_bucket"].iloc[0],
            "time_chunk": pdf["time_chunk"].iloc[0],
            "n": len(pdf),
            "conv_ids": pdf["conv_id"].tolist(),
            "turn_idxs": pdf["turn_idx"].tolist(),
            "roles": pdf["role"].tolist(),
            "texts": pdf["text"].tolist(),
            "tools": pdf["tool"].tolist(),
            "ts_enc": codec.encode_timestamps(ts),
        }
        for m in metric_cols:
            row[f"{m}_gx"] = codec.encode_floats(
                pdf[m].to_numpy(dtype=np.float64)
            )
        return pd.DataFrame([row])

    keyed = df.withColumns(
        {
            "conv_bucket": F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)),
            "time_chunk": F.date_trunc("day", F.col("ts")),
        }
    )
    return keyed.groupBy("conv_bucket", "time_chunk").applyInPandas(pack, schema)


def decode_chunks(chunks: DataFrame, metric_cols: list[str] | None = None) -> DataFrame:
    """Compressed chunk rows → original transcript rows (+ metrics)."""
    metric_cols = metric_cols or []
    fields = [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
    for m in metric_cols:
        fields.append(T.StructField(m, T.DoubleType(), True))
    schema = T.StructType(fields)

    def unpack(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ts = codec.decode_timestamps(row["ts_enc"]).astype(
                    "datetime64[us]"
                )
                out = pd.DataFrame(
                    {
                        "conv_id": row["conv_ids"],
                        "turn_idx": np.asarray(row["turn_idxs"], dtype=np.int32),
                        "role": row["roles"],
                        "text": row["texts"],
                        "tool": row["tools"],
                        "ts": ts,
                    }
                )
                for m in metric_cols:
                    out[m] = codec.decode_floats(row[f"{m}_gx"])
                yield out

    return chunks.mapInPandas(unpack, schema)


def compact_chunks(
    chunks: DataFrame, metric_cols: list[str] | None = None
) -> DataFrame:
    """Merge fragmented chunk rows — the storage-maintenance pass
    (Iceberg ``rewrite_data_files`` analog for this layout).

    Incremental ingest appends one chunk row per (key, batch), so a
    (conv_bucket, time_chunk) key accumulates fragments and every
    reader pays per-fragment decode setup plus worse compression
    (delta-of-delta restarts at each fragment boundary).  Compaction
    re-groups by the SAME chunk key (one shuffle of the already-
    compressed rows — bytes shuffled ≈ compressed size, never raw
    scale), decodes each key's fragments, re-sorts to the canonical
    stable (conv_id, turn_idx) order, and re-packs to exactly one row
    per key.  Single-fragment keys pass through without a decode
    (the common case after the first compaction).

    Invariant (pinned by tests): ``decode_chunks(compact_chunks(c)) ==
    decode_chunks(c)`` row-for-row, and the output has one row per key.
    """
    metric_cols = metric_cols or []
    schema = chunk_schema(metric_cols)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 1:
            return pdf
        flat = pd.DataFrame(
            {
                "conv_id": np.concatenate(
                    [np.asarray(x, dtype=object) for x in pdf["conv_ids"]]
                ),
                "turn_idx": np.concatenate(
                    [np.asarray(x, dtype=np.int32) for x in pdf["turn_idxs"]]
                ),
                "role": np.concatenate(
                    [np.asarray(x, dtype=object) for x in pdf["roles"]]
                ),
                "text": np.concatenate(
                    [np.asarray(x, dtype=object) for x in pdf["texts"]]
                ),
                "tool": np.concatenate(
                    [np.asarray(x, dtype=object) for x in pdf["tools"]]
                ),
                "_ts": np.concatenate(
                    [codec.decode_timestamps(b) for b in pdf["ts_enc"]]
                ),
            }
        )
        for m in metric_cols:
            flat[m] = np.concatenate(
                [codec.decode_floats(b) for b in pdf[f"{m}_gx"]]
            )
        flat = flat.sort_values(["conv_id", "turn_idx"], kind="stable")
        row = {
            "conv_bucket": pdf["conv_bucket"].iloc[0],
            "time_chunk": pdf["time_chunk"].iloc[0],
            "n": len(flat),
            "conv_ids": flat["conv_id"].tolist(),
            "turn_idxs": flat["turn_idx"].tolist(),
            "roles": flat["role"].tolist(),
            "texts": flat["text"].tolist(),
            "tools": flat["tool"].tolist(),
            "ts_enc": codec.encode_timestamps(
                flat["_ts"].to_numpy(dtype=np.int64)
            ),
        }
        for m in metric_cols:
            row[f"{m}_gx"] = codec.encode_floats(
                flat[m].to_numpy(dtype=np.float64)
            )
        return pd.DataFrame([row])

    return chunks.groupBy("conv_bucket", "time_chunk").applyInPandas(
        merge, schema
    )
