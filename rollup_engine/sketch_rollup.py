"""Sketch-carrying rollup — the scale path for continuous aggregates.

The built-in ``rollup.rollup()`` covers the pure-SQL tier; this module
produces the same metrics PLUS a mergeable quantile sketch per bucket so
higher tiers (hour, day) can be re-aggregated from lower tiers without
ever touching raw data again (retention.py) — the north star's
minute→hour→day cascade.

Plan shape (one shuffle over the delta stream, all Python stages
Arrow-vectorized):

    deltas → project (bucket, delta, err flags)        [JVM]
           → repartition(bucket [, salt])              [the one shuffle]
           → sortWithinPartitions(bucket)              [JVM]
           → mapInPandas streaming builder             [Arrow batches]
           → (salted only) merge partials per bucket   [tiny]

The builder iterates a partition's Arrow batches in bucket order and
emits one finished row per bucket (buckets never straddle partitions
because of the repartition; they may straddle batches, so the builder
carries one open bucket of state — constant memory, the Spark analog of
the reference's streaming accumulator /root/reference/src/analyzer/
mod.rs:39-45).

Skew: a hot bucket (everyone talking at 12:00) overwhelms its single
partition.  ``salt_buckets=K`` splits each bucket into K shards
(pmod(xxhash64(conv_id), K)) and merges the K partial sketches per
bucket afterwards — sketch merge is associative, so results are
identical (pinned by tests/test_sketches.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import sketches
from .deltas import DELTA_COL
from .rollup import ERR4, ERR5, error_flag
from .schema import TIERS

SKETCH_ROLLUP_FIELDS = [
    T.StructField("bucket_start", T.TimestampType(), False),
    T.StructField("turn_count", T.LongType(), False),
    T.StructField("lat_min_ms", T.LongType(), True),
    T.StructField("lat_max_ms", T.LongType(), True),
    T.StructField("lat_avg_ms", T.LongType(), True),
    T.StructField("lat_p50_ms", T.LongType(), True),
    T.StructField("lat_p90_ms", T.LongType(), True),
    T.StructField("lat_p99_ms", T.LongType(), True),
    T.StructField("lat_sum_ms", T.LongType(), True),
    T.StructField("err4xx_cnt", T.LongType(), False),
    T.StructField("err5xx_cnt", T.LongType(), False),
    T.StructField("err4xx_rate", T.DoubleType(), True),
    T.StructField("err5xx_rate", T.DoubleType(), True),
    T.StructField("sketch", T.BinaryType(), True),
]
SKETCH_ROLLUP_SCHEMA = T.StructType(SKETCH_ROLLUP_FIELDS)

_QS = (0.5, 0.9, 0.99)


def _finish(bucket, vals: list[np.ndarray], e4: int, e5: int) -> dict:
    v = np.concatenate(vals) if vals else np.empty(0, dtype=np.int64)
    n = len(v)
    sk = sketches.build(v) if n else None
    p50, p90, p99 = (
        sketches.quantiles(sk, list(_QS)) if sk is not None else (None, None, None)
    )
    s = int(v.sum()) if n else None
    return {
        "bucket_start": bucket,
        "turn_count": n,
        "lat_min_ms": int(v.min()) if n else None,
        "lat_max_ms": int(v.max()) if n else None,
        "lat_avg_ms": (s // n) if n else None,  # floor; values non-negative
        "lat_p50_ms": None if p50 is None else int(p50),
        "lat_p90_ms": None if p90 is None else int(p90),
        "lat_p99_ms": None if p99 is None else int(p99),
        "lat_sum_ms": s,
        "err4xx_cnt": e4,
        "err5xx_cnt": e5,
        "err4xx_rate": round(e4 / n, 4) if n else None,
        "err5xx_rate": round(e5 / n, 4) if n else None,
        "sketch": sk,
    }


def _builder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Streaming per-partition rollup: input sorted by bucket_start."""
    cur_bucket = None
    vals: list[np.ndarray] = []
    e4 = e5 = 0
    out: list[dict] = []
    for pdf in batches:
        if pdf.empty:
            continue
        b = pdf["bucket_start"].to_numpy()
        d = pdf["delta_ms"].to_numpy(dtype=np.int64)
        f4 = pdf["e4"].to_numpy(dtype=np.int64)
        f5 = pdf["e5"].to_numpy(dtype=np.int64)
        # boundaries of equal-bucket runs inside this (sorted) batch
        starts = np.flatnonzero(np.concatenate(([True], b[1:] != b[:-1])))
        ends = np.append(starts[1:], len(b))
        for s, e in zip(starts, ends):
            bucket = b[s]
            if cur_bucket is not None and bucket != cur_bucket:
                out.append(_finish(cur_bucket, vals, e4, e5))
                vals, e4, e5 = [], 0, 0
            cur_bucket = bucket
            vals.append(d[s:e])
            e4 += int(f4[s:e].sum())
            e5 += int(f5[s:e].sum())
        if len(out) >= 512:
            yield pd.DataFrame(out)
            out = []
    if cur_bucket is not None:
        out.append(_finish(cur_bucket, vals, e4, e5))
    if out:
        yield pd.DataFrame(out)


def sketch_rollup(
    deltas: DataFrame,
    tier: str = "minute",
    salt_buckets: int | None = None,
    delta_col: str = DELTA_COL,
) -> DataFrame:
    """Per-tier rollup carrying a mergeable sketch per bucket."""
    t = TIERS[tier]
    proj = deltas.select(
        F.date_trunc(t.duckdb_trunc, F.col("ts")).alias("bucket_start"),
        F.col(delta_col).alias("delta_ms"),
        error_flag(ERR4).cast("long").alias("e4"),
        error_flag(ERR5).cast("long").alias("e5"),
        *(
            [F.pmod(F.xxhash64("conv_id"), F.lit(salt_buckets)).alias("_salt")]
            if salt_buckets
            else []
        ),
    )
    part_keys = ["bucket_start"] + (["_salt"] if salt_buckets else [])
    shards = (
        proj.repartition(*[F.col(k) for k in part_keys])
        .sortWithinPartitions("bucket_start")
        .drop(*(["_salt"] if salt_buckets else []))
        .mapInPandas(_builder, SKETCH_ROLLUP_SCHEMA)
    )
    if salt_buckets:
        from .retention import merge_rollup_rows

        shards = merge_rollup_rows(shards, F.col("bucket_start"))
    return shards.withColumn("tier", F.lit(tier)).select(
        "tier", *[f.name for f in SKETCH_ROLLUP_FIELDS]
    )