"""Timeseries utility operators: M4 downsampling and sessionization.

- ``m4_downsample`` — the M4 aggregation (Jugel et al., VLDB 2014):
  per (series, time-bucket) keep min, max, first and last values — the
  lossless reduction for line-chart rendering (any pixel column's
  extremes and endpoints survive).  Pure groupBy with min/max/min_by/
  max_by: one exchange, map-side combinable, codegen throughout.
- ``sessionize`` — inactivity-gap session assignment: a new session
  starts when the gap to the key's previous event exceeds
  ``gap_seconds``.  lag + cumulative-sum-of-flags window per key: one
  exchange, one sort, no join; session ids are deterministic
  ``(key, session_seq)`` pairs.  This is the batch twin of Structured
  Streaming's ``session_window`` (which covers the streaming case).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    bucket: str = "hour",
    by: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """(by…, bucket_start, v_min, v_max, v_first, v_last, n) per bucket.

    first/last are value-at-earliest/latest timestamp via min_by/max_by
    on a (ts, tiebreak) struct — deterministic when ``order_tiebreak``
    (a unique column) is given, else ties resolve by value order.
    """
    key = F.struct(
        F.col(ts_col),
        (F.col(order_tiebreak) if order_tiebreak else F.col(value_col)),
    )
    return (
        df.groupBy(
            *list(by), F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start")
        )
        .agg(
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
            F.min_by(F.col(value_col), key).alias("v_first"),
            F.max_by(F.col(value_col), key).alias("v_last"),
            F.count(value_col).alias("n"),
        )
    )


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    by: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Adds ``session_seq`` (1-based per key) and ``is_session_start``.

    A row starts a new session when it is the key's first event or the
    gap to the previous event exceeds ``gap_seconds`` (strictly).  The
    running sum of start flags over the ordered window IS the session
    sequence — one exchange on the key, no self-join.
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(*list(by)).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(prev.cast("timestamp"))
    )
    start = (prev.isNull() | (gap_us > int(gap_seconds) * 1_000_000)).cast("int")
    running = (
        Window.partitionBy(*list(by))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("is_session_start", start).withColumn(
        "session_seq", F.sum("is_session_start").over(running).cast("long")
    )


def session_stats(
    df: DataFrame,
    gap_seconds: int = 1800,
    by: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """One row per session: event count, start/end, duration seconds."""
    s = sessionize(df, gap_seconds, by, ts_col, order_tiebreak)
    return (
        s.groupBy(*list(by), "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .withColumn(
            "duration_sec",
            (
                F.unix_micros(F.col("session_end").cast("timestamp"))
                - F.unix_micros(F.col("session_start").cast("timestamp"))
            )
            / F.lit(1_000_000.0),
        )
    )
