"""As-of (point-in-time) join and counter-rate — timeseries classics.

The reference's only join is its request/response pair matcher, which
SURVEY.md §2.3 analyzes as a 1:1 as-of pattern; this module provides the
GENERAL operator: for every left row, attach the most recent right row
at or before its timestamp, per key (configs active at event time,
latest deploy marker, last heartbeat, point-in-time feature joins).

Spark-first shape — NO join node at all: tag and union the two inputs,
one hash exchange on the key, one ordered window, and
``last(struct(payload), ignorenulls=True)`` carries the latest right
row forward onto the left rows as ONE atomic struct (the same LOCF
kernel as gapfill.py, but struct-carried so a NULL field in the matched
row is never backfilled from an older row).  Cost is a
single shuffle of |L|+|R| rows regardless of match fan-out — the
classic sort-merge as-of without the merge join's range-condition
explosion (a naive ``left.ts >= right.ts`` theta-join is O(|L|·|R|)
before per-key pruning; this is O((|L|+|R|) log) and AQE-skew-safe).

Direction: ``backward`` (inclusive, the DuckDB/pandas ``ASOF JOIN``
default) or ``forward`` (round-5: earliest right row at or after
left.ts — the same kernel with the scan reversed); both driver-gated
against DuckDB's native ASOF JOIN with the matching inequality.

``counter_increase`` is the PromQL-style ``increase()`` kernel: per-key
deltas of a monotonic counter with reset detection (a decrease means
the counter restarted, so the post-reset value IS the increase),
expressed as a lag window — one exchange, codegen throughout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    right_tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join, ``backward`` (default) or ``forward``.

    Every column of ``right`` other than the keys and ``ts_col`` is
    carried onto each left row from the LATEST right row with
    ``right.ts ≤ left.ts`` (backward) or the EARLIEST right row with
    ``right.ts ≥ left.ts`` (forward — "next deploy after the alert",
    "next response after the request") in the same ``by`` group (NULLs
    when no such row); the matched right timestamp arrives as
    ``{ts_col}_asof``.  Forward is the same union+window kernel with
    the scan direction reversed — still no join node, one shuffle.

    ``right_tiebreak``: column ordering right rows that share an exact
    (key, ts) — the greatest wins, deterministically.  Without it, give
    the operator a right side that is unique per (key, ts) (pre-
    aggregate) or accept partition-order nondeterminism among ties.

    ``tolerance_seconds``: matches older than this are nulled out
    (pandas ``merge_asof(tolerance=...)`` semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by)
    carry = [c for c in right.columns if c not in by and c != ts_col]
    overlap = set(carry) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns collide with left: {sorted(overlap)} "
            "(alias them before joining)"
        )
    matched_ts = f"{ts_col}_asof"

    # The whole right payload rides as ONE struct so the matched row stays
    # atomic: last(struct, ignorenulls) either carries the entire latest
    # right row (its internal NULLs included) or nothing.  Per-column
    # last(ignorenulls) would backfill a NULL field from an OLDER right
    # row, silently mixing columns from different matches.
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in carry]
        + [StructField(matched_ts, right.schema[ts_col].dataType)]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_asof"),
    )
    r_tag = right.select(
        *[
            F.col(c) if c in by + [ts_col] else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c) for c in carry], F.col(ts_col).alias(matched_ts)
        ).alias("_asof"),
    )
    # order: ts (reversed scan for forward), then right-before-left at
    # equal ts (INCLUSIVE both directions), then the caller's
    # deterministic tie-break among equal right rows (greatest wins in
    # either direction: ties order asc and last() carries the final one)
    ts_order = (
        F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    )
    order = [ts_order, F.col("_side").asc()]
    if right_tiebreak is not None:
        if right_tiebreak not in carry:
            raise ValueError(
                f"right_tiebreak {right_tiebreak!r} must be a right payload "
                "column (not a key or the timestamp)"
            )
        order.append(
            F.when(F.col("_side") == 0, F.col("_asof")[right_tiebreak])
            .asc_nulls_first()
        )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = l_tag.unionByName(r_tag)
    out = (
        both.withColumn("_asof", F.last("_asof", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col("_asof")[c].alias(c) for c in carry],
            F.col("_asof")[matched_ts].alias(matched_ts),
        )
    )
    if tolerance_seconds is not None:
        gap = (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(F.col(matched_ts).cast("timestamp"))
        )
        if direction == "forward":
            gap = -gap
        stale = F.col(matched_ts).isNull() | (
            gap > int(tolerance_seconds) * 1_000_000
        )
        out = out.withColumns(
            {
                c: F.when(stale, F.lit(None)).otherwise(F.col(c))
                for c in [*carry, matched_ts]
            }
        )
    return out


def counter_increase(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> Column:
    """PromQL ``increase()`` kernel as a window Column: per-key delta of
    a monotonic counter; a decrease means the counter reset, so the
    post-reset value itself is the increase.  First sample of a key
    contributes NULL (unknown history).  Attach with ``withColumn``."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(*list(by)).orderBy(*order)
    prev = F.lag(value_col).over(w)
    v = F.col(value_col)
    return F.when(prev.isNull(), F.lit(None)).when(v >= prev, v - prev).otherwise(v)
