"""Deterministic synthetic transcript generator.

Ports the *shape* of the reference's random-log generator
(/root/reference/src/test/generate_random_log.py: uniform response times,
~1/1000 error status, ~1% missing responses, ~1/1000 damaged lines) into
a seeded, fully Spark-native generator — no driver-side loops, no
wall-clock: every pseudo-random draw is ``xxhash64(seed, conv, turn)``
so the table is reproducible cell-for-cell at any scale and any
parallelism.

Skew: conversation lengths follow a power-ish law with a configurable
set of "hot" conversations (fx_skew, FIXTURES.md §2) to exercise the
salting path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"  # fixed epoch — determinism, no Date.now


def _u(seed_col, lo: float, hi: float):
    """Uniform [lo, hi) from a hash column."""
    frac = (F.pmod(seed_col, F.lit(1_000_000_007)) / F.lit(1_000_000_007.0))
    return F.lit(lo) + frac * F.lit(hi - lo)


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    turns_per_conv: int = 50,
    hot_convs: int = 2,
    hot_factor: int = 50,
    seed: int = 42,
    max_delta_ms: int = 1200,
    error_rate: float = 0.001,
    missing_rate: float = 0.01,
    damaged_rate: float = 0.001,
    spread_minutes: int | None = None,
) -> DataFrame:
    """Build a transcript DataFrame.

    Deltas are uniform in (0, max_delta_ms] ms like the reference
    generator; ``ts`` is BASE_TS + conversation offset + cumulative sum
    of deltas (one window per conv — the same exchange the engine itself
    uses, so generation parallelizes with the data).
    """
    convs = spark.range(n_convs).select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
        F.when(F.col("id") < hot_convs, F.lit(turns_per_conv * hot_factor))
        .otherwise(
            (
                F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(turns_per_conv))
                + F.lit(max(1, turns_per_conv // 2))
            ).cast("int")
        )
        .alias("n_turns"),
        F.col("id").alias("conv_no"),
    )
    turns = convs.select(
        "conv_id",
        "conv_no",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(seed))
    h2 = F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(seed + 1))
    h3 = F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(seed + 2))
    h4 = F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(seed + 3))

    turns = turns.withColumn(
        "delta_gen_ms", F.ceil(_u(h, 0.0, float(max_delta_ms))).cast("long")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # conv start stagger: unbounded (one new conv per minute, long thin
    # buckets) or wrapped into a window of `spread_minutes` (many
    # concurrent conversations per bucket — the realistic fleet shape)
    stagger = (
        F.pmod(F.col("conv_no"), F.lit(spread_minutes))
        if spread_minutes
        else F.col("conv_no")
    )
    turns = turns.withColumn(
        "ts",
        F.timestamp_millis(
            F.unix_millis(F.to_timestamp(F.lit(BASE_TS)))
            + stagger * F.lit(60_000)
            + F.sum("delta_gen_ms").over(w)
        ),
    )
    role = F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    tool = (
        F.when(
            _u(h2, 0.0, 1.0) < F.lit(error_rate),
            F.when(h2 % 2 == 0, F.lit("error:4xx")).otherwise(F.lit("error:5xx")),
        )
        .when(_u(h3, 0.0, 1.0) < 0.2, F.lit("search"))
        .otherwise(F.lit(""))
    )
    text = F.concat(
        F.lit("turn "),
        F.col("turn_idx").cast("string"),
        F.lit(" of "),
        F.col("conv_id"),
        F.lit(" :: "),
        F.base64(F.substring(h.cast("string"), 1, 8)),
    )
    out = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        # damaged rows: null ts (the analog of unparseable lines)
        F.when(_u(h4, 0.0, 1.0) < F.lit(damaged_rate), F.lit(None)).otherwise(
            F.col("ts")
        ).alias("ts"),
    )
    # ~missing_rate of turns vanish entirely (missing responses analog)
    return out.where(
        _u(F.xxhash64("conv_id", "turn_idx", F.lit(seed + 4)), 0.0, 1.0)
        >= F.lit(missing_rate)
    )
