"""Gap-fill: bucket spine + LOCF + linear interpolation.

The reference emits nothing for an empty run (count=0, timing/error
blocks omitted — /root/reference/src/analyzer/mod.rs:47-53,
/root/reference/src/render/terminal.rs:32-46).  A continuous-aggregate
table needs those buckets to EXIST (count=0, metrics null) and needs
continuous metric series fillable for downsampling.  Contract (A6 ×
gap-fill, SURVEY.md §7.4): gap rows get ``turn_count = 0`` and null raw
metrics — fills are added as NEW columns (``*_locf``, ``*_interp``);
gap-fill never fabricates counts.

Scale note: gap-fill operates on rollup tiers, whose row count is
bounded by the TIME RANGE, not the data volume (a year of minutes is
525 600 rows no matter how many raw turns fed them).  The ordered
windows here may therefore run single-partition without ever being the
bottleneck at 10^12 turns.  The spine is generated two-level (days →
intra-day buckets) so the explode parallelizes instead of producing one
giant array row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


_INTERVALS = {"minute": "1 minute", "hour": "1 hour", "day": "1 day"}
_PER_DAY = {"minute": 1440, "hour": 24, "day": 1}


def spine(rollup_df: DataFrame, tier: str) -> DataFrame:
    """Complete bucket spine [min(bucket), max(bucket)] at tier step.

    Two-level generation: one small array of days (driver-size), then a
    per-day sequence of buckets — the second explode fans out across
    partitions, so a decade of minutes never sits in one array row.
    """
    iv = _INTERVALS[tier]
    bounds = rollup_df.agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    days = bounds.select(
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("lo")),
                F.date_trunc("day", F.col("hi")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    if _PER_DAY[tier] == 1:
        buckets = days.select(F.col("day").alias("bucket_start"), "lo", "hi")
    else:
        buckets = days.repartition(F.col("day")).select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.col("day") + F.expr(f"INTERVAL 1 DAY") - F.expr(f"INTERVAL {iv}"),
                    F.expr(f"INTERVAL {iv}"),
                )
            ).alias("bucket_start"),
            "lo",
            "hi",
        )
    return buckets.where(
        (F.col("bucket_start") >= F.col("lo")) & (F.col("bucket_start") <= F.col("hi"))
    ).select("bucket_start")


def gapfill(
    rollup_df: DataFrame,
    tier: str,
    locf_cols: list[str] | None = None,
    interp_cols: list[str] | None = None,
) -> DataFrame:
    """Left-join the rollup onto its spine; mark gaps; add fills.

    - gap rows: ``turn_count = 0``, all metric columns null, ``is_gap``
      true (the reference's empty-result contract per bucket).
    - ``<c>_locf``: last observation carried forward.
    - ``<c>_interp``: linear interpolation between the neighboring
      non-null observations (LOCF at the trailing edge, back-fill never).
    """
    locf_cols = locf_cols or []
    interp_cols = interp_cols or []
    sp = spine(rollup_df, tier)
    joined = sp.join(rollup_df, "bucket_start", "left")
    filled = joined.withColumns(
        {
            "is_gap": F.col("turn_count").isNull(),
            "turn_count": F.coalesce(F.col("turn_count"), F.lit(0)),
            "tier": F.lit(tier),
        }
    )
    w_past = Window.orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_future = Window.orderBy("bucket_start").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    t = F.unix_timestamp("bucket_start")
    for c in locf_cols:
        filled = filled.withColumn(f"{c}_locf", F.last(c, ignorenulls=True).over(w_past))
    for c in interp_cols:
        obs_t = F.when(F.col(c).isNotNull(), t)
        prev_v = F.last(c, ignorenulls=True).over(w_past)
        prev_t = F.last(obs_t, ignorenulls=True).over(w_past)
        next_v = F.first(c, ignorenulls=True).over(w_future)
        next_t = F.first(obs_t, ignorenulls=True).over(w_future)
        interp = F.when(F.col(c).isNotNull(), F.col(c).cast("double")).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull(),
                prev_v
                + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t),
            ).otherwise(F.coalesce(prev_v, next_v).cast("double"))
        )
        filled = filled.withColumn(f"{c}_interp", interp)
    return filled
