"""Real-time continuous aggregate: materialized cold tier ∪ raw hot tail.

The TimescaleDB real-time-continuous-aggregate analog for this engine
(the reference has no equivalent — its closest mode is the cron-style
re-read loop, /root/reference/README.md:126-147, which recomputes the
WHOLE window every scrape).  A query over the full time range reads:

- the **cold side**: the materialized rollup tier (parquet, written by
  ``materialize_tier`` partitioned on the bucket's calendar day), with
  ``bucket_start < split`` — partition pruning means only manifest
  work, no data scan, for the pruned days;
- the **hot side**: raw turns with ``ts >= split`` (a pushed-down
  parquet range filter — at 10^12 turns this is minutes of data, not
  the table), rolled up on the fly through the same all-JVM hist
  engine, seeded with each conversation's last pre-split turn so
  cross-boundary inter-turn deltas are identical to a full recompute.

``split`` must lie on a tier-bucket boundary; then a delta is assigned
to the bucket of its *later* turn, so every hot delta lands in a bucket
``>= split`` and every cold delta in one ``< split`` — the union is
exactly the full rollup (driver-gated: ``realtime_rollup`` vs the
direct minute-tier SQL oracle).

The boundary seed is the same per-conversation state the incremental
refresher checkpoints (``incremental.py`` keeps ``(conv_id, last_ts,
last_turn_idx)`` per snapshot); production hands it in as
``conv_state``.  When omitted, it is derived from the raw table with a
``ts < split`` scan — correct but cold-scan-sized, so only for tests.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .deltas import with_deltas
from .hist_rollup import hist_rollup
from .schema import TIERS

# Calendar-day partition column of a materialized tier table.
DAY_COL = "bucket_day"


def materialize_tier(rollup_df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a (hist-)rollup tier as a day-partitioned parquet table.

    Day partitioning keeps file counts sane at every tier (1440 minute
    rows/day share one partition) while letting the cold-side
    ``bucket_start < split`` predicate prune whole days at planning
    time.  The ``hist`` state column rides along so later cascades /
    merges re-aggregate from the materialized tier without raw data.
    """
    (
        rollup_df.withColumn(DAY_COL, F.to_date("bucket_start"))
        .repartition(DAY_COL)
        .write.mode(mode)
        .partitionBy(DAY_COL)
        .parquet(path)
    )


def conv_state_at(raw_turns: DataFrame, split_ts) -> DataFrame:
    """Each conversation's last turn strictly before ``split_ts`` —
    the boundary seed for cross-split deltas.  Test-path helper; in
    production this relation comes from the incremental checkpoint."""
    cols = raw_turns.columns
    return (
        raw_turns.where(F.col("ts") < F.lit(split_ts))
        .groupBy("conv_id")
        .agg(
            F.max_by(F.struct(*[c for c in cols if c != "conv_id"]), "turn_idx").alias(
                "_s"
            )
        )
        .select("conv_id", "_s.*")
        .select(*cols)
    )


def realtime_rollup(
    spark: SparkSession,
    materialized_path: str,
    raw_turns: DataFrame,
    tier: str,
    split_ts,
    conv_state: DataFrame | None = None,
) -> DataFrame:
    """Materialized tier for buckets < ``split_ts`` ∪ on-the-fly rollup
    of raw turns ≥ ``split_ts``.  Returns the full tier relation, bit-
    identical to a from-scratch rollup of all raw data."""
    t = TIERS[tier]
    if isinstance(split_ts, str):
        split_ts = _dt.datetime.fromisoformat(split_ts)
    # Fail fast on a misaligned split: a bucket straddling it would be
    # half-materialized, half-recomputed, and double-counted.  One tiny
    # driver-local check on the literal, zero Spark jobs.
    aligned = {
        "minute": lambda d: d.second == 0 and d.microsecond == 0,
        "hour": lambda d: d.minute == d.second == d.microsecond == 0,
        "day": lambda d: d.hour == d.minute == d.second == d.microsecond == 0,
        # calendar tiers (round-6, r5 ADVICE): week snaps to Monday
        # midnight, month to the 1st — date_trunc semantics
        "week": lambda d: d.weekday() == 0
        and d.hour == d.minute == d.second == d.microsecond == 0,
        "month": lambda d: d.day == 1
        and d.hour == d.minute == d.second == d.microsecond == 0,
    }
    if tier not in aligned:
        # never let an unknown tier silently skip the straddle guard
        raise ValueError(
            f"realtime_rollup has no split-alignment rule for tier "
            f"{tier!r}; supported: {sorted(aligned)}"
        )
    if not aligned[tier](split_ts):
        raise ValueError(f"split_ts {split_ts} is not a {tier}-bucket boundary")

    # Two predicates on the cold scan: the DAY_COL one is on the
    # partition column, so Catalyst turns it into a PartitionFilter
    # (days past the split are pruned at planning time — no data, no
    # footer reads); the bucket_start one row-filters inside the single
    # boundary day.  Filtering bucket_start alone would read every
    # partition's data just to drop it.
    cold = (
        spark.read.parquet(materialized_path)
        .where(
            (F.col(DAY_COL) <= F.lit(split_ts.date()))
            & (F.col("bucket_start") < F.lit(split_ts))
        )
        .drop(DAY_COL)
    )

    if conv_state is None:
        conv_state = conv_state_at(raw_turns, split_ts)
    tail = raw_turns.where(F.col("ts") >= F.lit(split_ts))
    hot_turns = tail.unionByName(conv_state.select(*tail.columns))
    # The seed turn's own delta belongs to a pre-split bucket the cold
    # side already covers — drop it after bucketing.
    hot = hist_rollup(with_deltas(hot_turns), tier).where(
        F.col("bucket_start") >= F.lit(split_ts)
    )
    return cold.select(*hot.columns).unionByName(hot)
