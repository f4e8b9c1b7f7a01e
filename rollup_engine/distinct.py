"""Mergeable distinct-count tiers: exact partial-dedup pairs and a
Datasketches HLL sketch twin.

The "active conversations per hour/day over 10^12 turns" question is
the one metric the plain rollup tiers CANNOT answer by merging counts:
distinct is not count-summable.  Two scalable states are:

- **Exact pairs** (``distinct_pairs``): the finest tier stores the
  DISTINCT (bucket, key) relation — the map-side combine collapses a
  key's many turns in a bucket to ONE row before any shuffle, so the
  shuffled volume is bounded by (#buckets × #active keys), not by raw
  rows.  Any coarser tier is then an exact ``count_distinct`` re-group
  of the pairs (``distinct_rollup``) — the same partial-dedup shape
  Catalyst itself plans for COUNT(DISTINCT), made PERSISTENT so the
  day tier never re-reads raw data.  100 TB of turns with 10M active
  conversations/day compresses to ≤ 10M × buckets rows of state.

- **HLL sketches** (``hll_tier`` / ``hll_cascade`` /
  ``hll_estimate``): per-bucket Apache Datasketches HLL state via the
  built-in ``hll_sketch_agg`` / ``hll_union_agg`` JVM aggregates —
  O(2^lg_k) bytes per bucket REGARDLESS of cardinality, associatively
  mergeable (minute → hour → day unions, same shape as the metric
  cascade), with the standard ~1.04/√(2^lg_k) relative error (~1.6%
  at the lg_k=12 default).  This is the state to keep when even the
  distinct pair relation is too large (e.g. distinct USERS over a
  year: pairs grow with cardinality, sketches don't).

Exactness contract: the pairs path is oracle-gated
(``distinct_day_cascade`` vs DuckDB ``COUNT(DISTINCT ...)``); the HLL
path is an engine twin pinned by pytest against the exact path within
its published error bound (a DuckDB oracle cannot hash-match a
different HLL implementation), plus merge-associativity and
determinism pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import TIERS

# Datasketches default: 2^12 registers → ~1.6% standard error.
DEFAULT_LG_K = 12


def _bucket(ts_col: str, tier: str) -> F.Column:
    return F.date_trunc(TIERS[tier].duckdb_trunc, F.col(ts_col))


def distinct_pairs(
    df: DataFrame,
    tier: str = "minute",
    key_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The exact mergeable state: the DISTINCT (bucket_start, key)
    relation at the finest tier.  One exchange; the map-side partial
    dedup collapses a key's turns within a bucket before the shuffle.
    """
    return (
        df.select(_bucket(ts_col, tier).alias("bucket_start"), key_col)
        .where(F.col(key_col).isNotNull())
        .distinct()
    )


def distinct_rollup(
    pairs: DataFrame, to_tier: str, key_col: str = "conv_id"
) -> DataFrame:
    """Exact distinct count per coarser bucket from a finer pair
    relation — never re-reads raw data.  Catalyst plans this as the
    two-phase partial-dedup aggregate: re-truncate, dedup (map-side
    combinable), count."""
    return (
        pairs.select(
            _bucket("bucket_start", to_tier).alias("bucket_start"), key_col
        )
        .groupBy("bucket_start")
        .agg(F.count_distinct(F.col(key_col)).alias("distinct_keys"))
    )


def hll_tier(
    df: DataFrame,
    tier: str = "minute",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-bucket HLL sketch state (binary column) — O(2^lg_k) bytes
    per bucket regardless of cardinality; JVM-side, map-side
    combinable."""
    return (
        df.where(F.col(key_col).isNotNull())
        .groupBy(_bucket(ts_col, tier).alias("bucket_start"))
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("key_hll"))
    )


def hll_cascade(tier_df: DataFrame, to_tier: str) -> DataFrame:
    """minute → hour → day by sketch UNION — the distinct-count
    analog of the metric cascade: associative, commutative, never
    touches raw data."""
    return (
        tier_df.select(
            _bucket("bucket_start", to_tier).alias("bucket_start"), "key_hll"
        )
        .groupBy("bucket_start")
        .agg(F.hll_union_agg(F.col("key_hll")).alias("key_hll"))
    )


def hll_estimate(tier_df: DataFrame) -> DataFrame:
    """Finalize: estimated distinct count per bucket."""
    return tier_df.select(
        "bucket_start",
        F.hll_sketch_estimate(F.col("key_hll")).alias("distinct_keys_est"),
    )


def sliding_distinct(
    pairs: DataFrame,
    length: str = "5 minutes",
    hop: str = "1 minute",
    key_col: str = "conv_id",
) -> DataFrame:
    """Distinct keys per HOPPING window from the finest-tier pair
    state: each deduped (bucket, key) row expands into its length/hop
    windows (native ``F.window`` Expand — stream-portable), then an
    exact ``count_distinct`` per window.  The "active conversations
    over the last 5 minutes, refreshed every minute" view, reading
    (#buckets × #active keys) state rows instead of raw turns.  Note
    a key active in several buckets of one window is counted once —
    the re-dedup across buckets is exactly what plain count-summing
    cannot do and the pair state can.
    """
    return (
        pairs.groupBy(
            F.window(F.col("bucket_start"), length, hop).alias("_w")
        )
        .agg(F.count_distinct(F.col(key_col)).alias("distinct_keys"))
        .select(
            F.col("_w.start").alias("bucket_start"), "distinct_keys"
        )
    )
