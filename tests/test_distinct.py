"""Mergeable distinct-count tiers: the exact pair-relation cascade must
equal a direct COUNT(DISTINCT), and the HLL sketch twin must estimate
within its published error bound, merge associatively, and be
deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from rollup_engine.distinct import (
    DEFAULT_LG_K,
    distinct_pairs,
    distinct_rollup,
    hll_cascade,
    hll_estimate,
    hll_tier,
)
from rollup_engine.transcripts import from_events

SF = "/root/testdata/sf0.001"


def _exact(t, unit):
    return {
        r.bucket_start: r.n
        for r in t.groupBy(F.date_trunc(unit, F.col("ts")).alias("bucket_start"))
        .agg(F.countDistinct("conv_id").alias("n"))
        .collect()
    }


def test_pair_cascade_equals_direct(spark):
    t = from_events(spark, SF)
    pairs = distinct_pairs(t, "minute")
    for unit in ("hour", "day"):
        got = {
            r.bucket_start: r.distinct_keys
            for r in distinct_rollup(pairs, unit).collect()
        }
        assert got == _exact(t, unit)


def test_hll_estimate_within_bound(spark):
    """Relative error ≤ 3 × 1.04/√2^lg_k on every bucket (3σ of the
    published standard error; small buckets sit in the exact sparse
    mode anyway)."""
    t = from_events(spark, SF)
    est = {
        r.bucket_start: r.distinct_keys_est
        for r in hll_estimate(hll_tier(t, "hour")).collect()
    }
    exact = _exact(t, "hour")
    assert set(est) == set(exact)
    bound = 3 * 1.04 / (2**DEFAULT_LG_K) ** 0.5
    for b, n in exact.items():
        assert abs(est[b] - n) <= max(1, bound * n), (b, est[b], n)


def test_hll_cascade_associative_and_deterministic(spark):
    """minute→hour→day union equals minute→day union equals a direct
    day sketch, and repeated runs are identical (the sketch is a pure
    deterministic fold)."""
    t = from_events(spark, SF)
    minute = hll_tier(t, "minute")
    via_hour = hll_estimate(hll_cascade(hll_cascade(minute, "hour"), "day"))
    direct_union = hll_estimate(hll_cascade(minute, "day"))
    direct_sketch = hll_estimate(hll_tier(t, "day"))
    a = {r.bucket_start: r.distinct_keys_est for r in via_hour.collect()}
    b = {r.bucket_start: r.distinct_keys_est for r in direct_union.collect()}
    c = {r.bucket_start: r.distinct_keys_est for r in direct_sketch.collect()}
    assert a == b == c
    again = {r.bucket_start: r.distinct_keys_est for r in via_hour.collect()}
    assert again == a


def test_hll_state_is_bounded(spark):
    """The per-bucket sketch stays O(2^lg_k) bytes no matter the
    cardinality — the property that makes it the year-of-users state."""
    rows = [(i, f"u{i}") for i in range(50_000)]
    df = spark.createDataFrame(rows, "i long, user string").select(
        F.timestamp_micros(F.lit(0)).alias("ts"), "user"
    )
    sk = hll_tier(df, "day", key_col="user").select(
        F.octet_length("key_hll").alias("sz")
    ).collect()
    assert len(sk) == 1 and sk[0].sz <= 8 * (2**DEFAULT_LG_K)


def test_sliding_distinct_matches_direct(spark):
    """Hopping distinct from pair state == distinct over raw rows
    replicated into their windows (a key spanning several buckets of a
    window counts once)."""
    from rollup_engine.distinct import sliding_distinct

    t = from_events(spark, SF)
    pairs = distinct_pairs(t, "minute")
    got = {
        r.bucket_start: r.distinct_keys
        for r in sliding_distinct(pairs, "5 minutes", "1 minute").collect()
    }
    rep = (
        t.withColumn("_k", F.explode(F.array(*[F.lit(i) for i in range(5)])))
        .select(
            (
                F.timestamp_micros(
                    F.unix_micros(
                        F.date_trunc("minute", F.col("ts").cast("timestamp"))
                    )
                    - F.col("_k") * F.lit(60_000_000)
                )
            ).alias("bucket_start"),
            "conv_id",
        )
        .groupBy("bucket_start")
        .agg(F.countDistinct("conv_id").alias("n"))
    )
    want = {r.bucket_start: r.n for r in rep.collect()}
    # engine buckets are NTZ, reference casts through TIMESTAMP — align
    got = {str(k): v for k, v in got.items()}
    want = {str(k): v for k, v in want.items()}
    assert got == want
