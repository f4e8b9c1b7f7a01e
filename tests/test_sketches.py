"""Sketch unit tests + sketch-rollup / cascade parity against the
pure-SQL rollup path (which itself is oracle-verified)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rollup_engine import sketches


def nearest_rank(vals, q):
    s = sorted(vals)
    return s[max(1, int(np.ceil(q * len(s) - 1e-9))) - 1]


def test_hist_pinned_vector():
    """[1,10,100] → p50=10, p90=100, p99=100
    (/root/reference/src/analyzer/mod.rs:90-115)."""
    sk = sketches.build(np.array([1, 10, 100]))
    assert sketches.kind(sk) == "hist"
    assert sketches.quantiles(sk, [0.5, 0.9, 0.99]) == [10.0, 100.0, 100.0]


def test_tdigest_small_n_exact():
    """t-digest with singleton clusters reproduces nearest-rank exactly
    (the reference's exact-≤10k contract at small n)."""
    sk = sketches.tdigest_build(np.array([1, 10, 100], dtype=float))
    assert sketches.kind(sk) == "tdigest"
    assert sketches.quantiles(sk, [0.5, 0.9, 0.99]) == [10.0, 100.0, 100.0]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=500),
    st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99, 1.0]),
)
def test_hist_matches_nearest_rank(vals, q):
    sk = sketches.hist_build(np.array(vals))
    assert sketches.quantile(sk, q) == nearest_rank(vals, q)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=200),
        min_size=2,
        max_size=6,
    )
)
def test_hist_merge_equals_build_on_union(chunks):
    merged = sketches.merge([sketches.hist_build(np.array(c)) for c in chunks])
    direct = sketches.hist_build(np.concatenate([np.array(c) for c in chunks]))
    assert merged == direct  # byte-identical: merge is lossless


def test_merge_order_invariance():
    a = sketches.hist_build(np.array([1, 2, 3]))
    b = sketches.hist_build(np.array([3, 4]))
    c = sketches.hist_build(np.array([10]))
    m1 = sketches.merge([a, b, c])
    m2 = sketches.merge([c, a, b])
    assert m1 == m2


def test_tdigest_accuracy_large():
    rng = np.random.RandomState(42)
    vals = rng.lognormal(3, 1, size=200_000)
    sk = sketches.tdigest_build(vals)
    assert sketches._n(sk) <= 2 * sketches.TDIGEST_DELTA
    for q in (0.5, 0.9, 0.99):
        est = sketches.quantile(sk, q)
        true = np.quantile(vals, q)
        assert abs(est - true) / true < 0.02, (q, est, true)


def test_hist_degrades_to_tdigest():
    vals = np.arange(sketches.HIST_MAX_BINS + 5)
    sk = sketches.hist_build(vals)
    assert sketches.kind(sk) == "tdigest"


def test_mixed_merge_promotes():
    h = sketches.hist_build(np.array([1, 2, 3]))
    t = sketches.tdigest_build(np.array([4.0, 5.0]))
    m = sketches.merge([h, t])
    assert sketches.kind(m) == "tdigest"
    assert sketches.total_weight(m) == 5


def test_merge_empty():
    assert sketches.merge([]) is None
    assert sketches.merge([None]) is None


# ------------------------------------------------- Spark-side parity


def _deltas(spark):
    from rollup_engine.deltas import with_deltas
    from rollup_engine.transcripts import from_events

    return with_deltas(from_events(spark, "/root/testdata/sf0.001"))


def _cmp_frames(a, b, key="bucket_start"):
    pa = a.drop("sketch", "tier").toPandas().set_index(key).sort_index()
    pb = b.drop("sketch", "tier").toPandas().set_index(key).sort_index()
    import pandas as pd

    pd.testing.assert_frame_equal(
        pa[sorted(pa.columns)], pb[sorted(pb.columns)], check_dtype=False
    )


def test_sketch_rollup_matches_sql_rollup(spark):
    from rollup_engine.rollup import rollup
    from rollup_engine.sketch_rollup import sketch_rollup

    d = _deltas(spark)
    sql_r = rollup(d, "minute")
    sk_r = sketch_rollup(d, "minute")
    pa = (
        sql_r.toPandas()
        .set_index("bucket_start")
        .sort_index()[
            ["turn_count", "lat_min_ms", "lat_max_ms", "lat_avg_ms",
             "lat_p50_ms", "lat_p90_ms", "lat_p99_ms", "lat_sum_ms",
             "err4xx_rate", "err5xx_rate"]
        ]
    )
    pb = (
        sk_r.toPandas()
        .set_index("bucket_start")
        .sort_index()[pa.columns.tolist()]
    )
    import pandas as pd

    pd.testing.assert_frame_equal(pa, pb, check_dtype=False)


def test_salted_rollup_identical(spark):
    from rollup_engine.sketch_rollup import sketch_rollup

    d = _deltas(spark)
    plain = sketch_rollup(d, "hour")
    salted = sketch_rollup(d, "hour", salt_buckets=4)
    _cmp_frames(plain, salted)


def test_cascade_hour_equals_direct(spark):
    """minute→hour sketch merge == direct hour rollup, bit-exact
    (histogram sketches are lossless)."""
    from rollup_engine.retention import cascade
    from rollup_engine.sketch_rollup import sketch_rollup

    d = _deltas(spark)
    minute = sketch_rollup(d, "minute")
    hour_direct = sketch_rollup(d, "hour")
    hour_cascaded = cascade(minute, "hour")
    _cmp_frames(hour_direct, hour_cascaded)


def test_cascade_day_from_hour(spark):
    from rollup_engine.retention import cascade
    from rollup_engine.sketch_rollup import sketch_rollup

    d = _deltas(spark)
    day_direct = sketch_rollup(d, "day")
    day_cascaded = cascade(cascade(sketch_rollup(d, "minute"), "hour"), "day")
    _cmp_frames(day_direct, day_cascaded)


def test_retention_expiry(spark):
    import datetime as dt

    from rollup_engine.retention import expire
    from rollup_engine.sketch_rollup import sketch_rollup

    d = _deltas(spark)
    minute = sketch_rollup(d, "minute")
    # events span Jan 2024; "now" = Feb 8 → 7-day minute horizon keeps
    # only buckets >= Feb 1
    kept = expire(minute, "minute", dt.datetime(2024, 2, 8))
    assert kept.count() == minute.where("bucket_start >= '2024-02-01'").count()


def test_stitch_tiers_bands_disjoint_and_edge_snapped(spark):
    """stitch_tiers with an UNALIGNED now: the minute/hour edge must
    snap DOWN to an hour boundary (no hour bucket straddles it), bands
    must be disjoint, and the union must equal the per-band counts."""
    import datetime as dt

    from pyspark.sql import functions as F

    from rollup_engine.retention import stitch_tiers
    from rollup_engine.rollup import rollup

    d = _deltas(spark)
    tiers = {
        "minute": rollup(d, "minute"),
        "hour": rollup(d, "hour"),
        "day": rollup(d, "day"),
    }
    now = dt.datetime(2024, 1, 20, 13, 37, 42)  # mid-hour, mid-minute
    out = stitch_tiers(tiers, now).cache()
    edge = dt.datetime(2024, 1, 13, 13, 0, 0)  # trunc('hour', now-7d)
    mins = out.where("tier = 'minute'")
    hours = out.where("tier = 'hour'")
    assert mins.where(F.col("bucket_start") < F.lit(edge)).count() == 0
    assert hours.where(F.col("bucket_start") >= F.lit(edge)).count() == 0
    # exact band contents: every retained source bucket appears
    assert mins.count() == tiers["minute"].where(
        F.col("bucket_start") >= F.lit(edge)
    ).count()
    assert hours.count() == tiers["hour"].where(
        F.col("bucket_start") < F.lit(edge)
    ).count()
    # Jan-only data, 90-day hour horizon → the day band is empty
    assert out.where("tier = 'day'").count() == 0
    out.unpersist()

def test_select_tier_boundaries():
    """Router boundaries: exactly-fits stays fine-grained; one bucket
    over the budget falls to the next tier; nothing fits → coarsest."""
    import datetime as dt

    from rollup_engine.retention import select_tier

    t0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    assert select_tier(t0, t0 + day, 1440) == "minute"  # exactly fits
    assert select_tier(t0, t0 + day, 1439) == "hour"
    assert select_tier(t0, t0 + 30 * day, 800) == "hour"  # 720 ≤ 800
    assert select_tier(t0, t0 + 30 * day, 100) == "day"
    # round-6: week/month route too; nothing fits → coarsest AVAILABLE
    assert select_tier(t0, t0 + 3650 * day, 200) == "month"  # 121.6 ≤ 200
    assert select_tier(t0, t0 + 3650 * day, 10) == "month"  # fallback
    assert (
        select_tier(t0, t0 + 3650 * day, 10, available=["minute", "hour", "day"])
        == "day"
    )
    # a tiers dict missing 'day' must route inside what exists, not
    # KeyError (the r5 ADVICE finding)
    assert (
        select_tier(t0, t0 + 30 * day, 100, available=["minute", "hour"])
        == "hour"
    )
    assert select_tier("2024-01-01", "2024-01-02", 1440) == "minute"
