"""All-JVM histogram rollup: parity with the oracle-verified SQL rollup,
cascade exactness, and the t-digest overflow contract."""

from __future__ import annotations

import pandas as pd
import pytest

from rollup_engine.deltas import with_deltas
from rollup_engine.hist_rollup import hist_cascade, hist_rollup
from rollup_engine.transcripts import from_events

METRICS = [
    "turn_count", "lat_min_ms", "lat_max_ms", "lat_avg_ms",
    "lat_p50_ms", "lat_p90_ms", "lat_p99_ms", "lat_sum_ms",
    "err4xx_rate", "err5xx_rate",
]


def _deltas(spark):
    return with_deltas(from_events(spark, "/root/testdata/sf0.001"))


def _pdf(df, cols=METRICS):
    return df.toPandas().set_index("bucket_start").sort_index()[cols]


def test_hist_rollup_matches_sql(spark):
    from rollup_engine.rollup import rollup

    d = _deltas(spark)
    pd.testing.assert_frame_equal(
        _pdf(rollup(d, "minute")), _pdf(hist_rollup(d, "minute")), check_dtype=False
    )


def test_hist_cascade_exact(spark):
    d = _deltas(spark)
    minute = hist_rollup(d, "minute")
    pd.testing.assert_frame_equal(
        _pdf(hist_rollup(d, "hour")), _pdf(hist_cascade(minute, "hour")),
        check_dtype=False,
    )
    pd.testing.assert_frame_equal(
        _pdf(hist_rollup(d, "day")),
        _pdf(hist_cascade(hist_cascade(minute, "hour"), "day")),
        check_dtype=False,
    )


def test_overflow_builds_tdigest(spark):
    """max_bins=4 forces every bucket with >4 distinct deltas onto the
    t-digest path; percentiles stay exact (computed from rows), hist is
    null, tdigest present."""
    d = _deltas(spark)
    exact = hist_rollup(d, "day")
    tiny = hist_rollup(d, "day", max_bins=4)
    pd.testing.assert_frame_equal(_pdf(exact), _pdf(tiny), check_dtype=False)
    big = tiny.where("turn_count > 4").collect()
    assert big, "expected at least one overflowing day bucket"
    for r in big:
        assert r.hist is None
        assert r.tdigest is not None


def test_mixed_cascade_approximate(spark):
    """Cascading a tier where some buckets degraded to t-digest still
    produces a full result; counters exact, percentiles within t-digest
    tolerance."""
    d = _deltas(spark)
    hour_tiny = hist_rollup(d, "hour", max_bins=4)
    day_from_mixed = hist_cascade(hour_tiny, "day")
    day_exact = hist_rollup(d, "day")
    a = _pdf(day_from_mixed, ["turn_count", "lat_min_ms", "lat_max_ms",
                              "lat_sum_ms", "err4xx_rate", "err5xx_rate"])
    b = _pdf(day_exact, a.columns.tolist())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    pa = _pdf(day_from_mixed, ["lat_p50_ms"]).join(
        _pdf(day_exact, ["lat_p50_ms"]), rsuffix="_exact"
    )
    rel = (
        (pa["lat_p50_ms"] - pa["lat_p50_ms_exact"]).abs()
        / pa["lat_p50_ms_exact"].clip(lower=1)
    )
    assert (rel < 0.05).all(), pa[rel >= 0.05]


def test_pinned_vector_hist(spark):
    """[1,10,100] through hist_rollup: avg=37, p50=10, p90=p99=100."""
    from .conftest import make_transcript, ts_seq

    times = ts_seq("2024-01-01T00:00:00", [1, 10, 100])
    rows = [("c", i, "user", "t", "", t) for i, t in enumerate(times)]
    d = with_deltas(make_transcript(spark, rows))
    r = hist_rollup(d, "day").collect()[0]
    assert (r.turn_count, r.lat_avg_ms, r.lat_p50_ms, r.lat_p90_ms, r.lat_p99_ms) == (
        3, 37, 10, 100, 100,
    )
    assert [(e.v, e.c) for e in r.hist] == [(1, 1), (10, 1), (100, 1)]