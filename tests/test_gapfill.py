"""Gap-fill semantics: empty buckets reinstated with count=0/null
metrics (A6), LOCF + linear interpolation only as added columns
(fx_gapfill, FIXTURES.md §2)."""

from __future__ import annotations

import pytest

from rollup_engine.deltas import with_deltas
from rollup_engine.gapfill import gapfill, spine
from rollup_engine.rollup import rollup

from .conftest import make_transcript, ts_seq


def _rollup_with_gaps(spark):
    # deltas at :00 (two), :03 (one) → minute gaps at :01, :02
    rows = []
    for conv, base, deltas in (
        ("a", "2024-01-01T00:00:01", [100, 200]),
        ("b", "2024-01-01T00:03:01", [400]),
    ):
        times = ts_seq(base, deltas)
        rows += [(conv, i, "user", "x", "", t) for i, t in enumerate(times)]
    return rollup(with_deltas(make_transcript(spark, rows)), "minute")


def test_spine_completes_range(spark):
    sp = spine(_rollup_with_gaps(spark), "minute").collect()
    got = sorted(r.bucket_start.isoformat() for r in sp)
    assert got == [
        "2024-01-01T00:00:00",
        "2024-01-01T00:01:00",
        "2024-01-01T00:02:00",
        "2024-01-01T00:03:00",
    ]


def test_gap_rows_zero_count_null_metrics(spark):
    out = {
        r.bucket_start.minute: r
        for r in gapfill(_rollup_with_gaps(spark), "minute").collect()
    }
    assert out[1].is_gap and out[2].is_gap
    assert out[1].turn_count == 0
    assert out[1].lat_avg_ms is None  # never fabricate metrics
    assert not out[0].is_gap and out[0].turn_count == 2


def test_locf_and_interp(spark):
    out = {
        r.bucket_start.minute: r
        for r in gapfill(
            _rollup_with_gaps(spark),
            "minute",
            locf_cols=["lat_avg_ms"],
            interp_cols=["lat_avg_ms"],
        ).collect()
    }
    # observed: minute0 avg=150, minute3 avg=400
    assert out[0].lat_avg_ms_locf == 150
    assert out[1].lat_avg_ms_locf == 150  # carried forward
    assert out[2].lat_avg_ms_locf == 150
    assert out[3].lat_avg_ms_locf == 400
    # linear interpolation between (t0,150) and (t3,400)
    assert out[1].lat_avg_ms_interp == pytest.approx(150 + (400 - 150) / 3)
    assert out[2].lat_avg_ms_interp == pytest.approx(150 + 2 * (400 - 150) / 3)
    assert out[0].lat_avg_ms_interp == 150.0  # observed rows unchanged
    assert out[3].lat_avg_ms_interp == 400.0


def test_gapfill_empty_input(spark):
    df = _rollup_with_gaps(spark).where("1=0")
    assert gapfill(df, "minute").count() == 0