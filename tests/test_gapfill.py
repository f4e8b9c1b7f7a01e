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


def test_cross_day_carry(spark):
    """LOCF and interp must carry across day-chunk boundaries: an
    observation on day 1 fills a gap spanning day 2 into day 3 (the
    chunked two-pass boundary relation at work)."""
    rows = []
    for conv, base, deltas in (
        ("a", "2024-01-01T23:58:01", [100, 100]),
        ("b", "2024-01-03T00:02:01", [300]),
    ):
        times = ts_seq(base, deltas)
        rows += [(conv, i, "user", "x", "", t) for i, t in enumerate(times)]
    r = rollup(with_deltas(make_transcript(spark, rows)), "minute")
    out = {
        r_.bucket_start.isoformat(): r_
        for r_ in gapfill(
            r, "minute", locf_cols=["lat_avg_ms"], interp_cols=["lat_avg_ms"]
        ).collect()
    }
    # spine spans 2024-01-01T23:58 .. 2024-01-03T00:02 (1445 buckets)
    assert len(out) == 1445
    assert out["2024-01-02T12:00:00"].lat_avg_ms_locf == 100  # whole day 2 is a gap
    assert out["2024-01-03T00:01:00"].lat_avg_ms_locf == 100
    assert out["2024-01-03T00:02:00"].lat_avg_ms_locf == 300
    # interp between (23:58, 100) and (+1444 min, 300), checked mid-gap
    lo_t, hi_t = out["2024-01-01T23:58:00"], out["2024-01-03T00:02:00"]
    frac = (
        (out["2024-01-02T12:00:00"].bucket_start - lo_t.bucket_start).total_seconds()
        / (hi_t.bucket_start - lo_t.bucket_start).total_seconds()
    )
    assert out["2024-01-02T12:00:00"].lat_avg_ms_interp == pytest.approx(
        100 + (300 - 100) * frac
    )


def test_keyed_gapfill_per_series(spark):
    """by=: every key gets its own full spine and its own fills."""
    rows = []
    for conv, role, base, deltas in (
        ("a", "user", "2024-01-01T00:00:01", [100, 100]),
        ("b", "assistant", "2024-01-01T00:03:01", [400]),
    ):
        times = ts_seq(base, deltas)
        rows += [(conv, i, role, "x", "", t) for i, t in enumerate(times)]
    r = rollup(
        with_deltas(make_transcript(spark, rows)), "minute", extra_keys=["role"]
    )
    out = gapfill(r, "minute", locf_cols=["lat_avg_ms"], by=["role"]).collect()
    by_key = {}
    for row in out:
        by_key.setdefault(row.role, {})[row.bucket_start.minute] = row
    assert set(by_key) == {"user", "assistant"}
    # both keys get the full 4-minute spine
    assert set(by_key["user"]) == set(by_key["assistant"]) == {0, 1, 2, 3}
    # user observed only at minute 0: LOCF carries 100 to the end,
    # assistant observed only at minute 3: nothing to carry before it
    assert by_key["user"][3].lat_avg_ms_locf == 100
    assert by_key["assistant"][2].lat_avg_ms_locf is None
    assert by_key["assistant"][3].lat_avg_ms_locf == 400


def _walk(node, fn):
    fn(node)
    for i in range(node.children().size()):
        _walk(node.children().apply(i), fn)


def _unpartitioned_spine_windows(df) -> list[str]:
    """Window nodes with an empty partitionSpec whose subtree does NOT
    contain an Aggregate — i.e. ordered windows running over the
    spine-sized relation in one task.  The boundary-carry window (over
    the per-day Aggregate, calendar-bounded) is the only allowed
    unpartitioned window."""
    bad: list[str] = []

    def check(node):
        if node.getClass().getSimpleName() != "Window":
            return
        if not node.partitionSpec().isEmpty():
            return
        seen_agg = []
        _walk(node, lambda n: seen_agg.append(
            n.getClass().getSimpleName() == "Aggregate"
        ))
        if not any(seen_agg):
            bad.append(node.toString()[:160])

    _walk(df._jdf.queryExecution().optimizedPlan(), check)
    return bad


def test_no_unpartitioned_window_over_spine(spark):
    """Round-3 verdict: both fills used Window.orderBy with no
    partitionBy, moving the whole spine through ONE task.  Pin the
    chunked design: any unpartitioned Window must sit above the per-day
    boundary Aggregate, never over the spine."""
    g = gapfill(
        _rollup_with_gaps(spark),
        "minute",
        locf_cols=["lat_avg_ms"],
        interp_cols=["lat_avg_ms"],
    )
    assert _unpartitioned_spine_windows(g) == []