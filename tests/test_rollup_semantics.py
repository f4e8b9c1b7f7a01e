"""Reference-pinned aggregate semantics re-expressed over transcript
turns (SURVEY.md §5; north_rule: 'its time-filter, count, and percentile
unit tests re-expressed over transcript turns').
"""

from __future__ import annotations

import pytest

from rollup_engine.deltas import with_deltas
from rollup_engine.rollup import global_rollup, rollup

from .conftest import make_transcript, ts_seq


def _turns(conv, base, deltas_ms, tool=""):
    times = ts_seq(base, deltas_ms)
    return [
        (conv, i, "user" if i % 2 == 0 else "assistant", f"{conv}-t{i}", tool, t)
        for i, t in enumerate(times)
    ]


def test_timing_vector_1_10_100(spark):
    """[1,10,100] ms deltas in one bucket ⇒ avg=37 (truncated),
    median=10, p90=100, p99=100, min=1, max=100, count=3
    — pins /root/reference/src/analyzer/mod.rs:90-115."""
    df = make_transcript(
        spark, _turns("c1", "2024-01-01T00:00:00", [1, 10, 100])
    )
    row = global_rollup(with_deltas(df)).collect()[0]
    assert row.turn_count == 3
    assert row.lat_min_ms == 1
    assert row.lat_max_ms == 100
    assert row.lat_avg_ms == 37
    assert row.lat_p50_ms == 10
    assert row.lat_p90_ms == 100
    assert row.lat_p99_ms == 100


def test_empty_input(spark):
    """Zero rows ⇒ count=0, all metrics null
    — pins /root/reference/src/analyzer/mod.rs:117-131."""
    df = make_transcript(spark, []).where("1=0")
    row = global_rollup(with_deltas(df)).collect()[0]
    assert row.turn_count == 0
    assert row.lat_min_ms is None
    assert row.lat_avg_ms is None
    assert row.lat_p99_ms is None
    assert row.err4xx_rate is None


def test_simple_pair_counts(spark):
    """Two conversations, deltas 7ms and 10ms ⇒ count=2, min=7, max=10
    — pins /root/reference/src/main.rs:120-146 (simple-1.log)."""
    rows = _turns("a", "2024-01-01T00:00:00", [7]) + _turns(
        "b", "2024-01-01T00:00:01", [10]
    )
    row = global_rollup(with_deltas(make_transcript(spark, rows))).collect()[0]
    assert (row.turn_count, row.lat_min_ms, row.lat_max_ms) == (2, 7, 10)


def test_conv_continuing_across_partitions(spark):
    """Reference: same id reused across two files still pairs FIFO ⇒
    count=4 over 8 lines (/root/reference/src/main.rs:214-237).
    Transcript analog: one conv_id whose turns arrive in two batches
    still yields n-1 deltas under (conv_id, turn_idx) ordering."""
    rows = _turns("a", "2024-01-01T00:00:00", [7, 10, 7, 10])
    df = make_transcript(spark, rows).repartition(4)  # scatter batches
    row = global_rollup(with_deltas(df)).collect()[0]
    assert row.turn_count == 4
    assert (row.lat_min_ms, row.lat_max_ms) == (7, 10)


def test_error_rates_third_rounds_to_0_3333(spark):
    """1 error among 3 pairs ⇒ rate 0.3333 (4-decimal half-up rounding)
    — pins /root/reference/src/analyzer/aggregated_error_rates.rs:154-168."""
    rows = (
        _turns("c1", "2024-01-01T00:00:00", [5])
        + _turns("c2", "2024-01-01T00:00:00", [5], tool="error:4xx")
        + _turns("c3", "2024-01-01T00:00:00", [5])
    )
    # error tool on every turn of c2 ⇒ exactly 1 of 3 delta rows flagged
    row = global_rollup(with_deltas(make_transcript(spark, rows))).collect()[0]
    assert row.err4xx_rate == pytest.approx(0.3333)
    assert row.err5xx_rate == 0.0


def test_error_rate_mixes(spark):
    """Rate table {2:0:0 → 0.0, 1:1:1 → 0.3333 each, 2:1:1 → 0.25}
    — /root/reference/src/analyzer/aggregated_error_rates.rs:84-168."""
    def mk(n_ok, n_4xx, n_5xx):
        rows = []
        i = 0
        for tool, n in (("", n_ok), ("error:4xx", n_4xx), ("error:5xx", n_5xx)):
            for _ in range(n):
                rows += _turns(f"m{i}", "2024-01-01T00:00:00", [5], tool=tool)
                i += 1
        from .conftest import make_transcript as mt

        return global_rollup(with_deltas(mt(spark, rows))).collect()[0]

    r = mk(2, 0, 0)
    assert (r.err4xx_rate, r.err5xx_rate) == (0.0, 0.0)
    r = mk(1, 1, 1)
    assert r.err4xx_rate == pytest.approx(0.3333)
    assert r.err5xx_rate == pytest.approx(0.3333)
    r = mk(2, 1, 1)
    assert (r.err4xx_rate, r.err5xx_rate) == (0.25, 0.25)


def test_percentile_log_1_to_10(spark):
    """Deltas 1..10 ms (port of src/test/percentile.log): nearest-rank
    ⇒ p50=5, p90=9, p99=10, min=1, max=10, avg=floor(5.5)=5."""
    df = make_transcript(
        spark, _turns("p", "2024-01-01T00:00:00", list(range(1, 11)))
    )
    row = global_rollup(with_deltas(df)).collect()[0]
    assert row.turn_count == 10
    assert (row.lat_p50_ms, row.lat_p90_ms, row.lat_p99_ms) == (5, 9, 10)
    assert row.lat_avg_ms == 5


def test_minute_buckets_split(spark):
    """Per-minute rollup splits deltas into their ts bucket."""
    rows = _turns("c1", "2024-01-01T00:00:59.900", [200])  # delta lands :01
    rows += _turns("c2", "2024-01-01T00:00:00", [5, 5])  # both in :00
    out = {
        r.bucket_start.isoformat(): r
        for r in rollup(with_deltas(make_transcript(spark, rows)), "minute").collect()
    }
    assert out["2024-01-01T00:00:00"].turn_count == 2
    assert out["2024-01-01T00:01:00"].turn_count == 1
    assert out["2024-01-01T00:01:00"].lat_min_ms == 200


def test_malformed_rows_dropped(spark):
    """Null ts / negative turn_idx / duplicate (conv,turn) rows are
    silently dropped (broken.log analog, /root/reference/src/main.rs:192-212)."""
    from rollup_engine.transcripts import clean

    good = _turns("g", "2024-01-01T00:00:00", [7])
    bad = [
        ("g", 2, "user", "x", "", None),  # null ts
        ("h", -1, "user", "x", "", "2024-01-01T00:00:00"),  # negative idx
        ("g", 1, "user", "dup", "", "2024-01-01T09:00:00"),  # duplicate, later ts
    ]
    df = make_transcript(spark, good + bad)
    cleaned = clean(df)
    assert cleaned.count() == 2
    # duplicate resolution keeps the earliest-ts row (stable ordering)
    kept = {r.turn_idx: r.text for r in cleaned.where("conv_id='g'").collect()}
    assert kept[1] == "g-t1"
    row = global_rollup(with_deltas(cleaned)).collect()[0]
    assert row.turn_count == 1
    assert row.lat_min_ms == 7
