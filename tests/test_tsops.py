"""M4 downsampling + sessionization semantics (pinned vectors)."""

from __future__ import annotations

import datetime as dt

from rollup_engine.tsops import m4_downsample, session_stats, sessionize


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _series(spark):
    rows = [
        # one user, one hour: values 30, 10, 50, 20 in time order
        (1, "a", _ts("2024-01-01T00:05:00"), 30.0),
        (2, "a", _ts("2024-01-01T00:15:00"), 10.0),
        (3, "a", _ts("2024-01-01T00:25:00"), 50.0),
        (4, "a", _ts("2024-01-01T00:55:00"), 20.0),
        # second hour, single point
        (5, "a", _ts("2024-01-01T01:30:00"), 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id: long, user_id: string, ts: timestamp, value: double"
    )


def test_m4_pinned_vector(spark):
    out = {
        r.bucket_start: r
        for r in m4_downsample(
            _series(spark), by=["user_id"], order_tiebreak="event_id"
        ).collect()
    }
    h0 = out[_ts("2024-01-01T00:00:00")]
    assert (h0.v_min, h0.v_max, h0.v_first, h0.v_last, h0.n) == (
        10.0, 50.0, 30.0, 20.0, 4,
    )
    h1 = out[_ts("2024-01-01T01:00:00")]
    assert (h1.v_min, h1.v_max, h1.v_first, h1.v_last, h1.n) == (
        7.0, 7.0, 7.0, 7.0, 1,
    )


def test_m4_deterministic_under_repartition(spark):
    df = _series(spark)
    a = sorted(
        map(tuple, m4_downsample(df.repartition(1), by=["user_id"],
                                 order_tiebreak="event_id").collect())
    )
    b = sorted(
        map(tuple, m4_downsample(df.repartition(7), by=["user_id"],
                                 order_tiebreak="event_id").collect())
    )
    assert a == b


def test_sessionize_gap_boundary(spark):
    """Gap strictly greater than gap_seconds starts a session: events at
    0, +30min (boundary, same session), +61min (new session)."""
    rows = [
        (1, "u", _ts("2024-01-01T00:00:00")),
        (2, "u", _ts("2024-01-01T00:30:00")),   # exactly 1800 s — kept
        (3, "u", _ts("2024-01-01T01:31:00")),   # 3660 s — new session
    ]
    df = spark.createDataFrame(rows, "event_id: long, user_id: string, ts: timestamp")
    out = {r.event_id: r.session_seq for r in sessionize(df, 1800, ["user_id"]).collect()}
    assert out == {1: 1, 2: 1, 3: 2}


def test_session_stats(spark):
    rows = [
        (1, "u", _ts("2024-01-01T00:00:00")),
        (2, "u", _ts("2024-01-01T00:10:00")),
        (3, "u", _ts("2024-01-01T02:00:00")),
        (4, "v", _ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(rows, "event_id: long, user_id: string, ts: timestamp")
    out = {
        (r.user_id, r.session_seq): (r.n_events, r.duration_sec)
        for r in session_stats(df, 1800, ["user_id"]).collect()
    }
    assert out == {
        ("u", 1): (2, 600.0),
        ("u", 2): (1, 0.0),
        ("v", 1): (1, 0.0),
    }
