"""As-of join + counter-increase semantics: backward-inclusive match,
deterministic ties, tolerance nulling, reset detection."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rollup_engine.asof import asof_join, counter_increase


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T00:00:00")),  # before any marker
            (2, "a", _ts("2024-01-01T00:10:00")),  # exactly at marker 1
            (3, "a", _ts("2024-01-01T00:25:00")),  # after marker 2
            (4, "b", _ts("2024-01-01T00:30:00")),  # other key
            (5, "c", _ts("2024-01-01T00:30:00")),  # key with no markers
        ],
        "event_id: long, user_id: string, ts: timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:10:00"), 10.0),
            ("a", _ts("2024-01-01T00:20:00"), 20.0),
            ("b", _ts("2024-01-01T00:05:00"), 5.0),
        ],
        "user_id: string, ts: timestamp, mark: double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _fixture(spark)
    rows = {
        r.event_id: (r.mark, r.ts_asof)
        for r in asof_join(left, right, by=["user_id"]).collect()
    }
    assert rows[1] == (None, None)                       # nothing before
    assert rows[2][0] == 10.0                            # equal ts matches
    assert rows[3] == (20.0, _ts("2024-01-01T00:20:00"))  # latest ≤ ts
    assert rows[4][0] == 5.0                             # per-key isolation
    assert rows[5] == (None, None)                       # keyless group


def test_asof_tolerance(spark):
    left, right = _fixture(spark)
    rows = {
        r.event_id: r.mark
        for r in asof_join(
            left, right, by=["user_id"], tolerance_seconds=300
        ).collect()
    }
    assert rows[2] == 10.0          # 0 s old — kept
    assert rows[3] == 20.0          # 5 min old — kept (boundary)
    assert rows[4] is None          # 25 min old — nulled by tolerance


def test_asof_tie_break_deterministic(spark):
    """Two right rows at the same (key, ts): the greatest tiebreak value
    wins, stable under repartitioning."""
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01T00:10:00"))],
        "event_id: long, user_id: string, ts: timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:10:00"), 7, 111.0),
            ("a", _ts("2024-01-01T00:10:00"), 9, 222.0),
            ("a", _ts("2024-01-01T00:10:00"), 8, 333.0),
        ],
        "user_id: string, ts: timestamp, seq: long, mark: double",
    )
    for parts in (1, 7):
        out = asof_join(
            left, right.repartition(parts), by=["user_id"], right_tiebreak="seq"
        ).collect()
        assert out[0].mark == 222.0  # seq 9 wins


def test_asof_matched_row_stays_atomic(spark):
    """A NULL field in the matched (most recent) right row must arrive as
    NULL — never backfilled from an OLDER right row.  Right rows
    (ts=1, a=5.0, b='old') then (ts=2, a=NULL, b='new'): a left row at
    ts=10 matches the ts=2 row intact, so a is NULL (DuckDB/pandas ASOF
    semantics; regression for the per-column-LOCF column-mixing bug)."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T00:10:00"))],
        "event_id: long, user_id: string, ts: timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T00:01:00"), 5.0, "old"),
            ("k", _ts("2024-01-01T00:02:00"), None, "new"),
        ],
        "user_id: string, ts: timestamp, a: double, b: string",
    )
    row = asof_join(left, right, by=["user_id"]).collect()[0]
    assert row.b == "new"
    assert row.a is None
    assert row.ts_asof == _ts("2024-01-01T00:02:00")


def test_asof_column_collision_raises(spark):
    left, right = _fixture(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("mark", "event_id"), by=["user_id"])


def test_counter_increase_reset_detection(spark):
    """Pinned vector: 10→25→5→30 ⇒ increases null,15,5,25 (reset at 5:
    post-reset value IS the increase, PromQL increase() semantics)."""
    rows = [
        ("a", _ts(f"2024-01-01T00:0{i}:00"), float(v))
        for i, v in enumerate([10, 25, 5, 30])
    ]
    df = spark.createDataFrame(rows, "user_id: string, ts: timestamp, value: double")
    inc = counter_increase(df, "value", by=["user_id"])
    got = [
        r.inc
        for r in df.withColumn("inc", inc).orderBy("ts").collect()
    ]
    assert got == [None, 15.0, 5.0, 25.0]


def test_asof_forward_pinned(spark):
    """Forward direction: earliest right row AT or AFTER left.ts;
    inclusive boundary; NULL when nothing follows; tolerance nulls
    matches farther ahead than the bound."""
    import datetime as dt

    from rollup_engine.asof import asof_join

    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        [("u", 1, ts(0)), ("u", 2, ts(5)), ("u", 3, ts(11))],
        "user_id string, event_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", ts(5), 50), ("u", ts(9), 90)],
        "user_id string, ts timestamp, v int",
    )
    out = {
        r.event_id: (r.v, r.ts_asof)
        for r in asof_join(
            left, right, by=["user_id"], ts_col="ts", direction="forward"
        ).collect()
    }
    assert out[1] == (50, ts(5))   # next at +5min
    assert out[2] == (50, ts(5))   # boundary: equal ts matches (inclusive)
    assert out[3] == (None, None)  # nothing after 0:11
    tol = {
        r.event_id: (r.v, r.ts_asof)
        for r in asof_join(
            left, right, by=["user_id"], ts_col="ts",
            direction="forward", tolerance_seconds=120,
        ).collect()
    }
    assert tol[1] == (None, None)  # next match is 5 min ahead > 2 min
    assert tol[2] == (50, ts(5))


def test_asof_forward_tie_and_struct_atomicity(spark):
    """Equal-ts right rows resolve to the greatest tiebreak; the
    carried row stays atomic (a NULL field never backfills from a
    different right row)."""
    import datetime as dt

    from rollup_engine.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("u", 1, t0)], "user_id string, event_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", t0, 1, "a"), ("u", t0, 2, None)],
        "user_id string, ts timestamp, pri int, label string",
    )
    r = asof_join(
        left, right, by=["user_id"], ts_col="ts",
        direction="forward", right_tiebreak="pri",
    ).collect()[0]
    # greatest pri wins atomically: label must be ITS (NULL) label,
    # never 'a' borrowed from the losing row
    assert (r.pri, r.label) == (2, None)
