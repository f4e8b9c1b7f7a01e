"""Idempotent ingest (upsert.py): winner semantics, replay no-ops, and
the partial-agg plan shape (no window sort over full rows)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from rollup_engine.upsert import dedup_redelivered, merge_upsert

COLS = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _t(s):
    return datetime.datetime.fromisoformat(s)


def _rows(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_latest_ts_wins_and_md5_breaks_ties(spark):
    df = _rows(
        spark,
        [
            # key (c1,0): later ts must win regardless of batch order
            ("c1", 0, "user", "old", None, _t("2024-01-01 00:00:00")),
            ("c1", 0, "user", "new", None, _t("2024-01-01 00:00:05")),
            # key (c1,1): same ts — md5(full payload) DESC picks one
            # winner deterministically (expected value computed below)
            ("c1", 1, "user", "a", None, _t("2024-01-01 00:01:00")),
            ("c1", 1, "user", "b", None, _t("2024-01-01 00:01:00")),
            # key (c2,0): singleton passes through untouched
            ("c2", 0, "assistant", "solo", "search", _t("2024-01-01 00:02:00")),
        ],
    )
    out = {
        (r.conv_id, r.turn_idx): r
        for r in dedup_redelivered(df).collect()
    }
    import hashlib

    def tie(text, role, tool):
        j = "\x1f".join([text or "", role or "", tool or ""])
        return hashlib.md5(j.encode()).hexdigest()

    want_tie = max("ab", key=lambda t: tie(t, "user", None))
    assert len(out) == 3
    assert out[("c1", 0)].text == "new"
    assert out[("c1", 1)].text == want_tie
    assert out[("c2", 0)].tool == "search"
    # column order preserved
    assert dedup_redelivered(df).columns == df.columns


def test_exact_duplicate_rows_collapse(spark):
    row = ("c1", 0, "user", "same", None, _t("2024-01-01 00:00:00"))
    df = _rows(spark, [row, row, row])
    got = dedup_redelivered(df).collect()
    assert len(got) == 1 and got[0].text == "same"


def test_null_text_order_is_total(spark):
    df = _rows(
        spark,
        [
            ("c1", 0, "user", None, None, _t("2024-01-01 00:00:00")),
            ("c1", 0, "user", "x", None, _t("2024-01-01 00:00:00")),
        ],
    )
    import hashlib

    def tie(text):
        j = "\x1f".join([text or "", "user", ""])
        return hashlib.md5(j.encode()).hexdigest()

    want = None if tie(None) > tie("x") else "x"
    assert dedup_redelivered(df).collect()[0].text == want


def test_replaying_an_old_batch_is_a_noop(spark):
    target = _rows(
        spark,
        [
            ("c1", 0, "user", "v2", None, _t("2024-01-01 00:00:10")),
            ("c2", 0, "user", "only", None, _t("2024-01-01 00:01:00")),
        ],
    )
    stale = _rows(
        spark, [("c1", 0, "user", "v1", None, _t("2024-01-01 00:00:00"))]
    )
    merged = merge_upsert(target, stale)
    assert sorted(
        (r.conv_id, r.text) for r in merged.collect()
    ) == [("c1", "v2"), ("c2", "only")]


def test_merge_inserts_new_keys_and_updates_newer(spark):
    target = _rows(
        spark, [("c1", 0, "user", "v1", None, _t("2024-01-01 00:00:00"))]
    )
    batch = _rows(
        spark,
        [
            ("c1", 0, "user", "v2", None, _t("2024-01-01 00:00:10")),
            ("c3", 0, "user", "ins", None, _t("2024-01-01 00:02:00")),
        ],
    )
    merged = merge_upsert(target, batch)
    assert sorted(
        (r.conv_id, r.text) for r in merged.collect()
    ) == [("c1", "v2"), ("c3", "ins")]


def test_upsert_plan_is_partial_agg(spark):
    """The kernel must be partial+final hash aggregation on the key —
    NOT a row_number window (which would sort every full row after the
    shuffle).  max_by over a struct falls back from codegen'd
    HashAggregate to ObjectHashAggregate; both carry the map-side
    partial_max_by."""
    df = _rows(
        spark, [("c1", 0, "user", "x", None, _t("2024-01-01 00:00:00"))]
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        dedup_redelivered(df)._jdf.queryExecution(), "extended"
    )
    phys = plan.split("== Physical Plan ==")[-1]
    assert "partial_max_by" in phys or "partial_maxby" in phys.lower(), phys
    assert "Window" not in phys
    assert phys.count("Aggregate") >= 2


def test_merge_is_idempotent_and_batch_split_invariant(spark):
    """Algebraic laws the exactly-once contract rests on: applying the
    same batch twice changes nothing (idempotence), and merging two
    batches sequentially equals merging their union in one shot
    (the winner is a total order, so grouping cannot matter)."""
    rng_rows = [
        ("c%d" % (i % 7), i % 5, "user", "t%d" % (i % 11), None,
         _t("2024-01-01 00:00:00")) for i in range(40)
    ]
    target = _rows(spark, rng_rows[:15])
    b1 = _rows(spark, rng_rows[15:30])
    b2 = _rows(spark, rng_rows[30:])

    def sig(df):
        return sorted(map(tuple, df.collect()))

    once = merge_upsert(target, b1)
    assert sig(merge_upsert(once, b1)) == sig(once)  # idempotent
    seq = merge_upsert(merge_upsert(target, b1), b2)
    oneshot = merge_upsert(target, b1.unionByName(b2))
    assert sig(seq) == sig(oneshot)  # grouping-invariant
