"""Misra–Gries heavy hitters: exactness of the final answer, the
candidate-superset guarantee under adversarial partitioning, and the
bounded summary size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rollup_engine.heavyhitters import _mg_candidates, heavy_hitters


def _zipf_df(spark, n_heavy=5, n_tail=2000, reps_heavy=500, parts=7):
    """n_heavy keys with reps_heavy occurrences each + n_tail singleton
    keys, shuffled across `parts` partitions by a hash that separates
    key space from partition space."""
    heavy = spark.range(n_heavy * reps_heavy).select(
        F.concat(F.lit("H"), (F.col("id") % n_heavy)).alias("k")
    )
    tail = spark.range(n_tail).select(
        F.concat(F.lit("t"), F.col("id")).alias("k")
    )
    return heavy.unionAll(tail).repartition(parts, F.crc32(F.col("k")))


def _expected(n_heavy, n_tail, reps_heavy, num, den):
    total = n_heavy * reps_heavy + n_tail
    return {
        f"H{i}" for i in range(n_heavy) if reps_heavy * den >= num * total
    }


def test_exact_answer_under_skew(spark):
    df = _zipf_df(spark)
    got = {
        r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 1, 10).collect()
    }
    assert got == {f"H{i}": 500 for i in range(5)}


def test_partitioning_does_not_change_answer(spark):
    base = _zipf_df(spark, parts=3)
    a = sorted(heavy_hitters(base, "k", 1, 10).collect())
    b = sorted(
        heavy_hitters(base.repartition(13, "k"), "k", 1, 10).collect()
    )
    c = sorted(heavy_hitters(base.coalesce(1), "k", 1, 10).collect())
    assert a == b == c


def test_candidates_are_superset_of_true_hitters(spark):
    """Phase 1 alone (no verify) must retain every true heavy hitter
    even when the tail floods the counter budget."""
    df = _zipf_df(spark, n_heavy=3, n_tail=5000, reps_heavy=800)
    m = 10 // 1 + 1
    cands = {r["k"] for r in _mg_candidates(df, "k", m).collect()}
    assert {"H0", "H1", "H2"} <= cands


def test_summary_size_bounded(spark):
    """Each partition's summary holds at most m counters — the memory
    contract that lets this run where groupBy().count() cannot."""
    df = _zipf_df(spark, n_heavy=3, n_tail=5000, reps_heavy=800, parts=4)
    m = 11
    per_part = (
        _mg_candidates(df, "k", m)
        .withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_part <= m


def test_bad_threshold_rejected(spark):
    df = _zipf_df(spark, n_heavy=1, n_tail=1, reps_heavy=2)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 3, 2)


def test_random_reference_various_thresholds(spark):
    """Seeded random frequency mixes at several θ: the operator must
    equal the exact frequency-table answer every time."""
    import random

    rng = random.Random(20260817)
    vals = []
    for i in range(60):
        vals += [f"v{i}"] * rng.randint(1, 120)
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "k string").repartition(5)
    from collections import Counter

    exact = Counter(vals)
    n = len(vals)
    for num, den in [(1, 20), (1, 50), (3, 100)]:
        want = {k: c for k, c in exact.items() if c * den >= num * n}
        got = {
            r["k"]: r["cnt"]
            for r in heavy_hitters(df, "k", num, den).collect()
        }
        assert got == want, (num, den)
