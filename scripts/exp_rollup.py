#!/usr/bin/env python
"""Decompose the rollup-family cost at a given SF (guide §1): where do
rollup_minute's seconds go — scan, window, base aggs, or the three GK
percentile sketches?  Interleaved min-of-N in one session."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from rollup_engine.deltas import with_deltas  # noqa: E402
from rollup_engine.percentiles import exact_nearest_rank  # noqa: E402
from rollup_engine.rollup import metric_agg_map, rollup  # noqa: E402
from rollup_engine.session import get_spark  # noqa: E402
from rollup_engine.transcripts import from_events, load_events  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("exp-rollup", master=f"local[{cpus}]")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def scan_only():
    return load_events(spark, sf_dir)


def fe():
    return from_events(spark, sf_dir)


def deltas():
    return with_deltas(from_events(spark, sf_dir))


def minute_full():
    return rollup(deltas(), "minute")


def minute_noperc():
    d = deltas()
    aggs = [
        c.alias(n)
        for n, c in metric_agg_map().items()
        if not n.startswith("lat_p")
    ]
    return d.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("bucket_start")
    ).agg(*aggs)


def minute_countsort():
    """Counting-sort percentiles: groupBy(bucket, delta) first, then
    derive ALL metrics from the compressed (bucket, value, count[, e4,
    e5]) relation — exact nearest-rank (== the DuckDB oracle)."""
    from pyspark.sql import Window

    d = deltas()
    from rollup_engine.rollup import ERR4, ERR5, error_flag

    h = (
        d.select(
            F.date_trunc("minute", F.col("ts")).alias("bucket_start"),
            F.col("delta_ms").alias("_v"),
            error_flag(ERR4).alias("_e4"),
            error_flag(ERR5).alias("_e5"),
        )
        .groupBy("bucket_start", "_v")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum("_e4").alias("_e4"),
            F.sum("_e5").alias("_e5"),
        )
    )
    w_cum = (
        Window.partitionBy("bucket_start")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("bucket_start")
    h2 = h.withColumn("_cum", F.sum("_c").over(w_cum)).withColumn(
        "_n", F.sum("_c").over(w_all)
    )
    qaggs = [
        F.min(
            F.when(
                F.col("_cum") >= F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n"))),
                F.col("_v"),
            )
        ).alias(name)
        for name, q in (("lat_p50_ms", 0.5), ("lat_p90_ms", 0.9), ("lat_p99_ms", 0.99))
    ]
    return h2.groupBy("bucket_start").agg(
        F.sum("_c").alias("turn_count"),
        F.min("_v").alias("lat_min_ms"),
        F.max("_v").alias("lat_max_ms"),
        F.sum(F.col("_v") * F.col("_c")).alias("lat_sum_ms"),
        *qaggs,
        F.round(F.sum("_e4") / F.sum("_c"), 4).alias("err4xx_rate"),
        F.round(F.sum("_e5") / F.sum("_c"), 4).alias("err5xx_rate"),
    )


def perc_exact():
    return exact_nearest_rank(deltas(), "delta_ms", [0.5, 0.9, 0.99])


variants = {
    "scan_only": scan_only,
    "from_events": fe,
    "deltas": deltas,
    "minute_noperc": minute_noperc,
    "minute_full": minute_full,
    "minute_countsort": minute_countsort,
    "percentile_exact": perc_exact,
}
for name, fn in variants.items():
    force(fn())
times = {k: [] for k in variants}
for _ in range(3):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        force(fn())
        times[name].append(round(time.perf_counter() - t0, 3))
print(json.dumps({k: {"min": min(v), "all": v} for k, v in times.items()}))
