#!/usr/bin/env python
"""A/B the fused events→deltas pipeline (one Window computing
row_number AND lag over the same (conv_id, ts, event_id) ordering)
against the current two-sort/two-window shape, plus a
shuffle-partition sweep (guide §2.2/§2.4)."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rollup_engine.deltas import with_deltas  # noqa: E402
from rollup_engine.rollup import rollup  # noqa: E402
from rollup_engine.session import get_spark  # noqa: E402
from rollup_engine.transcripts import from_events, load_events  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("exp-fused", master=f"local[{cpus}]")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def fused_deltas():
    ev = load_events(spark, sf_dir)
    base = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        "ts",
        "event_id",
        "event_type",
        "props",
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    ts_cast = F.col("ts").cast("timestamp")
    out = base.select(
        "conv_id",
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(
            F.col("event_type") == "error",
            F.when(F.col("event_id") % 2 == 0, F.lit("error:4xx")).otherwise(
                F.lit("error:5xx")
            ),
        )
        .otherwise(F.col("event_type"))
        .alias("tool"),
        ts_cast.alias("ts"),
        F.floor(
            (F.unix_micros(ts_cast) - F.unix_micros(F.lag(ts_cast).over(w)))
            / F.lit(1000)
        )
        .cast("long")
        .alias("delta_ms"),
    )
    return out.where(F.col("delta_ms").isNotNull())


def v_current():
    return rollup(with_deltas(from_events(spark, sf_dir)), "minute")


def v_fused():
    return rollup(fused_deltas(), "minute")


variants = {"A_current": v_current, "B_fused": v_fused}
for name, fn in variants.items():
    force(fn())
times = {k: [] for k in variants}
for _ in range(4):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        force(fn())
        times[name].append(round(time.perf_counter() - t0, 3))
print(json.dumps({k: {"min": min(v), "all": v} for k, v in times.items()}), flush=True)

# equality check: fused vs current must be row-identical
cur = with_deltas(from_events(spark, sf_dir))
fus = fused_deltas()
diff = cur.exceptAll(fus).count() + fus.exceptAll(cur).count()
print(json.dumps({"rows_current": cur.count(), "rows_fused": fus.count(),
                  "sym_diff": diff}), flush=True)

# shuffle-partition sweep on the fused minute rollup
for parts in (32, 64, 128):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    force(v_fused())
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(v_fused())
        reps.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"parts": parts, "min": min(reps), "all": reps}), flush=True)
