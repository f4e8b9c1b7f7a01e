#!/usr/bin/env python
"""Stage-level profile of the scaling-study job at one parallelism level.

Usage: python scripts/profile_scaling.py CPUS [TABLE]
Times each forced sub-plan (post-warmup, min of N) so the level-to-level
comparison shows WHICH stage stops scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, reps=3):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return min(out)


def main():
    cpus = int(sys.argv[1])
    table = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".benchdata", "transcripts_12000000"
    )
    from pyspark.sql import functions as F

    from rollup_engine.deltas import with_deltas
    from rollup_engine.hist_rollup import hist_rollup
    from rollup_engine.session import get_spark
    from rollup_engine.transcripts import clean

    spark = get_spark(f"profile-{cpus}", master=f"local[{cpus}]")
    raw = spark.read.parquet(table)

    stages = {}

    def scan():
        return raw.select("conv_id", "turn_idx", "ts", "tool")

    def deltas():
        return with_deltas(clean(raw))

    def compress():
        return (
            deltas()
            .select(
                F.date_trunc("minute", F.col("ts")).alias("bucket_start"),
                F.col("delta_ms").alias("_v"),
            )
            .where(F.col("_v").isNotNull())
            .groupBy("bucket_start", "_v")
            .agg(F.count(F.lit(1)).alias("_c"))
        )

    def full():
        # rebuilt per rep: each rep is a full end-to-end execution
        return hist_rollup(deltas(), "minute")

    for name, build in [
        ("scan", scan),
        ("clean_deltas", deltas),
        ("compress", compress),
        ("full_minute", full),
    ]:
        _force(build())  # warm-up
        stages[name] = _timed(lambda b=build: _force(b()))
    print(json.dumps({"cpus": cpus, "stages": stages}))


if __name__ == "__main__":
    main()
