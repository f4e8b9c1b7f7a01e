#!/usr/bin/env python
"""Config sweep for the scaling job: one (cpus, conf) combo per process.

Usage: python scripts/profile_configs.py CPUS CONFIG [TABLE]
CONFIG ∈ base | aqe_off | sp_scaled | aqe_off_sp
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1])
    config = sys.argv[2]
    table = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, ".benchdata", "transcripts_12000000"
    )
    from rollup_engine.deltas import with_deltas
    from rollup_engine.hist_rollup import hist_rollup
    from rollup_engine.session import get_spark
    from rollup_engine.transcripts import clean

    extra = {}
    sp = None
    if "aqe_off" in config:
        extra["spark.sql.adaptive.enabled"] = "false"
    if "sp" in config:
        sp = max(2 * cpus, 8)
    spark = get_spark(
        f"cfg-{config}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=sp,
        extra_conf=extra,
    )
    raw = spark.read.parquet(table)

    def force():
        # rebuilt per rep: each rep is a full end-to-end execution
        full = hist_rollup(with_deltas(clean(raw)), "minute")
        full.write.format("noop").mode("overwrite").save()

    force()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        force()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"cpus": cpus, "config": config, "min": min(times), "all": times}))


if __name__ == "__main__":
    main()
