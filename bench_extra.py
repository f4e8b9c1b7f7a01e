#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1).  NOT the frozen
harness — ``bench.py`` stays the driver's measurement.  This file:

- ``--suite``: times each headline query exactly like bench.py
  (2 untimed warm-ups, min of 3 timed noop-sink reps) at
  ``$SPARK_GRAFT_SF_DIR`` and prints one JSON line per query plus a
  total, with a pure-CPU window probe for cross-window comparability.
- ``--plans <dir>``: writes ``<dir>/<query>_<tag>.txt`` with
  ``explain("formatted")`` for every headline query.
- ``--one <name>``: time a single query (for isolation runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import HEADLINE, _force, _hw_rate  # noqa: E402


def _spark(cpus: int):
    from rollup_engine.session import get_spark

    return get_spark("rollup-bench-extra", master=f"local[{cpus}]")


def time_query(spark, name: str, sf_dir: str, reps: int = 3) -> list[float]:
    from rollup_engine.queries import QUERIES

    spark.sparkContext.setJobDescription(f"bench_extra:{name}")
    _force(QUERIES[name](spark, sf_dir))
    _force(QUERIES[name](spark, sf_dir))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(QUERIES[name](spark, sf_dir))
        out.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return sorted(out)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "--suite"

    if mode == "--plans":
        outdir = sys.argv[2]
        tag = sys.argv[3] if len(sys.argv) > 3 else "before"
        os.makedirs(outdir, exist_ok=True)
        from rollup_engine.queries import QUERIES

        spark = _spark(cpus)
        for name in HEADLINE:
            df = QUERIES[name](spark, sf_dir)
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        print(json.dumps({"plans": outdir, "tag": tag, "n": len(HEADLINE)}))
        return

    if mode == "--one":
        name = sys.argv[2]
        spark = _spark(cpus)
        hw0 = _hw_rate(min(cpus, 32))
        reps = time_query(spark, name, sf_dir, reps=5)
        print(json.dumps({"query": name, "sf_dir": sf_dir, "reps": reps,
                          "min": reps[0], "hw_probe": round(hw0, 2)}))
        return

    # --suite
    spark = _spark(cpus)
    probes = [_hw_rate(min(cpus, 32))]
    times: dict[str, list[float]] = {}
    for i, name in enumerate(HEADLINE):
        times[name] = time_query(spark, name, sf_dir)
        print(json.dumps({"query": name, "reps": times[name]}), flush=True)
        if i == len(HEADLINE) // 2:
            probes.append(_hw_rate(min(cpus, 32)))
    probes.append(_hw_rate(min(cpus, 32)))
    total = round(sum(v[0] for v in times.values()), 3)
    print(json.dumps({
        "metric": "bench_extra_suite",
        "value": total,
        "unit": "sec",
        "queries": {k: v[0] for k, v in times.items()},
        "spreads": times,
        "sf_dir": sf_dir,
        "cpus": cpus,
        "hw_probes": [round(p, 2) for p in probes],
    }))


if __name__ == "__main__":
    main()
