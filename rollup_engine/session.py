"""SparkSession factory with scale-honest defaults.

Defaults chosen for the 100 TB target, not just local tests:
- AQE on (runtime re-plan, skew-join splitting, partition coalescing).
- Arrow on (every Python stage in this engine is Arrow-vectorized;
  per-row Python UDFs are banned by design — BASELINE.json input_hint).
- shuffle partitions sized to the local core count; on a real cluster
  this is overridden by AQE's coalescing + ``--conf`` at submit time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rollup_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a real cluster pass ``None`` at spark-submit time
    and let the submit config win.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        # under spark-submit, --master arrives via system properties —
        # never override a real cluster with local mode
        from pyspark import SparkConf

        master = (
            None if SparkConf().contains("spark.master") else f"local[{cpus}]"
        )
    # the ACTUAL core count of this session's master (not the sandbox
    # env) drives both shuffle-partition and heap sizing
    m = master or ""
    if m.startswith("local[") and m[6:-1].isdigit():
        cores = int(m[6:-1])
    else:
        cores = cpus
    if shuffle_partitions is None:
        # 4× the core count: balances stragglers/skew without tiny-task
        # overhead.  Sizing from env regardless of master gave local[1]
        # 128 shuffle partitions — per-task overhead paid serially
        # (measured: 8 partitions beat 128 by 17% even at local[4]).
        shuffle_partitions = max(4 * cores, 8)

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Don't let AQE coalesce below the core count: a 64 MB advisory
        # target turns a ~400 MB shuffle into ~6 partitions and
        # serializes every window/sort stage (measured 2× slowdown).
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Keep scans reasonable on local FS; on a cluster this bounds
        # per-task input so partitions fit in executor memory.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Local mode runs every task inside the driver JVM.  8g is the
        # measured sweet spot on this VM even at local[32] (same job,
        # same window: 8g → 7.5 s, 24g → 8.8 s, 64g → 14-55 s erratic —
        # huge heaps trade work for GC/page-fault pauses here).  On a
        # real cluster executor memory is a submit-time concern.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
