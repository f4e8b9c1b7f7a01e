#!/usr/bin/env python
"""Decompose the streaming stateful path (VERDICT r5 item 4): where do
the seconds go in run_stream_once — the applyInPandasWithState stage
(per-group Arrow overhead on 10k tiny conversation groups), the state
store commit, the window aggregate, or the sink?

Each leg is a FRESH availableNow query over the same generated input
(cold checkpoint), timed end-to-end like bench.py --stream-bench.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from rollup_engine.generate import synthetic_transcripts  # noqa: E402
from rollup_engine.session import get_spark  # noqa: E402
from rollup_engine.streaming import (  # noqa: E402
    read_turn_stream,
    stream_deltas,
    stream_minute_rollup,
)

TURNS = int(os.environ.get("STREAM_TURNS", "1000000"))
CPUS = int(os.environ.get("STREAM_CPUS", "8"))

spark = get_spark("exp-stream", master=f"local[{CPUS}]")
work = tempfile.mkdtemp(prefix="expstream_", dir=os.path.join(REPO, ".benchdata"))
inp = os.path.join(work, "input")
synthetic_transcripts(
    spark, n_convs=max(1, TURNS // 100), turns_per_conv=100
).repartition(32, "conv_id").write.mode("overwrite").parquet(inp)


def run_query(df_builder, tag: str, conf: dict | None = None) -> float:
    for k, v in (conf or {}).items():
        spark.conf.set(k, v)
    ck = os.path.join(work, f"ck_{tag}")
    out = os.path.join(work, f"out_{tag}")
    t0 = time.perf_counter()
    q = (
        df_builder()
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sec = time.perf_counter() - t0
    for k in (conf or {}):
        spark.conf.unset(k)
    return round(sec, 3)


def full():
    return stream_minute_rollup(stream_deltas(read_turn_stream(spark, inp)))


def state_only():
    return stream_deltas(read_turn_stream(spark, inp))


def window_only():
    # stateless approximation: delta precomputed as 0 (timing only)
    turns = read_turn_stream(spark, inp).withColumn("delta_ms", F.lit(1).cast("long"))
    return stream_minute_rollup(turns.select("conv_id", "turn_idx", "ts", "tool", "delta_ms"))


ROCKS = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
}

legs = [
    ("full", full, None),
    ("state_only", state_only, None),
    ("window_only", window_only, None),
    ("full_rocksdb", full, ROCKS),
    ("full_rep2", full, None),  # repeat for JIT-warm comparison
]
res = {}
for i, (tag, builder, conf) in enumerate(legs):
    res[tag] = run_query(builder, f"{tag}_{i}", conf)
    print(json.dumps({tag: res[tag]}), flush=True)
print(json.dumps({"turns": TURNS, "cpus": CPUS, "legs": res,
                  "turns_per_sec": {k: round(TURNS / v, 1) for k, v in res.items()}}))
shutil.rmtree(work, ignore_errors=True)
