"""Incremental metric export — push ONLY what a refresh changed.

The reference's push sinks re-send the entire result every run
(/root/reference/src/render/graphite.rs — one connection, full dump per
invocation); at a 10^12-turn deployment's tier sizes, re-pushing a year
of minute buckets per refresh is the export analog of
recompute-per-scrape.  This module composes three existing pieces into
the continuous exporter: the checkpointed refresh (incremental.py), the
tier diff (rollup_diff — which buckets actually changed), and the
byte-compatible sinks (render.py).

Delivery contract: at-least-once to the sink, exactly-once END STATE —
the export offset (last exported tier version) commits AFTER the push,
so a crash between push and commit replays that diff; Graphite and
InfluxDB writes are keyed by (metric path, timestamp), so a replayed
line overwrites itself rather than double-counting.  This is the same
idempotent-replay shape as the refresh itself (crash-resume identity).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental import IncrementalRollup, rollup_diff

EXPORT_KEYS = ("bucket_start",)


class IncrementalExporter:
    """Drives a sink from an IncrementalRollup's materialized tier:
    each ``export_once`` pushes the buckets that changed between the
    last exported tier version and the current one."""

    def __init__(self, job: IncrementalRollup, sink, metric: str = "turn_count"):
        self.job = job
        self.sink = sink  # callable: list[Row] -> None (or render sink)
        self.metric = metric

    def _offset_path(self) -> str:
        return os.path.join(self.job.workdir, "EXPORT_OFFSET.json")

    def exported_version(self) -> int:
        p = self._offset_path()
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return json.load(f)["version"]

    def _state_path(self, version: int) -> str:
        return os.path.join(
            self.job.workdir, f"export_state_v{version:08d}"
        )

    def _changed_rows(
        self, spark: SparkSession, last: int, new: DataFrame
    ) -> DataFrame:
        """Diff the current tier against the exporter's OWN exported
        fingerprint (bucket → metric, one tiny row per bucket): the
        refresh garbage-collects superseded tier versions, so the
        exporter cannot rely on the old tier still existing — and the
        fingerprint also survives exporter restarts."""
        if last == 0:
            return new  # first export pushes the whole tier once
        old = spark.read.parquet(self._state_path(last))
        touched = rollup_diff(old, new, EXPORT_KEYS, self.metric).select(
            *EXPORT_KEYS
        )
        # removed buckets have no row in `new`; sinks keyed by
        # (path, ts) cannot express deletion — they simply stop
        # updating, which matches the reference's semantics
        return new.join(F.broadcast(touched), list(EXPORT_KEYS), "inner")

    def export_once(self, spark: SparkSession) -> dict:
        cur = self.job.checkpoint()["version"]
        last = self.exported_version()
        if cur == last:
            return {"from_version": last, "to_version": cur, "rows": 0}
        new = spark.read.parquet(self.job.rollup_path(cur))
        rows = self._changed_rows(spark, last, new).collect()
        if rows:
            self.sink(rows)
        # commit order: fingerprint, then offset (atomic tmp+rename) —
        # a crash anywhere before the offset flip replays this diff,
        # which the (path, ts)-keyed sink absorbs idempotently
        new.select(*EXPORT_KEYS, self.metric).write.mode(
            "overwrite"
        ).parquet(self._state_path(cur))
        tmp = self._offset_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": cur}, f)
        os.rename(tmp, self._offset_path())
        if last:
            import shutil

            shutil.rmtree(self._state_path(last), ignore_errors=True)
        return {"from_version": last, "to_version": cur, "rows": len(rows)}
