"""Snapshot store + checkpoint: Iceberg-semantics table log over parquet.

The sandbox ships no Iceberg runtime jar, so this module provides the
same contract the production engine would get from an Iceberg catalog —
append-only snapshots with ids, parent links, per-file (per-partition)
lineage and metrics manifests, time-travel reads, and INCREMENTAL reads
between two snapshot ids (the driver of the continuous-aggregate
refresh, replacing the reference's recompute-per-scrape,
/root/reference/src/http_handler/mod.rs:16-29).  Swapping in a real
Iceberg table means replacing SnapshotStore with
``spark.read.format("iceberg")`` + ``option("start-snapshot-id", …)`` —
the IncrementalRollup logic (incremental.py) is unchanged.

Layout:
    <root>/data/<snapshot>/<files>.parquet     append-only data files
    <root>/_manifests/v{N:08d}.json            one manifest per snapshot

Manifests are deterministic (no wall clock): snapshot ids are dense
integers; lineage records per-file row counts and ts min/max harvested
from parquet footers (the analog of Iceberg's column stats, used for
file skipping).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotExpiredError(RuntimeError):
    """A read requested snapshots whose data files were expired."""


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ------------------------------------------------------------ write

    def append(self, df: DataFrame) -> int:
        """Append rows as a new snapshot; returns the new snapshot id.

        The write forces TIMESTAMP_MICROS: Spark's legacy INT96
        timestamp encoding writes NO parquet min/max stats, which
        silently left every manifest's ts_min/ts_max lineage as None —
        the column stats this module exists to harvest (file skipping,
        lateness profiling) require the annotated int64 encoding.
        """
        sid = self.current_snapshot_id() + 1
        out_dir = os.path.join(self.root, "data", f"s{sid:08d}")
        spark = df.sparkSession
        key = "spark.sql.parquet.outputTimestampType"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "TIMESTAMP_MICROS")
        try:
            df.write.mode("overwrite").parquet(out_dir)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        files = sorted(
            os.path.relpath(p, self.root)
            for p in glob.glob(os.path.join(out_dir, "*.parquet"))
        )
        manifest = {
            "snapshot_id": sid,
            "parent_id": sid - 1 if sid > 1 else None,
            "files": files,
            "lineage": self._file_stats(files),
            "metrics": {
                "added_files": len(files),
                "added_rows": sum(
                    s["rows"] for s in self._file_stats(files).values()
                ),
            },
        }
        tmp = os.path.join(self.root, "_manifests", f".v{sid:08d}.json.tmp")
        final = os.path.join(self.root, "_manifests", f"v{sid:08d}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.rename(tmp, final)  # atomic commit — crash before this = no-op
        return sid

    def _file_stats(self, files: list[str]) -> dict:
        import pyarrow.parquet as pq

        stats = {}
        for rel in files:
            md = pq.ParquetFile(os.path.join(self.root, rel)).metadata
            ts_min = ts_max = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "ts" and col.statistics:
                        lo, hi = col.statistics.min, col.statistics.max
                        ts_min = lo if ts_min is None else min(ts_min, lo)
                        ts_max = hi if ts_max is None else max(ts_max, hi)
            stats[rel] = {
                "rows": md.num_rows,
                "ts_min": str(ts_min),
                "ts_max": str(ts_max),
            }
        return stats

    # ------------------------------------------------------------- read

    def manifests(self) -> list[dict]:
        out = []
        for p in sorted(glob.glob(os.path.join(self.root, "_manifests", "v*.json"))):
            with open(p) as f:
                out.append(json.load(f))
        return out

    def current_snapshot_id(self) -> int:
        ms = self.manifests()
        return ms[-1]["snapshot_id"] if ms else 0

    def max_expired_id(self) -> int:
        return max(
            (m["snapshot_id"] for m in self.manifests() if m.get("expired")),
            default=0,
        )

    def expire_snapshots(self, up_to: int, applied_watermark: int) -> dict:
        """Iceberg ``expire_snapshots`` analog, gated on the refresh
        watermark: data files of snapshots ≤ ``up_to`` are deleted ONLY
        if the incremental job has already applied them
        (``applied_watermark`` = IncrementalRollup.checkpoint()
        ["snapshot_id"]) — their aggregate contribution lives on in the
        rollup tiers, so the raw bytes are storage the 10^12-turn
        deployment must be able to reclaim.  Each expired manifest is
        rewritten in place as a TOMBSTONE (files emptied, lineage and
        metrics kept, ``expired`` flag set) with the same atomic
        tmp+rename commit as append; resume/refresh and reads strictly
        after the expired range keep working, while time-travel into it
        fails fast (SnapshotExpiredError) instead of silently returning
        partial data."""
        if up_to > applied_watermark:
            raise ValueError(
                f"refusing to expire snapshot {up_to}: refresh watermark "
                f"is {applied_watermark} — unapplied raw data would be lost"
            )
        removed_files = removed_rows = expired = 0
        for m in self.manifests():
            sid = m["snapshot_id"]
            if sid > up_to or m.get("expired"):
                continue
            # Commit order (round-6, r5 ADVICE): tombstone the manifest
            # FIRST (atomic tmp+rename), THEN delete the data files.  A
            # crash mid-loop then leaves only harmless orphan files that
            # a re-run reclaims; the old order (delete, then commit)
            # could leave a live manifest pointing at deleted parquet,
            # turning valid-range reads into missing-file errors.
            data_files = list(m["files"])
            removed_rows += sum(s["rows"] for s in m["lineage"].values())
            m["expired"] = True
            m["files"] = []
            tmp = os.path.join(
                self.root, "_manifests", f".v{sid:08d}.json.tmp"
            )
            final = os.path.join(self.root, "_manifests", f"v{sid:08d}.json")
            with open(tmp, "w") as f:
                json.dump(m, f, indent=1, sort_keys=True)
            os.rename(tmp, final)
            for rel in data_files:
                p = os.path.join(self.root, rel)
                if os.path.exists(p):
                    os.remove(p)
                removed_files += 1
            shutil.rmtree(
                os.path.join(self.root, "data", f"s{sid:08d}"),
                ignore_errors=True,
            )
            expired += 1
        return {
            "expired_snapshots": expired,
            "removed_files": removed_files,
            "removed_rows": removed_rows,
        }

    def _files_between(self, since: int, until: int | None) -> list[str]:
        exp = self.max_expired_id()
        if since < exp:
            raise SnapshotExpiredError(
                f"snapshots ≤ {exp} are expired; cannot read range "
                f"({since}, {until}] — the rollup tiers carry that "
                "history"
            )
        files = []
        for m in self.manifests():
            if m["snapshot_id"] > since and (
                until is None or m["snapshot_id"] <= until
            ):
                files.extend(m["files"])
        return files

    def read(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        """Full-table read (optionally time-traveled to a snapshot)."""
        files = self._files_between(0, as_of)
        return self._read_files(spark, files)

    def incremental(
        self, spark: SparkSession, since: int, until: int | None = None
    ) -> DataFrame:
        """Rows appended in snapshots (since, until] — the Iceberg
        incremental-scan analog."""
        return self._read_files(spark, self._files_between(since, until))

    def _read_files(self, spark: SparkSession, files: list[str]) -> DataFrame:
        if not files:
            from .schema import TRANSCRIPT_SCHEMA

            return spark.createDataFrame([], TRANSCRIPT_SCHEMA)
        return spark.read.parquet(*[os.path.join(self.root, f) for f in files])
