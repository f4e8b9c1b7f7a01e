"""Idempotent ingest: exactly-once tables from at-least-once delivery.

Reference analog: the reference re-reads its log files from scratch on
every run, so a re-delivered (duplicated) line simply appears twice and
double-counts (/root/reference/README.md:126-147 — the continuous mode
re-parses the whole file per scrape; there is no keyed dedup).  A
10^12-turn ingest cannot re-read; it must make re-delivered batches
idempotent at write time.  This module is the MERGE INTO analog for the
transcript key (conv_id, turn_idx): keep exactly one deterministic
winner per key.

Scale shape: the kernel is a ``groupBy(key).agg(max_by(row, version))``
— an ordinary hash aggregate with MAP-SIDE PARTIAL aggregation, so each
executor collapses its local duplicates before the one key shuffle
(plan-pinned by tests/test_upsert.py::test_upsert_plan_is_partial_agg).
The textbook alternative (row_number over a key window, keep rn=1) is
NOT a straw man on Spark 3.5+: WindowGroupLimit gives it the same
map-side duplicate collapse, and ``bench.py --upsert-leg`` measures the
two within noise of each other (1.02× at 57.6M stream rows).  The agg
kernel is shipped because it needs no total order at all — the window
path's reducer stage still sorts every surviving row per partition,
which is the piece that spills first on a hot-key partition — and
because an aggregate composes with partial pushdown everywhere a sort
does not.

Winner rule: greatest (ts, md5(text‖role‖tool)) — latest delivery
wins, with an md5 over the full payload as the deterministic tiebreak
for true same-timestamp duplicates (hashing text alone would leave
same-ts rows differing only in role/tool to an arbitrary max_by pick).
md5 is available verbatim in DuckDB, so the driver oracle states the
same rule (xxhash64 could not be cross-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ("conv_id", "turn_idx")


def version_key(ts_col: str = "ts"):
    """The total order that picks the winner among duplicates of one
    key: latest ts first, then md5 over the FULL payload (text, role,
    tool — unit-separator-joined, NULLs as '') so two same-ts
    duplicates differing in ANY column still have one deterministic
    winner.  DuckDB states the identical rule with chr(31)."""
    payload = F.concat_ws(
        "\x1f",
        F.coalesce(F.col("text"), F.lit("")),
        F.coalesce(F.col("role"), F.lit("")),
        F.coalesce(F.col("tool"), F.lit("")),
    )
    return F.struct(
        F.col(ts_col).alias("v_ts"),
        F.md5(payload).alias("v_tie"),
    )


def dedup_redelivered(
    df: DataFrame, keys: tuple[str, ...] = KEY
) -> DataFrame:
    """Collapse at-least-once delivery to exactly-once: one row per
    key, the greatest ``version_key`` winning.  Column order of the
    input is preserved."""
    payload = [c for c in df.columns if c not in keys]
    row = F.struct(*[F.col(c) for c in payload])
    out = df.groupBy(*keys).agg(
        F.max_by(row, version_key()).alias("_row")
    )
    return out.select(
        *[
            F.col(c) if c in keys else F.col(f"_row.{c}").alias(c)
            for c in df.columns
        ]
    )


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: tuple[str, ...] = KEY
) -> DataFrame:
    """MERGE INTO analog: apply an update batch to a target table —
    new keys insert, existing keys take the batch's row when its
    version_key is greater (late or replayed updates older than the
    stored row lose, so replaying an old batch is a no-op).  Same
    kernel as dedup_redelivered: union + one partial-aggregated hash
    agg, no join and no window sort."""
    return dedup_redelivered(
        target.unionByName(updates.select(*target.columns)), keys
    )
