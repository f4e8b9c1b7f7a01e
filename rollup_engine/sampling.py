"""Deterministic sampling for training-data pipelines.

A 100 TB training-set build cannot use ``df.sample`` (seeded per
partition ⇒ the kept set changes with partitioning/cluster size).
Hash-gate sampling is pure map-side (no shuffle, no state), keeps the
same rows on every run at any parallelism, and is reproducible in the
DuckDB oracle because the hash is md5-derived (see dedup.md5_long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_long


def deterministic_sample(
    df: DataFrame, key_col: str, rate_pct: int, salt: str = "sample"
) -> DataFrame:
    """Keep rows where md5(salt ‖ key) mod 100 < rate_pct.

    ``salt`` decorrelates successive samples over the same keys (e.g.
    a 40% training cut and a 1% eval cut that must not overlap can use
    disjoint residue ranges of ONE salt instead).
    """
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be in [0, 100]")
    h = md5_long(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return df.where(F.pmod(h, F.lit(100)) < rate_pct)


def capped_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group cap: at most ``k`` rows per group, the
    k whose md5(salt ‖ id) ranks smallest — a uniform-without-
    replacement sample per group (source balancing: "no corpus
    contributes more than k documents"), independent of partitioning
    and identical on re-runs, unlike sampleBy.

    Scale shape: ``row_number() ≤ k`` is planned as WindowGroupLimit —
    every task keeps only its LOCAL top-k per group before the group
    exchange, so the shuffle carries O(groups × k) rows, not the
    corpus (plan-pinned by test_capped_sample_plan_group_limit).  The
    id tiebreak makes the order total even under md5 collisions.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def grouped_split(
    df: DataFrame,
    group_col: str,
    splits: dict[str, int],
    salt: str = "split",
) -> DataFrame:
    """Leakage-free train/validation/test assignment: EVERY row of a
    group lands in the same split, decided by md5(salt ‖ group) mod 100
    against cumulative percentage bands.  The group is the leakage
    unit (conversation, document cluster, user) — a row-level split
    would leak near-identical rows of one conversation across the
    train/test boundary, the classic contamination bug a training
    pipeline must rule out by construction.

    Pure map-side (no shuffle, no join, no state): the assignment is a
    deterministic function of the group key alone, so it is identical
    at any parallelism, on re-runs, and on late-arriving rows of a
    known group — and the DuckDB oracle reproduces it bit for bit
    (md5-derived hash, dedup.md5_long).

    ``splits`` maps name → percentage, summing to 100; bands are
    assigned in the given order (dict order is significant and part of
    the contract: {"train": 80, "val": 10, "test": 10} puts residues
    [0,80) / [80,90) / [90,100)).  Adds a ``split`` column.
    """
    if sum(splits.values()) != 100 or any(v <= 0 for v in splits.values()):
        raise ValueError("split percentages must be positive and sum to 100")
    h = F.pmod(
        md5_long(F.concat(F.lit(salt), F.col(group_col).cast("string"))),
        F.lit(100),
    )
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = h < F.lit(lo + pct)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += pct
    return df.withColumn("split", expr)
