"""Deterministic sampling for training-data pipelines.

A 100 TB training-set build cannot use ``df.sample`` (seeded per
partition ⇒ the kept set changes with partitioning/cluster size).
Hash-gate sampling is pure map-side (no shuffle, no state), keeps the
same rows on every run at any parallelism, and is reproducible in the
DuckDB oracle because the hash is md5-derived (see dedup.md5_long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
