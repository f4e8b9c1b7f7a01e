"""Frequent-items (heavy hitters) with bounded-memory mergeable
summaries: batched Misra–Gries candidate generation + exact verify.

The one-pass exact ``groupBy(col).count()`` is fine when the key space
fits a shuffle; at 10^12 turns with an unbounded token space the
aggregate state itself is the problem.  This operator is the
candidate-then-verify pattern the dedup/ANN stack uses everywhere:

1. **Candidates** — one ``mapInPandas`` pass keeps a Misra–Gries
   summary of at most ``m = floor(1/θ)+1`` counters per partition
   (vectorized: pandas ``Series.add`` per Arrow batch, then one
   ``nlargest(m+1)`` truncation that subtracts the (m+1)-th largest
   count and drops the non-positive — the standard batched MG step;
   cumulative subtraction ≤ N_p/(m+1) < θ·N_p, so every item with
   partition frequency ≥ θ·N_p survives its partition's summary, and
   any item with GLOBAL frequency ≥ θ·N beats θ on at least one
   partition by pigeonhole).  Summary size is O(partitions · 1/θ) —
   constant per partition, independent of cardinality.
2. **Verify** — exact recount of the candidate set only (broadcast
   semi-join, map-side combinable count), filtered by the exact
   integer test ``cnt · den ≥ num · N``.  The output is therefore
   EXACT and partitioning-independent: phase 1 only decides which keys
   get recounted, and it provably never drops a true heavy hitter.

Reference analog: none — request_log_analyzer has exactly one global
group (src/analyzer/mod.rs); frequent-items over unbounded key spaces
is part of the training-data-pipeline surface this engine adds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Truncation slack: shrink only when the summary exceeds slack·m, so
# the O(n log m) nlargest runs once per ~(slack-1)·m new keys, not per
# batch.  Pure performance knob — the MG bound only needs ≤ m counters
# at shrink time, which the subtract-and-drop step guarantees.
_MG_SLACK = 4


def _mg_candidates(df: DataFrame, col: str, m: int) -> DataFrame:
    out_schema = f"{col} string, cnt_lower long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            # fill_value promotes to float64 — force back to exact int64
            acc = acc.add(pdf[col].value_counts(), fill_value=0).astype("int64")
            if len(acc) > _MG_SLACK * m:
                d = acc.nlargest(m + 1).iloc[-1]
                acc = acc[acc > d] - d
        if len(acc) > m:
            d = acc.nlargest(m + 1).iloc[-1]
            acc = acc[acc > d] - d
        yield pd.DataFrame(
            {col: acc.index.astype(str), "cnt_lower": acc.values.astype("int64")}
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, out_schema
    )


def heavy_hitters(
    df: DataFrame, col: str, num: int, den: int
) -> DataFrame:
    """Items of ``df[col]`` whose exact frequency is ≥ (num/den)·N,
    with their exact counts — computed without ever building the full
    frequency table.  θ = num/den as an exact rational; the final
    filter is integer arithmetic, so no float boundary can flip a row.

    Returns (col, cnt, share) — share is the one double column,
    derived by a single IEEE division from two exact longs.
    """
    if not (0 < num < den):
        raise ValueError("threshold num/den must be in (0, 1)")
    m = den // num + 1
    keyed = df.select(F.col(col).cast("string").alias(col)).where(
        F.col(col).isNotNull()
    )
    cands = _mg_candidates(keyed, col, m).select(col).distinct()
    counts = keyed.join(F.broadcast(cands), col).groupBy(col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = keyed.agg(F.count(F.lit(1)).alias("_n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(den) >= F.lit(num) * F.col("_n"))
        .select(
            col,
            "cnt",
            (F.col("cnt").cast("double") / F.col("_n").cast("double")).alias(
                "share"
            ),
        )
    )
