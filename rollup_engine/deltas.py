"""Inter-turn latency extraction.

The reference's unit of analysis is the RequestResponsePair and its
response-time measure (/root/reference/src/request_response_matcher/
mod.rs:25-76, /root/reference/src/analyzer/mod.rs:18-32).  Transcripts
give an explicit total order per conversation — ``(conv_id, turn_idx)``
— so the stateful FIFO pair-matcher join collapses into a window ``lag``:
no shuffle join, one exchange on ``conv_id``, deterministic regardless of
input file order (fixing the reference's stream-order dependence,
documented divergence per SURVEY.md §7.4).

Scale note: the window shuffles on ``conv_id`` only.  Hot conversations
(millions of turns in one conv) skew that exchange — ``salting.py``
provides the chunked two-phase variant for the aggregate path; the raw
delta stream itself is naturally bounded per conv by retention chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Milliseconds between a turn and the previous turn of the same
# conversation; integer (floor) ms like the reference's Duration::
# num_milliseconds (/root/reference/src/log_parser/log_events.rs:91-103).
DELTA_COL = "delta_ms"


def with_deltas(df: DataFrame, keep_first_turn: bool = False) -> DataFrame:
    """Append ``delta_ms`` = ts − lag(ts) per conversation.

    The first turn of a conversation has no predecessor → null delta
    (the analog of an unmatched request, dropped by the reference's
    inner pair-join) and is filtered out unless ``keep_first_turn``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = df.withColumn(
        DELTA_COL,
        F.floor(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
            / F.lit(1000)
        ).cast("long"),
    )
    if keep_first_turn:
        return out
    return out.where(F.col(DELTA_COL).isNotNull())


# Oracle-side equivalent (DuckDB), over a `t` relation in transcript shape.
DELTAS_SQL = """
    SELECT *,
        (epoch_us(ts) - epoch_us(LAG(ts) OVER
            (PARTITION BY conv_id ORDER BY turn_idx))) // 1000 AS delta_ms
    FROM t
"""
