"""Partitioned transcript storage — the Iceberg layout analog.

FIXTURES.md §1 specifies Iceberg partitioning ``days(ts), bucket(16,
conv_id)``.  Without an Iceberg runtime in this sandbox, the same
physical layout (and the same pruning behavior) comes from parquet
directory partitioning on derived columns:

    <root>/ds=YYYY-MM-DD/conv_bucket=K/part-*.parquet

- ``ds`` partition column ⇒ a ``ts`` range predicate prunes whole date
  directories (pinned by tests/test_plans.py::test_partition_pruning).
- ``conv_bucket = pmod(xxhash64(conv_id), n_buckets)`` co-locates each
  conversation's turns, so per-conversation windows read few files and
  the conv_id exchange moves less data.

Swapping to real Iceberg = ``df.writeTo(table).partitionedBy(
days(col("ts")), bucket(16, col("conv_id")))`` — readers unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16


def write_partitioned(
    df: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS, mode: str = "overwrite"
) -> None:
    out = df.withColumns(
        {
            "ds": F.date_format(F.col("ts"), "yyyy-MM-dd"),
            "conv_bucket": F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)),
        }
    )
    out.write.mode(mode).partitionBy("ds", "conv_bucket").parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back the canonical transcript columns (partition columns
    dropped; they exist to prune, not to query)."""
    return spark.read.parquet(path).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def write_bucketed_table(
    df: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """Hash-BUCKETED table on conv_id (Spark bucketing, not directory
    partitioning): a scan of this table reports
    HashPartitioning(conv_id), so the per-conversation window in
    clean()/with_deltas() needs NO exchange — the raw pass's one big
    shuffle disappears at read time, paid once at write time instead.
    This is the parquet/metastore analog of Iceberg's
    ``bucket(N, conv_id)`` write distribution; pinned by
    tests/test_plans.py::test_bucketed_table_window_needs_no_exchange.
    """
    (
        df.repartition(n_buckets, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .mode("overwrite")
        .saveAsTable(table)
    )
