"""fx_random (FIXTURES.md §2): the seeded generator port (uniform
deltas, ~1/1000 errors, 1% missing turns, ~1/1000 damaged rows) is
rolled up by the engine and cross-checked against DuckDB running the
equivalent SQL on the same parquet — end-to-end divergence detector
for the full clean → deltas → rollup pipeline on adversarial data."""

from __future__ import annotations

import duckdb
import pytest

from rollup_engine.deltas import with_deltas
from rollup_engine.generate import synthetic_transcripts
from rollup_engine.hist_rollup import hist_rollup
from rollup_engine.rollup import rollup
from rollup_engine.transcripts import clean

from .oracle_harness import compare

ORACLE_SQL = """
WITH cleaned AS (
    SELECT * FROM t
    WHERE ts IS NOT NULL AND conv_id IS NOT NULL
      AND turn_idx IS NOT NULL AND turn_idx >= 0
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts ASC
    ) = 1
),
d AS (
    SELECT *,
        (epoch_us(ts) - epoch_us(LAG(ts) OVER
            (PARTITION BY conv_id ORDER BY turn_idx))) // 1000 AS delta_ms
    FROM cleaned
)
SELECT date_trunc('minute', ts) AS bucket_start,
    COUNT(delta_ms) AS turn_count,
    MIN(delta_ms) AS lat_min_ms,
    MAX(delta_ms) AS lat_max_ms,
    CAST(FLOOR(AVG(delta_ms)) AS BIGINT) AS lat_avg_ms,
    CAST(quantile_disc(delta_ms, 0.5) AS BIGINT) AS lat_p50_ms,
    CAST(quantile_disc(delta_ms, 0.9) AS BIGINT) AS lat_p90_ms,
    CAST(quantile_disc(delta_ms, 0.99) AS BIGINT) AS lat_p99_ms,
    SUM(delta_ms) AS lat_sum_ms,
    ROUND(AVG(CASE WHEN tool LIKE 'error:4%' THEN 1.0 ELSE 0.0 END), 4)
        AS err4xx_rate,
    ROUND(AVG(CASE WHEN tool LIKE 'error:5%' THEN 1.0 ELSE 0.0 END), 4)
        AS err5xx_rate
FROM d WHERE delta_ms IS NOT NULL
GROUP BY 1
"""


@pytest.mark.parametrize("seed", [42, 7])
def test_random_transcripts_match_duckdb(spark, tmp_path, seed):
    raw = synthetic_transcripts(
        spark,
        n_convs=120,
        turns_per_conv=40,
        hot_convs=2,
        hot_factor=10,
        seed=seed,
        damaged_rate=0.01,
        missing_rate=0.05,
        error_rate=0.02,
    )
    path = str(tmp_path / f"t{seed}")
    raw.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)

    spark_out = rollup(with_deltas(clean(stored)), "minute").drop("tier")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    oracle = con.sql(ORACLE_SQL).df()
    problems = compare(spark_out, oracle)
    assert not problems, problems

    # the all-JVM hist path must agree on the same data too
    hist_out = hist_rollup(with_deltas(clean(stored)), "minute").select(
        spark_out.columns
    )
    problems = compare(hist_out, oracle)
    assert not problems, problems