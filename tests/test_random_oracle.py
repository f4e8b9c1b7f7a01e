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

def _sparse_minutes(spark, seed, n=240, keep=0.6, max_cnt=50):
    """Random SPARSE per-minute series (gaps!) — the RANGE-frame
    evaluators' semantics on missing minutes is exactly what the
    mostly-dense sf gate data under-exercises."""
    import datetime as dt

    import numpy as np

    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            base + dt.timedelta(minutes=m),
            int(rng.randint(1, max_cnt)),
            int(rng.randint(0, 10)),
        )
        for m in range(n)
        if rng.random_sample() < keep
    ]
    return rows, spark.createDataFrame(
        rows, "bucket_start timestamp, cnt long, err long"
    )


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_burn_windows_on_sparse_series_vs_pandas(spark, seed):
    """burn_from_minutes trailing sums == an independent pandas
    time-window reference on gappy series (empty minutes contribute
    nothing; the frame is keyed on TIME, not row position)."""
    from rollup_engine.tsops import burn_from_minutes

    rows, df = _sparse_minutes(spark, seed)
    got = {
        r.bucket_start: (r.cnt_long, r.err_long, r.cnt_short, r.err_short)
        for r in burn_from_minutes(df).collect()
    }
    assert len(got) == len(rows)
    import datetime as dt

    for ts, cnt, err in rows:
        lo_l = ts - dt.timedelta(minutes=59)
        lo_s = ts - dt.timedelta(minutes=4)
        want_l = [(c, e) for t2, c, e in rows if lo_l <= t2 <= ts]
        want_s = [(c, e) for t2, c, e in rows if lo_s <= t2 <= ts]
        assert got[ts] == (
            sum(c for c, _ in want_l),
            sum(e for _, e in want_l),
            sum(c for c, _ in want_s),
            sum(e for _, e in want_s),
        ), ts


@pytest.mark.parametrize("seed", [3, 11])
def test_trend_on_sparse_series_vs_numpy(spark, seed):
    """trend_from_minutes slope == numpy polyfit over the same
    time-window samples on gappy series (within rounding to 4dp)."""
    import datetime as dt

    import numpy as np

    from rollup_engine.tsops import trend_from_minutes

    rows, df = _sparse_minutes(spark, seed, n=120)
    got = {r.bucket_start: r.slope_per_min for r in trend_from_minutes(df).collect()}
    for ts, _cnt, _err in rows:
        lo = ts - dt.timedelta(minutes=29)
        win = [(t2, c) for t2, c, _ in rows if lo <= t2 <= ts]
        if len(win) < 2:
            assert got[ts] is None
            continue
        t = np.array([(t2 - rows[0][0]).total_seconds() / 60 for t2, _ in win])
        y = np.array([c for _, c in win], dtype=float)
        slope = np.polyfit(t, y, 1)[0]
        assert got[ts] is not None
        assert abs(got[ts] - slope) < 2e-4, (ts, got[ts], slope)


@pytest.mark.parametrize("seed", [5])
def test_changes_resets_on_sparse_series_vs_python(spark, seed):
    """changes/resets on gappy series: transitions are PAIRWISE over
    the ordered samples (PromQL semantics), while the counting window
    is time-keyed."""
    import datetime as dt

    from rollup_engine.tsops import changes_and_resets

    rows, df = _sparse_minutes(spark, seed, n=120, keep=0.5, max_cnt=5)
    got = {
        r.bucket_start: (r.n_changes, r.n_resets)
        for r in changes_and_resets(df).collect()
    }
    flags = []
    for i, (ts, c, _e) in enumerate(rows):
        if i == 0:
            flags.append((ts, 0, 0))
        else:
            prev = rows[i - 1][1]
            flags.append((ts, int(c != prev), int(c < prev)))
    for ts, _c, _e in rows:
        lo = ts - dt.timedelta(minutes=29)
        want = [(ch, rs) for t2, ch, rs in flags if lo <= t2 <= ts]
        assert got[ts] == (
            sum(ch for ch, _ in want),
            sum(rs for _, rs in want),
        ), ts
