"""Physical-plan assertions: the optimizations we rely on at 100 TB
must actually appear in the plan, not just in docstrings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rollup_engine.deltas import with_deltas
from rollup_engine.rollup import rollup
from rollup_engine.transcripts import from_events, load_events

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    """A ts predicate on the raw scan must appear in PushedFilters —
    at scale this is partition pruning + row-group skipping."""
    ev = load_events(spark, SF).where(F.col("ts") >= "2024-01-15")
    plan = _plan(ev)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts" in plan


def test_column_pruning_drops_text(spark):
    """The minute rollup never touches the text payload (props) —
    ReadSchema must exclude it (at 100 TB text dominates bytes)."""
    r = rollup(with_deltas(from_events(spark, SF)), "minute")
    plan = _plan(r)
    read_schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema_lines
    assert all("props" not in l for l in read_schema_lines)


def test_partial_aggregation_present(spark):
    """count/min/max/avg must run as partial (map-side) + final hash
    aggregation — the distributed analog of the reference's streaming
    accumulator."""
    r = rollup(with_deltas(from_events(spark, SF)), "minute")
    plan = _plan(r)
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "partial_min" in plan


def test_single_exchange_for_clean_plus_deltas(spark):
    """clean() and with_deltas() share one hash exchange on conv_id
    (the dedupe window was deliberately re-keyed to make this true)."""
    from rollup_engine.generate import synthetic_transcripts
    from rollup_engine.transcripts import clean

    t = synthetic_transcripts(spark, n_convs=10, turns_per_conv=5)
    # count exchanges between the scan and the delta projection
    d = with_deltas(clean(t.select("conv_id", "turn_idx", "role", "text", "tool", "ts")))
    plan = _plan(d)
    n_exchanges = plan.count("Exchange hashpartitioning")
    # generator itself uses one window (cumsum) on conv_id; clean+lag
    # must NOT add more than one further exchange on top
    assert n_exchanges <= 2, plan


def test_gapfill_spine_join_is_small_side(spark):
    from rollup_engine.gapfill import gapfill

    g = gapfill(rollup(with_deltas(from_events(spark, SF)), "minute"), "minute")
    plan = _plan(g)
    assert "Join" in plan  # spine left join exists


def test_partition_pruning_on_ds(spark, tmp_path):
    """The days(ts)-analog layout must prune date partitions for ts
    range predicates — the 100 TB table's first line of defense."""
    from rollup_engine.generate import synthetic_transcripts
    from rollup_engine.ingest import read_partitioned, write_partitioned

    t = synthetic_transcripts(spark, n_convs=40, turns_per_conv=30)
    path = str(tmp_path / "part")
    write_partitioned(t.where("ts is not null"), path, n_buckets=4)
    df = spark.read.parquet(path).where(F.col("ds") == "2024-01-01")
    plan = _plan(df)
    # partition filter present, and the scan's file selection is pruned
    assert "PartitionFilters" in plan and "ds" in plan
    assert df.count() > 0
    # round-trip columns intact
    assert set(read_partitioned(spark, path).columns) == {
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    }


def test_vectorized_scan_and_two_phase_agg(spark):
    """Parquet scan must be the vectorized (Batched) reader, and the
    percentile sketch aggregate must still split partial/final around
    the exchange (ObjectHashAggregate pair)."""
    r = rollup(with_deltas(from_events(spark, SF)), "minute")
    plan = _plan(r)
    assert "Batched: true" in plan
    agg_nodes = plan.count("HashAggregate")
    exchanges = plan.count("Exchange")
    assert agg_nodes >= 2 and exchanges >= 2

def test_deterministic_sample_is_map_side(spark):
    """Hash-gate sampling must add NO exchange — a pure scan-side
    filter (df.sample would be the same shape, but is partition-seeded;
    the hash gate also reaches the scan as a data filter)."""
    from rollup_engine.sampling import deterministic_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(deterministic_sample(docs, "doc_id", 40))
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_narrow_projection_prunes_scan(spark):
    """The bench/engine hot path reads exactly four physical columns:
    conv_id, turn_idx, ts, tool (flags derive from tool at projection;
    text/role never leave the parquet footer)."""
    from rollup_engine.deltas import with_deltas
    from rollup_engine.generate import synthetic_transcripts
    from rollup_engine.hist_rollup import narrow_for_rollup
    from rollup_engine.transcripts import clean

    t = synthetic_transcripts(spark, n_convs=10, turns_per_conv=5)
    import tempfile

    d = tempfile.mkdtemp(prefix="narrow_plan_")
    t.write.mode("overwrite").parquet(d)
    raw = spark.read.parquet(d)
    compress = (
        with_deltas(clean(narrow_for_rollup(raw)))
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("b"), "delta_ms")
        .count()
    )
    plan = _plan(compress)
    schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schema_lines
    for l in schema_lines:
        assert "text" not in l and "role" not in l


def test_bucketed_table_window_needs_no_exchange(spark):
    """The 100 TB killer optimization: over a conv_id-BUCKETED table,
    clean() + with_deltas() run with ZERO exchanges — the scan itself
    satisfies the window's ClusteredDistribution(conv_id).  (Over plain
    parquet the same plan has one hash exchange.)"""
    from rollup_engine.generate import synthetic_transcripts
    from rollup_engine.ingest import write_bucketed_table
    from rollup_engine.transcripts import clean

    t = synthetic_transcripts(spark, n_convs=30, turns_per_conv=10)
    write_bucketed_table(t, "bucketed_turns_test", n_buckets=4)
    try:
        bt = spark.table("bucketed_turns_test")
        d = with_deltas(clean(bt))
        plan = _plan(d)
        assert "Exchange" not in plan, plan
        assert "Window" in plan
        # parity: same rows as the unbucketed path
        base = with_deltas(clean(t))
        assert d.count() == base.count()
        assert (
            d.selectExpr("sum(delta_ms) s").first().s
            == base.selectExpr("sum(delta_ms) s").first().s
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_turns_test")


def test_hist_plan_build_runs_no_jobs(spark):
    """Plan construction must be FREE: building the minute tier, both
    cascades, and a trailing-window merge runs zero Spark jobs (round-2
    verdict: the eager localCheckpoint + isEmpty/first probes made plan
    build execute upstream jobs — the wrong default shape at 100×).
    Jobs triggered while the probe job group is active would be tagged
    with it; the group must stay empty."""
    from rollup_engine.hist_rollup import hist_cascade, hist_rollup
    from rollup_engine.serve import trailing_result  # noqa: F401 (import ok)

    sc = spark.sparkContext
    d = with_deltas(from_events(spark, SF))
    sc.setJobGroup("plan-build-probe", "hist plans must be lazy")
    try:
        minute = hist_rollup(d, "minute")
        hour = hist_cascade(minute, "hour")
        day = hist_cascade(hour, "day")
        for df in (minute, hour, day):
            _ = df.columns          # force analysis
            _ = _plan(df)           # force full physical planning
    finally:
        sc.setJobGroup("idle", "")
    jobs = sc.statusTracker().getJobIdsForGroup("plan-build-probe")
    assert list(jobs) == [], f"plan build ran Spark jobs: {list(jobs)}"


def test_hist_rollup_no_python_no_lineage_truncation(spark):
    """The hist tier + cascade path stays entirely JVM-side (no Arrow
    stage, no UDF) and keeps full lineage (no checkpointed LogicalRDD
    scan — executor loss must be recoverable on a real cluster)."""
    from rollup_engine.hist_rollup import hist_cascade, hist_rollup

    d = with_deltas(from_events(spark, SF))
    plan = _plan(hist_cascade(hist_rollup(d, "minute"), "hour"))
    for marker in ("FlatMapGroupsInPandas", "ArrowEvalPython", "BatchEvalPython",
                   "Scan ExistingRDD"):
        assert marker not in plan, f"unexpected {marker} in hist plan"


def test_cube_rollup_single_expand_single_exchange(spark):
    """CUBE(role, day) must compile to ONE Expand feeding a partial +
    final hash aggregate around ONE exchange — all four grouping sets
    in a single scan, never a union of per-set scans."""
    import re

    d = with_deltas(from_events(spark, SF)).withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    out = d.cube("role", "day").agg(
        F.count("delta_ms").alias("turn_count"),
        (F.grouping("role") * 2 + F.grouping("day")).cast("int").alias("gid"),
    )
    plan = _plan(out)
    assert len(re.findall(r"^\(\d+\) Expand", plan, re.M)) == 1, plan
    # exchanges: ONE shared transcript window exchange (row_number and
    # lag both key on conv_id — round-5 single-exchange fix) plus
    # exactly ONE for the cube aggregation
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 2, plan
    # final agg ← exchange ← partial agg ← expand, adjacent in the tree
    simple = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert re.search(
        r"HashAggregate[^\n]*\n[^\n]*Exchange[^\n]*\n[^\n]*HashAggregate"
        r"[^\n]*\n[^\n]*Expand",
        simple,
    ), simple


def test_pivot_single_pass(spark):
    """pivot(role, pinned values) must compile to ONE scan and ONE
    aggregation exchange (conditional aggregates), not a scan or a
    shuffle per pivot value."""
    import re

    d = with_deltas(from_events(spark, SF)).withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    out = d.groupBy("day").pivot("role", ["click", "view"]).agg(
        F.count("delta_ms").alias("cnt")
    )
    plan = _plan(out)
    scans = len(re.findall(r"FileScan parquet|^\(\d+\) Scan parquet", plan, re.M))
    assert scans == 1, plan
    # Catalyst compiles pivot to (day, role) partial+final count, then a
    # pivotfirst aggregate on day: 2 agg exchanges + the ONE shared
    # transcript-window exchange — constant in pivot values, one pass.
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 3, plan
    assert "pivotfirst" in plan, plan


def test_events_deltas_fused_matches_composition(spark):
    """Round-6: the fused events→deltas pipeline (row_number AND lag in
    ONE window over (conv_id, ts, event_id)) must be row-identical to
    the generic with_deltas(from_events(...)) composition, and its plan
    must contain exactly ONE Sort and ONE Window node (the composition
    pays a second sort by turn_idx and a second Window pass)."""
    import re

    from rollup_engine.transcripts import events_deltas

    fused = events_deltas(spark, SF)
    composed = with_deltas(from_events(spark, SF))
    assert fused.columns == composed.columns
    assert fused.schema == composed.schema
    assert fused.exceptAll(composed).count() == 0
    assert composed.exceptAll(fused).count() == 0

    plan = _plan(fused)
    assert len(re.findall(r"^\(\d+\) Sort", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    # keep_first_turn variant too (conv_profile input)
    fused_all = events_deltas(spark, SF, keep_first_turn=True)
    composed_all = with_deltas(from_events(spark, SF), keep_first_turn=True)
    assert fused_all.exceptAll(composed_all).count() == 0
    assert composed_all.exceptAll(fused_all).count() == 0


def test_events_deltas_filtered_matches_composition(spark):
    """Round-6: the filter-between-the-windows pipeline (turn_idx over
    ALL events, deltas over the SURVIVORS) must match the generic
    composition row-for-row while planning only ONE Sort — the lag
    window reorders by the same (ts, event_id) carrier the first sort
    established, so the filter costs no re-sort."""
    import re

    from rollup_engine import filters as flt
    from rollup_engine.queries import FILTER_MINUTES, FILTER_NOW
    from rollup_engine.transcripts import events_deltas_filtered

    cond = flt.conditions(
        exclude=["signup"], now=FILTER_NOW, latest_minutes=FILTER_MINUTES
    )
    fused = events_deltas_filtered(spark, SF, cond)
    composed = with_deltas(from_events(spark, SF).where(cond))
    assert fused.columns == composed.columns
    assert fused.exceptAll(composed).count() == 0
    assert composed.exceptAll(fused).count() == 0
    plan = _plan(fused)
    assert len(re.findall(r"^\(\d+\) Sort", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_fan_out_is_noop_on_multi_split_input(spark, tmp_path):
    """Round-6: fan_out must repartition a single-split scan to the
    session's shuffle parallelism and leave an already-parallel scan
    untouched (the 100 TB no-op guarantee)."""
    from rollup_engine.fanout import fan_out, scan_splits

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert scan_splits(docs) == 1
    fanned = fan_out(docs, "doc_id")
    assert fanned.rdd.getNumPartitions() == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert fanned.count() == docs.count()

    many = spark.range(0, 1000, 1, 64).withColumn("doc_id", F.col("id"))
    assert fan_out(many, "doc_id") is many  # already-parallel: no-op


def test_from_events_single_exchange(spark):
    """The events→transcripts mapping window and the downstream delta
    window must share ONE conv exchange (the gate/headline input path;
    a mis-keyed mapping window silently doubles the suite's shuffle —
    the round-5 PLANS.md audit finding)."""
    import re

    d = with_deltas(from_events(spark, SF))
    plan = _plan(d)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "hashpartitioning(conv_id" in plan, plan
