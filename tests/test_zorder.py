"""Z-order layout: both query axes localize per file (parquet footer
stats become selective on ts AND conv-hash), and the rewrite is exact."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rollup_engine.ingest import (
    ZORDER_HASH_COL,
    read_zorder_convs,
    write_zorder_table,
    zorder_hash,
)
from rollup_engine.transcripts import from_events

# sf0.001 has only 15 distinct conversations — too few hash points for
# per-file conv-span statistics to mean anything; sf0.01 has 150.
SF = "/root/testdata/sf0.01"


def _file_spans(path: str, ts_field: str = "ts"):
    """Per-file (ts_span_fraction, conv16_span_fraction) from parquet
    row-group stats — what the reader's min/max pruning actually sees."""
    spans = []
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert files
    mins_t, maxs_t, mins_c, maxs_c = [], [], [], []
    for f in files:
        md = pq.ParquetFile(f).metadata
        t_lo = t_hi = c_lo = c_hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == ts_field:
                    t_lo = st.min if t_lo is None else min(t_lo, st.min)
                    t_hi = st.max if t_hi is None else max(t_hi, st.max)
                if name == ZORDER_HASH_COL:
                    c_lo = st.min if c_lo is None else min(c_lo, st.min)
                    c_hi = st.max if c_hi is None else max(c_hi, st.max)
        spans.append(((t_lo, t_hi), (c_lo, c_hi)))
    return spans


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zo")
    t = from_events(spark, SF)
    zpath = str(base / "zorder")
    npath = str(base / "naive")
    # the writer itself persists ZORDER_HASH_COL (the sargable handle)
    write_zorder_table(t, zpath, n_files=16)
    # the naive layout needs the same column added manually so its
    # footers are span-comparable
    t = t.withColumn(ZORDER_HASH_COL, zorder_hash())
    # the no-layout alternative: round-robin files (what a plain
    # repartition-and-write produces) — every file samples the whole
    # table, so footer stats localize NEITHER axis.  Same micros
    # encoding so its footers are comparable.
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        t.repartition(16).write.mode("overwrite").parquet(npath)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    return t, zpath, npath


def _fractions(spans):
    all_t = [s[0] for s in spans]
    all_c = [s[1] for s in spans]
    t_lo = min(x[0] for x in all_t)
    t_hi = max(x[1] for x in all_t)
    c_lo, c_hi = 0, 65535
    t_range = (t_hi - t_lo).total_seconds() or 1.0
    tf = [
        ((hi - lo).total_seconds()) / t_range for lo, hi in all_t
    ]
    cf = [(hi - lo) / (c_hi - c_lo) for lo, hi in all_c]
    return tf, cf


def test_zorder_localizes_both_axes(layouts):
    _, zpath, npath = layouts
    ztf, zcf = _fractions(_file_spans(zpath))
    ntf, ncf = _fractions(_file_spans(npath))
    # round-robin layout: every file samples the whole table, so footer
    # stats span ~the full range on BOTH axes — zero skipping power
    assert min(ntf) > 0.9
    assert min(ncf) > 0.9
    ztf.sort()
    zcf.sort()
    # Per-file guarantees on a Morton curve are statistical: a file
    # whose curve segment crosses a high-bit flip spans wide on one
    # axis.  The skipping win is about the TYPICAL file, so pin medians
    # and means, not maxima.
    assert ztf[len(ztf) // 2] < 0.5, ztf
    assert sum(ztf) / len(ztf) < sum(ntf) / len(ntf) * 0.6
    assert zcf[len(zcf) // 2] < 0.5, zcf
    assert sum(zcf) / len(zcf) < sum(ncf) / len(ncf) * 0.6


def test_zorder_rewrite_is_exact(spark, layouts):
    t, zpath, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == t.count()
    # bit_xor, not sum: summing 64-bit hashes overflows long under ANSI
    assert (
        back.select(F.bit_xor(F.xxhash64("conv_id", "turn_idx", "ts"))).first()[0]
        == t.select(F.bit_xor(F.xxhash64("conv_id", "turn_idx", "ts"))).first()[0]
    )


def test_zorder_pruned_conv_read_exact(spark, layouts):
    """read_zorder_convs (hash-pruned In + exact id filter) returns
    exactly the rows a plain conv_id filter over the source returns —
    pruning is a layout optimization, never a semantics change."""
    t, zpath, _ = layouts
    convs = [
        r[0]
        for r in t.select("conv_id").distinct().orderBy("conv_id").limit(5).collect()
    ]
    got = read_zorder_convs(spark, zpath, convs)
    want = t.where(F.col("conv_id").isin(convs)).drop(ZORDER_HASH_COL)
    assert got.count() == want.count() > 0
    sig = lambda df: df.select(  # noqa: E731
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "ts"))
    ).first()[0]
    assert sig(got) == sig(want)
    assert ZORDER_HASH_COL not in got.columns


def test_pruned_read_pushes_in_filter_to_scan(spark, layouts):
    """The conv_c16 In-predicate must reach the parquet scan as a
    pushed filter — that is the mechanism row-group skipping hangs on;
    a plan where it stays a post-scan Filter reads every row group."""
    import re

    _, zpath, _ = layouts
    df = read_zorder_convs(spark, zpath, ["42", "77"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PushedFilters: (.*)", plan)
    assert m, plan
    pushed = m.group(1)
    assert "In(conv_c16" in pushed, pushed
    assert "In(conv_id" in pushed, pushed
