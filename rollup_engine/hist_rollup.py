"""All-JVM exact-tier rollup: histogram-as-array mergeable state.

The binary-sketch path (sketch_rollup.py) moves every delta row through
the Arrow JVM↔Python boundary; measured, that transfer costs ~3.5 s per
10M rows REGARDLESS of core count — a serial tax that caps scaling.
This module keeps the mergeable per-bucket state inside the JVM as a
sorted ``array<struct<v:long, c:long>>`` histogram column, so the whole
minute→hour→day cascade is expressible with built-in aggregates +
``explode`` and never leaves whole-stage codegen.

Plan (one logical flow, two exchanges, zero Python on the common path):

  deltas → groupBy(bucket, delta) count       [exchange 1, map-side combine]
         → window cumsum over value per bucket [reuses exchange-1 keys? no:
           re-keyed by bucket — exchange 2 over the *compressed* hist rows]
         → groupBy(bucket):
             count/min/max/sum/avg  from (v, c)
             p50/p90/p99            nearest-rank: min v with cum ≥ ceil(q·n)
             hist                   sort_array(collect_list(struct(v, c)))
             err counters           summed alongside

Overflow contract (the reference's exact-≤10k / approx-above,
/root/reference/Cargo.toml:20-21, generalized): buckets whose distinct-
value count exceeds ``HIST_MAX_BINS`` keep exact percentiles (they are
computed from rows, not the array) but store a t-digest (built in a
vectorized pandas stage from the already-compressed (v, c) rows) instead
of the histogram array; cascades merge those through sketches.merge.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import sketches
from .deltas import DELTA_COL
from .rollup import ERR4, ERR5, error_flag
from .schema import TIERS

HIST_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("v", T.LongType(), False),
            T.StructField("c", T.LongType(), False),
        ]
    )
)

HIST_ROLLUP_FIELDS = [
    T.StructField("bucket_start", T.TimestampType(), False),
    T.StructField("turn_count", T.LongType(), False),
    T.StructField("lat_min_ms", T.LongType(), True),
    T.StructField("lat_max_ms", T.LongType(), True),
    T.StructField("lat_avg_ms", T.LongType(), True),
    T.StructField("lat_p50_ms", T.LongType(), True),
    T.StructField("lat_p90_ms", T.LongType(), True),
    T.StructField("lat_p99_ms", T.LongType(), True),
    T.StructField("lat_sum_ms", T.LongType(), True),
    T.StructField("err4xx_cnt", T.LongType(), False),
    T.StructField("err5xx_cnt", T.LongType(), False),
    T.StructField("err4xx_rate", T.DoubleType(), True),
    T.StructField("err5xx_rate", T.DoubleType(), True),
    T.StructField("hist", HIST_TYPE, True),
    T.StructField("tdigest", T.BinaryType(), True),
]
HIST_ROLLUP_SCHEMA = T.StructType(HIST_ROLLUP_FIELDS)

_QS = {"lat_p50_ms": 0.5, "lat_p90_ms": 0.9, "lat_p99_ms": 0.99}


def _percentile_aggs() -> list[Column]:
    return [
        F.min(
            F.when(
                F.col("_cum")
                >= F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n"))),
                F.col("_v"),
            )
        ).alias(name)
        for name, q in _QS.items()
    ]


def _finalize_from_hist_rows(h: DataFrame, max_bins: int) -> DataFrame:
    """(bucket_start, _v, _c, _e4, _e5) → one finished row per bucket.

    Buckets are split by distinct-value count BEFORE any per-bucket
    ordered computation, so no stage is ever proportional to a hot
    bucket's value domain:
    - ≤ max_bins (the overwhelmingly common case): exact nearest-rank
      percentiles via a bounded cumsum window + the histogram array.
    - > max_bins: reference-parity approximate percentiles (the
      reference itself is exact ≤10k samples / approximate above,
      /root/reference/Cargo.toml:20-21) from t-digest state built
      distributed — partial digests per (bucket, salt), ≤ _OVERFLOW_SALTS
      merged per bucket.
    The compressed relation ``h`` is consumed by three subplans (sizes,
    exact branch, overflow branch).  Catalyst does NOT reuse the
    exchange across them, and a lazy persist() races — AQE launches the
    branch stages concurrently and tasks recompute uncached partitions
    (measured 2.2× wall).  An EAGER localCheckpoint materializes ``h``
    exactly once and truncates lineage (measured +13% vs the unsplit
    exact plan, vs +117% for lazy persist); the blocks are freed when
    the plan is garbage-collected.  Consequence: building this plan
    runs the upstream job — benchmark harnesses must construct inside
    the timed region.  The overflow key list is tiny by construction
    and broadcast.
    """
    h = h.localCheckpoint(eager=True)
    sizes = h.groupBy("bucket_start").agg(F.count(F.lit(1)).alias("_nd"))
    of_keys = sizes.where(F.col("_nd") > max_bins).select("bucket_start")
    # ``h`` is already materialized, so deciding overflow here costs one
    # fast aggregate over cached blocks — and the common (no-overflow)
    # case then keeps the ORIGINAL single-branch plan: no sizes scan, no
    # anti-join, no empty overflow stages in the executed query.
    if of_keys.isEmpty():
        return _finalize_exact(h)
    normal = h.join(F.broadcast(of_keys), "bucket_start", "left_anti")
    overflow = h.join(F.broadcast(of_keys), "bucket_start")
    return _finalize_exact(normal).unionByName(_finalize_overflow(overflow))


def _finalize_exact(h: DataFrame) -> DataFrame:
    """Exact finalize for buckets whose distinct-value count is bounded
    by max_bins: the cumsum window task is ≤ max_bins rows per bucket."""
    w_cum = (
        Window.partitionBy("bucket_start")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("bucket_start")
    h2 = h.withColumn("_cum", F.sum("_c").over(w_cum)).withColumn(
        "_n", F.sum("_c").over(w_all)
    )
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("_v").alias("v"), F.col("_c").alias("c")))
    )
    agg = h2.groupBy("bucket_start").agg(
        F.sum("_c").alias("turn_count"),
        F.min("_v").alias("lat_min_ms"),
        F.max("_v").alias("lat_max_ms"),
        F.sum(F.col("_v") * F.col("_c")).alias("lat_sum_ms"),
        *_percentile_aggs(),
        F.sum("_e4").alias("err4xx_cnt"),
        F.sum("_e5").alias("err5xx_cnt"),
        pairs.alias("hist"),
    )
    agg = agg.withColumns(
        {
            "lat_avg_ms": F.floor(F.col("lat_sum_ms") / F.col("turn_count")).cast(
                "long"
            ),
            "err4xx_rate": F.round(F.col("err4xx_cnt") / F.col("turn_count"), 4),
            "err5xx_rate": F.round(F.col("err5xx_cnt") / F.col("turn_count"), 4),
            "tdigest": F.lit(None).cast("binary"),
        }
    )
    return agg.select(*[f.name for f in HIST_ROLLUP_FIELDS])


# Salt shards per overflow bucket: bounds every digest-build task to
# ~1/64 of a hot bucket's value domain while keeping the per-bucket
# merge fan-in trivially small.
_OVERFLOW_SALTS = 64


def _finalize_overflow(of: DataFrame) -> DataFrame:
    """Distributed digest finalize for >max_bins buckets.  Scalar
    metrics (count/min/max/sum/avg/error rates) stay EXACT via plain
    codegen aggregates (no order needed); only p50/p90/p99 come from the
    merged t-digest."""
    scalars = of.groupBy("bucket_start").agg(
        F.sum("_c").alias("turn_count"),
        F.min("_v").alias("lat_min_ms"),
        F.max("_v").alias("lat_max_ms"),
        F.sum(F.col("_v") * F.col("_c")).alias("lat_sum_ms"),
        F.sum("_e4").alias("err4xx_cnt"),
        F.sum("_e5").alias("err5xx_cnt"),
    )
    salted = of.withColumn(
        "_salt", F.pmod(F.hash("_v"), F.lit(_OVERFLOW_SALTS))
    )
    partials = salted.groupBy("bucket_start", "_salt").applyInPandas(
        _partial_td, "bucket_start timestamp, td binary"
    )
    digests = partials.groupBy("bucket_start").agg(
        _merge_td_udf(F.collect_list("td")).alias("tdigest")
    )
    qcols = _td_quantiles_udf(F.col("tdigest"))
    out = scalars.join(digests, "bucket_start").withColumns(
        {
            "lat_avg_ms": F.floor(F.col("lat_sum_ms") / F.col("turn_count")).cast(
                "long"
            ),
            "err4xx_rate": F.round(F.col("err4xx_cnt") / F.col("turn_count"), 4),
            "err5xx_rate": F.round(F.col("err5xx_cnt") / F.col("turn_count"), 4),
            "hist": F.lit(None).cast(HIST_TYPE),
            "_qs": qcols,
        }
    )
    for i, name in enumerate(_QS):
        out = out.withColumn(name, F.col("_qs").getItem(i))
    return out.select(*[f.name for f in HIST_ROLLUP_FIELDS])


def _partial_td(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket_start": [pdf["bucket_start"].iloc[0]],
            "td": [
                sketches._td_from(
                    pdf["_v"].to_numpy(dtype=np.float64),
                    pdf["_c"].to_numpy(dtype=np.float64),
                )
            ],
        }
    )


@F.pandas_udf(T.BinaryType())
def _merge_td_udf(blob_lists: pd.Series) -> pd.Series:
    return pd.Series(
        [sketches.merge(list(blobs)) for blobs in blob_lists]
    )


@F.pandas_udf(T.ArrayType(T.LongType()))
def _td_quantiles_udf(blobs: pd.Series) -> pd.Series:
    out = []
    for b in blobs:
        if b is None:
            out.append(None)
            continue
        qs = sketches.quantiles(b, list(_QS.values()))
        out.append([None if q is None else int(np.floor(q)) for q in qs])
    return pd.Series(out)


def narrow_for_rollup(transcripts: DataFrame) -> DataFrame:
    """Project a raw transcript table down to the four columns the
    delta→rollup pipeline actually consumes, with the error-class flags
    precomputed as tiny longs.  Applied BEFORE clean()/with_deltas(),
    this shrinks every row carried through the conv_id window exchange
    (tool strings → 2 bytes; text/role never read).  Catalyst prunes
    unused columns by itself but will not rewrite ``tool`` into flags
    ahead of the shuffle — this helper does that explicitly for the
    ingest/bench hot path.  hist_rollup detects the precomputed flags.
    """
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        error_flag(ERR4).cast("long").alias("_e4"),
        error_flag(ERR5).cast("long").alias("_e5"),
    )


def hist_rollup(
    deltas: DataFrame,
    tier: str = "minute",
    delta_col: str = DELTA_COL,
    max_bins: int = sketches.HIST_MAX_BINS,
) -> DataFrame:
    """Exact-tier rollup with JVM-resident mergeable histogram state."""
    t = TIERS[tier]
    has_flags = "_e4" in deltas.columns
    h = (
        deltas.select(
            F.date_trunc(t.duckdb_trunc, F.col("ts")).alias("bucket_start"),
            F.col(delta_col).alias("_v"),
            (F.col("_e4") if has_flags else error_flag(ERR4).cast("long")).alias("_e4"),
            (F.col("_e5") if has_flags else error_flag(ERR5).cast("long")).alias("_e5"),
        )
        .where(F.col("_v").isNotNull())  # COUNT(measure) null-skip semantics
        .groupBy("bucket_start", "_v")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum("_e4").alias("_e4"),
            F.sum("_e5").alias("_e5"),
        )
    )
    out = _finalize_from_hist_rows(h, max_bins)
    return out.withColumn("tier", F.lit(tier)).select(
        "tier", *[f.name for f in HIST_ROLLUP_FIELDS]
    )


def hist_cascade(rollup_df: DataFrame, to_tier: str) -> DataFrame:
    """Re-aggregate a finer hist-rollup tier into ``to_tier`` without
    touching raw data.  Histogram rows re-derive percentiles exactly;
    error counters fold in the same pass (attached to each bucket's
    first hist element so the per-value relation stays self-contained).
    Buckets carrying t-digests merge through the Python path and union
    in (rare by construction).
    """
    t = TIERS[to_tier]
    target = F.date_trunc(t.duckdb_trunc, F.col("bucket_start"))
    # Checkpoint the TIER relation (calendar-bounded, far smaller than
    # its exploded per-value form): its three consumers below (hist
    # branch, upper-bound probe, t-digest branch isEmpty) then read
    # blocks instead of re-running the upstream rollup each.
    src = rollup_df.withColumn("_target", target).localCheckpoint(eager=True)

    with_hist = src.where(F.col("hist").isNotNull())
    h = with_hist.select(
        F.col("_target").alias("bucket_start"),
        F.posexplode("hist").alias("_pos", "_e"),
        F.col("err4xx_cnt"),
        F.col("err5xx_cnt"),
    ).select(
        "bucket_start",
        F.col("_e.v").alias("_v"),
        F.col("_e.c").alias("_c"),
        # attribute the source bucket's error counters once (pos 0)
        F.when(F.col("_pos") == 0, F.col("err4xx_cnt")).otherwise(F.lit(0)).alias("_e4"),
        F.when(F.col("_pos") == 0, F.col("err5xx_cnt")).otherwise(F.lit(0)).alias("_e5"),
    )
    # collapse duplicate values across source buckets before finalizing
    h = h.groupBy("bucket_start", "_v").agg(
        F.sum("_c").alias("_c"),
        F.sum("_e4").alias("_e4"),
        F.sum("_e5").alias("_e5"),
    )
    # Overflow upper bound WITHOUT materializing the exploded relation:
    # a target bucket's distinct-value count ≤ the sum of its source
    # hists' bin counts — computable from the checkpointed tier rows.
    # Under the bound, the whole explode→compress→finalize runs as ONE
    # lazy exact plan (no second checkpoint, no probe job).
    ub_row = (
        with_hist.groupBy("_target")
        .agg(F.sum(F.size("hist")).alias("_ub"))
        .agg(F.max("_ub"))
        .first()
    )
    ub = ub_row[0] if ub_row and ub_row[0] is not None else 0
    if ub <= sketches.HIST_MAX_BINS:
        out = _finalize_exact(h)
    else:
        out = _finalize_from_hist_rows(h, max_bins=sketches.HIST_MAX_BINS)

    td_src = src.where(F.col("hist").isNull() & F.col("tdigest").isNotNull())
    if not td_src.isEmpty():
        from .retention import merge_rollup_rows  # binary-sketch merge path

        td_part = merge_rollup_rows(
            td_src.drop("tier")
            .withColumnRenamed("tdigest", "sketch")
            .drop("hist"),
            F.col("_target"),
        ).withColumnRenamed("sketch", "tdigest")
        td_part = td_part.withColumn("hist", F.lit(None).cast(HIST_TYPE)).select(
            *[f.name for f in HIST_ROLLUP_FIELDS]
        )
        # NOTE: a target bucket fed by BOTH hist and t-digest sources is
        # merged by promoting the hist side into the t-digest (union +
        # re-merge); handled by merge_mixed below.
        out = _merge_mixed(out, td_part)
    return out.withColumn("tier", F.lit(to_tier)).select(
        "tier", *[f.name for f in HIST_ROLLUP_FIELDS]
    )


def _merge_mixed(hist_part: DataFrame, td_part: DataFrame) -> DataFrame:
    """Union the two cascade halves; buckets present in both collapse
    via the binary-sketch merge (hist → sketch promotion)."""
    both = hist_part.unionByName(td_part)
    dup_keys = (
        both.groupBy("bucket_start")
        .count()
        .where("count > 1")
        .select("bucket_start")
    )
    if dup_keys.isEmpty():
        return both
    from .retention import merge_rollup_rows

    clean_part = both.join(F.broadcast(dup_keys), "bucket_start", "left_anti")
    dup_rows = both.join(F.broadcast(dup_keys), "bucket_start")
    promoted = dup_rows.withColumn(
        "sketch",
        F.coalesce(F.col("tdigest"), _hist_to_sketch_udf(F.col("hist"))),
    ).drop("hist", "tdigest")
    merged = merge_rollup_rows(promoted.drop("tier"), F.col("bucket_start"))
    merged = (
        merged.withColumnRenamed("sketch", "tdigest")
        .withColumn("hist", F.lit(None).cast(HIST_TYPE))
        .select(*[f.name for f in HIST_ROLLUP_FIELDS])
    )
    return clean_part.unionByName(merged)


@F.pandas_udf(T.BinaryType())
def _hist_to_sketch_udf(hists: pd.Series) -> pd.Series:
    out = []
    for h in hists:
        if h is None:
            out.append(None)
            continue
        vals = np.array([e["v"] for e in h], dtype=np.int64)
        cnts = np.array([e["c"] for e in h], dtype=np.int64)
        out.append(sketches._pack(sketches._MAGIC_HIST, vals, cnts))
    return pd.Series(out)
