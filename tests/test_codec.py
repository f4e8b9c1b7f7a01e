"""Codec bit-exactness + chunk-store round-trip invariants
(fx_codec, FIXTURES.md §2; input_hint per-turn text equality)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rollup_engine import codec


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
def test_float_roundtrip_bit_exact(vals):
    v = np.array(vals, dtype=np.float64)
    back = codec.decode_floats(codec.encode_floats(v))
    assert np.array_equal(v.view(np.uint64), back.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300
    )
)
def test_timestamp_roundtrip_exact(vals):
    t = np.array(vals, dtype=np.int64)
    assert np.array_equal(codec.decode_timestamps(codec.encode_timestamps(t)), t)


def test_compression_ratio_on_regular_series():
    """Delta-of-delta on near-regular timestamps and Gorilla on smooth
    floats must actually compress (the reason these codecs exist)."""
    rng = np.random.RandomState(42)
    t = np.cumsum(rng.randint(990, 1010, 50_000)).astype(np.int64)
    blob = codec.encode_timestamps(t)
    assert len(blob) < 0.35 * 8 * len(t)
    v = np.cumsum(rng.randint(0, 3, 50_000)).astype(np.float64)
    fb = codec.encode_floats(v)
    assert len(fb) < 0.5 * 8 * len(v)


def test_constant_series_tiny():
    t = np.full(10_000, 1_700_000_000_000_000, dtype=np.int64)
    assert len(codec.encode_timestamps(t)) < 10_500 // 4  # ~2 bits/val of plane
    v = np.full(10_000, 37.5)
    assert len(codec.encode_floats(v)) < 10_500 * 2.2 / 8 + 64


# ------------------------------------------------------ chunk round-trip


def test_chunk_roundtrip_preserves_text_equality(spark):
    """encode_chunks → decode_chunks reproduces every turn exactly,
    under stable (conv_id, turn_idx) ordering, through a repartition —
    the input_hint invariant."""
    from rollup_engine.chunks import decode_chunks, encode_chunks
    from rollup_engine.deltas import with_deltas
    from rollup_engine.transcripts import from_events

    from pyspark.sql import functions as F

    t = with_deltas(
        from_events(spark, "/root/testdata/sf0.001"), keep_first_turn=True
    ).withColumn("delta_ms", F.col("delta_ms").cast("double"))
    chunks = encode_chunks(t.repartition(7), metric_cols=["delta_ms"])
    back = decode_chunks(chunks, metric_cols=["delta_ms"])

    orig = t.orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    rt = back.orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    assert len(orig) == len(rt)
    assert (orig["text"] == rt["text"]).all()
    assert (orig["conv_id"] == rt["conv_id"]).all()
    assert (orig["turn_idx"] == rt["turn_idx"]).all()
    assert (orig["role"] == rt["role"]).all()
    assert (orig["tool"] == rt["tool"]).all()
    assert (orig["ts"] == rt["ts"]).all()
    a = orig["delta_ms"].to_numpy()
    b = rt["delta_ms"].to_numpy()
    assert np.array_equal(a, b, equal_nan=True)


def test_chunk_compression_counts(spark):
    from rollup_engine.chunks import encode_chunks
    from rollup_engine.transcripts import from_events

    t = from_events(spark, "/root/testdata/sf0.001")
    chunks = encode_chunks(t)
    total = chunks.selectExpr("sum(n) s").collect()[0].s
    assert total == t.count()

def test_compact_chunks_merges_fragments_exactly(spark):
    """3 interleaved ingest batches → fragments; compaction must yield
    ONE row per (bucket, day) key whose decode equals the unfragmented
    encode's decode row-for-row (metrics included), with the canonical
    in-chunk order restored."""
    from pyspark.sql import functions as F

    from rollup_engine.chunks import (
        compact_chunks,
        decode_chunks,
        encode_chunks,
    )
    from rollup_engine.deltas import with_deltas
    from rollup_engine.transcripts import from_events

    t = with_deltas(
        from_events(spark, "/root/testdata/sf0.001"), keep_first_turn=True
    ).withColumn("delta_ms", F.col("delta_ms").cast("double"))
    b = t.withColumn("_b", F.pmod(F.xxhash64("text"), F.lit(3)))
    frags = None
    for i in range(3):
        part = encode_chunks(
            b.where(F.col("_b") == i).drop("_b"), metric_cols=["delta_ms"]
        )
        frags = part if frags is None else frags.unionByName(part)
    # fragmentation is real: more rows than distinct keys
    n_keys = frags.select("conv_bucket", "time_chunk").distinct().count()
    assert frags.count() > n_keys

    compacted = compact_chunks(frags, metric_cols=["delta_ms"])
    assert compacted.count() == n_keys
    assert (
        compacted.groupBy("conv_bucket", "time_chunk")
        .count()
        .where("count > 1")
        .count()
        == 0
    )

    want = (
        decode_chunks(
            encode_chunks(t, metric_cols=["delta_ms"]),
            metric_cols=["delta_ms"],
        )
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    got = (
        decode_chunks(compacted, metric_cols=["delta_ms"])
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(want) == len(got)
    for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts"]:
        assert (want[c] == got[c]).all(), c
    assert np.array_equal(
        want["delta_ms"].to_numpy(), got["delta_ms"].to_numpy(), equal_nan=True
    )


def test_compact_chunks_passthrough_when_already_compact(spark):
    from rollup_engine.chunks import compact_chunks, encode_chunks
    from rollup_engine.transcripts import from_events

    t = from_events(spark, "/root/testdata/sf0.001")
    c = encode_chunks(t)
    cc = compact_chunks(c)
    a = c.orderBy("conv_bucket", "time_chunk").select("n", "ts_enc").toPandas()
    b = cc.orderBy("conv_bucket", "time_chunk").select("n", "ts_enc").toPandas()
    assert (a["n"] == b["n"]).all()
    assert all(x == y for x, y in zip(a["ts_enc"], b["ts_enc"]))
