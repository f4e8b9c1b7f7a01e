from __future__ import annotations

import datetime as dt

import pytest

from rollup_engine.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rollup_engine-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def make_transcript(spark, rows):
    """rows: list of (conv_id, turn_idx, role, text, tool, ts_str|None)."""
    from rollup_engine.schema import TRANSCRIPT_SCHEMA

    parsed = []
    for conv, idx, role, text, tool, ts in rows:
        t = (
            dt.datetime.fromisoformat(ts)
            if isinstance(ts, str)
            else ts
        )
        parsed.append((conv, idx, role, text, tool, t))
    return spark.createDataFrame(parsed, TRANSCRIPT_SCHEMA)


def ts_seq(base: str, deltas_ms: list[int]) -> list[str]:
    """Timestamps starting at base, then each subsequent = prev + delta."""
    t = dt.datetime.fromisoformat(base)
    out = [t.isoformat()]
    for d in deltas_ms:
        t = t + dt.timedelta(milliseconds=d)
        out.append(t.isoformat())
    return out
