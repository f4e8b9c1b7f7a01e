"""Every queries() entry must match its oracle_sql() in DuckDB at
sf0.001 (the driver runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from rollup_engine.queries import ORACLES, QUERIES

from .oracle_harness import compare, run_oracle

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(spark, name):
    assert name in QUERIES, f"oracle without query: {name}"
    sdf = QUERIES[name](spark, SF_DIR)
    opdf = run_oracle(ORACLES[name], SF_DIR)
    problems = compare(sdf, opdf)
    assert not problems, f"{name}: {problems}"


def test_every_query_runs(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
