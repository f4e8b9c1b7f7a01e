"""Local re-implementation of the driver's DuckDB-oracle comparison:
run a Spark query and its oracle SQL over the same parquet, sort columns
by name and rows by value, and compare."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


def compare(spark_df, oracle_pdf, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    s_cols, o_cols = sorted(spdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"columns differ: spark={s_cols} oracle={o_cols}"]
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}")

    def normrows(pdf):
        rows = []
        for rec in pdf[s_cols].itertuples(index=False):
            rows.append(tuple(_norm_cell(_pyify(v)) for v in rec))
        return sorted(rows, key=lambda r: tuple(str(x) for x in r))

    a, b = normrows(spdf), normrows(oracle_pdf)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        extra = f"; first diffs {diff}" if diff else ""
        problems.append(f"values differ ({len(a)} vs {len(b)} rows){extra}")
    return problems


def _pyify(v):
    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT:
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if hasattr(v, "tzinfo") and v.tzinfo is not None:
        return v.replace(tzinfo=None)
    if isinstance(v, np.ndarray):
        return tuple(_pyify(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_pyify(x) for x in v)
    return v
