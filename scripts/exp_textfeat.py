#!/usr/bin/env python
"""Interleaved A/B for text_features at a given SF (guide §1/§2/§4).

Variants:
  A  current: scan (1 task for a 1-row-group file) → 11 regex exprs
  B  scan → repartition(2*cores, doc_id) → same exprs
  C  B + single-pass feature projection (no duplicated subtrees)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from rollup_engine import textops  # noqa: E402
from rollup_engine.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("exp-textfeat", master=f"local[{cpus}]")

SEL = [
    "doc_id", "ws_tokens", "bpe_tokens", "avg_word_len", "stopword_ratio",
    "punct_ratio", "digit_ratio", "quality", "lang_pred", "fingerprint",
]


def docs():
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def v_a():
    return textops.add_text_features(docs()).select(*SEL)


def v_b():
    d = docs().repartition(2 * cpus, "doc_id")
    return textops.add_text_features(d).select(*SEL)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.perf_counter()
    force(fn())
    return round(time.perf_counter() - t0, 3)


variants = {"A_current": v_a, "B_repart": v_b}
for name, fn in variants.items():
    force(fn())  # warm
times = {k: [] for k in variants}
for _ in range(4):
    for name, fn in variants.items():
        times[name].append(timed(fn))
print(json.dumps({k: {"min": min(v), "all": v} for k, v in times.items()}))
