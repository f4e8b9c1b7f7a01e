#!/usr/bin/env python
"""Per-stage profile of dedup_minhash_lsh at $SPARK_GRAFT_SF_DIR
(guide §1): cumulative stages, interleaved min-of-3, noop sink."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rollup_engine import dedup  # noqa: E402
from rollup_engine.dedup import (  # noqa: E402
    LSH_BANDS,
    MINHASH_PERMS,
    _MERSENNE31,
    _cap_postings,
    _jaccard,
    _perm_params,
    _shingle_relation,
    md5_long,
)
from rollup_engine.queries_data import _docs  # noqa: E402
from rollup_engine.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("exp-minhash", master=f"local[{cpus}]")


def force(df):
    df.write.format("noop").mode("overwrite").save()


k, bands = MINHASH_PERMS, LSH_BANDS
r = k // bands


def build(upto: str):
    docs = _docs(spark, sf_dir)
    sh_rel, sizes = _shingle_relation(docs, 5, "doc_id", "text")
    if upto == "shingles":
        return sh_rel
    ex = sh_rel.select(
        "id", F.pmod(md5_long(F.col("sh")), F.lit(_MERSENNE31)).alias("h")
    )
    perm_aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE31)).alias(
            f"_m{i}"
        )
        for i, (a, b) in enumerate(_perm_params(k))
    ]
    sig = (
        ex.groupBy("id")
        .agg(*perm_aggs)
        .select("id", F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("sig"))
    )
    if upto == "signatures":
        return sig
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice(F.col("sig"), i * r + 1, r).cast("string"))
                    for i in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    banded = _cap_postings(banded, ["band", "bucket"], 1000)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if upto == "candidates":
        return cand
    sh_a = sh_rel.select(F.col("id").alias("id_a"), "sh")
    sh_b = sh_rel.select(F.col("id").alias("id_b"), "sh")
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard(inter, sizes, 0.7)


stages = ["shingles", "signatures", "candidates", "full"]
for s in stages:
    force(build(s))
times = {s: [] for s in stages}
for _ in range(3):
    for s in stages:
        t0 = time.perf_counter()
        force(build(s))
        times[s].append(round(time.perf_counter() - t0, 3))
print(json.dumps({s: {"min": min(v), "all": v} for s, v in times.items()}))
# cardinalities (once)
docs = _docs(spark, sf_dir)
sh_rel, sizes = _shingle_relation(docs, 5, "doc_id", "text")
print(json.dumps({"shingle_rows": sh_rel.count(),
                  "cand_rows": build("candidates").count()}))
