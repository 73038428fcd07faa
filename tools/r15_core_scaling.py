"""Core-scaling proof for the r14/r15 retuned paths (VERDICT r14 #6).

The driver's 8-vs-32-core block at sf0.1 reads ~1.0 for every query because
the fixture corpus is one row-group per table and every query is
fixed-overhead-bound — it cannot distinguish a structural win from a
local-overhead win. This tool measures the retuned COMPUTE paths at sizes
where the work dominates (100k docs / 1M vectors, written as multi-file
parquet like any real table) at two core counts in separate processes
(local[8] vs local[32]), and reports t(8)/t(32). A ratio ~1 would mean the
path serializes (e.g. a fan-out pin missing); ratios >> 1 mean the work
actually spreads across cores — the claim the round's optimizations make.

Usage:
  python tools/r15_core_scaling.py            # orchestrates both core counts
  python tools/r15_core_scaling.py --measure --cpus 8   # one measurement run
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DATA_DIR = "/tmp/r15_core_scaling_data"
DOCS = os.path.join(DATA_DIR, "documents_100k.parquet")
VECS = os.path.join(DATA_DIR, "vectors_1m.parquet")
# dedup-family corpora must NOT be replicate_docs (replicas share every
# interior window/shingle — a 100k replicated corpus is ~95 % duplicated,
# and the measurement then times the pathological pair explosion, not the
# operator): reuse scale_check's synthetic shapes — 120-token docs with a
# 5 % planted shared passage for span/minhash/simhash, 80-token docs at
# 500k rows for DSIR (where SCALE.md showed fixed costs amortize).
SPAN_DOCS = os.path.join(DATA_DIR, "span_docs_100k.parquet")
DSIR_DOCS = os.path.join(DATA_DIR, "dsir_docs_500k.parquet")
RUNS = int(os.environ.get("R15_SCALE_RUNS", "2"))


def _spark(cpus: int | None = None):
    if cpus is not None:
        os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from vectordb_cloud_spark.session import get_spark

    spark = get_spark("r15-core-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def generate():
    """Write the two synthetic tables once (multi-file, like a real table)."""
    from pyspark.sql import functions as F

    from tools.scale_check import replicate_docs, synth_vectors

    spark = _spark()
    if not os.path.exists(DOCS):
        replicate_docs(spark, SF_DIR, 20).repartition(32).write.parquet(DOCS)
    if not os.path.exists(VECS):
        synth_vectors(spark, 1_000_000).withColumn(
            "label", F.pmod(F.col("vec_id"), F.lit(8))
        ).repartition(32).write.parquet(VECS)
    if not os.path.exists(SPAN_DOCS):
        passage = " ".join(f"shared{i}" for i in range(40))
        (
            spark.range(100_000).select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.concat_ws(" ", F.transform(
                        F.sequence(F.lit(0), F.lit(119)),
                        lambda i: F.concat(
                            F.lit("t"),
                            F.pmod(F.xxhash64(F.col("id"), i),
                                   F.lit(1_000_000_000)),
                        ),
                    )),
                    F.when(F.col("id") % 20 == 0,
                           F.lit(" " + passage)).otherwise(F.lit("")),
                ).alias("text"),
            ).repartition(32).write.parquet(SPAN_DOCS)
        )
    if not os.path.exists(DSIR_DOCS):
        (
            spark.range(500_000).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", F.transform(
                    F.sequence(F.lit(0), F.lit(79)),
                    lambda i: F.concat(
                        F.lit("t"),
                        F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000)),
                    ),
                )).alias("text"),
            ).repartition(32).write.parquet(DSIR_DOCS)
        )
    spark.stop()


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def measure(cpus: int, only: set[str] | None = None) -> dict:
    spark = _spark(cpus)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(DOCS)
    vecs = spark.read.parquet(VECS)
    span_docs = spark.read.parquet(SPAN_DOCS)
    dsir_docs = spark.read.parquet(DSIR_DOCS)

    from vectordb_cloud_spark.functions.embedding import (
        hashed_tfidf_embed,
        hashed_tfidf_sparse,
    )
    from vectordb_cloud_spark.functions.text import gopher_quality_flags
    from vectordb_cloud_spark.operators.ann import ivf_assign, ivf_build
    from vectordb_cloud_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_dup_pairs,
        span_dedup_corpus,
    )
    from vectordb_cloud_spark.operators.dsir import dsir_select
    from vectordb_cloud_spark.functions.pii import scrub_corpus
    from vectordb_cloud_spark.operators.pq import pq_encode, pq_train

    # train once outside the timed region (driver-side numpy; core-count
    # independent) so the timed ops are the distributed passes
    centers, _ = ivf_build(vecs, k_centroids=64)
    books = pq_train(vecs.limit(20000), m_subvectors=8, k_codes=64)
    target = dsir_docs.filter(F.col("doc_id") % 7 == 0)

    ops = {
        "gopher_flags_agg_100k": lambda: _noop(
            docs.select(gopher_quality_flags("text").alias("g")).agg(
                F.sum(F.col("g.passes").cast("long"))
            )
        ),
        "pii_scrub_100k": lambda: _noop(scrub_corpus(docs)),
        "span_dedup_synth100k_w30": lambda: _noop(
            span_dedup_corpus(span_docs, window=30)
        ),
        "minhash_pairs_synth100k": lambda: _noop(
            minhash_lsh_pairs(span_docs, jaccard_threshold=0.5)
        ),
        "simhash_pairs_synth100k": lambda: _noop(
            simhash_near_dup_pairs(span_docs, max_hamming=3)
        ),
        "dsir_select_synth500k": lambda: _noop(
            dsir_select(dsir_docs, target, n=100)
        ),
        "tfidf_embed_100k": lambda: _noop(hashed_tfidf_embed(docs, dim=64)),
        "tfidf_sparse_100k": lambda: _noop(
            hashed_tfidf_sparse(docs, vocab_size=4096)
        ),
        "ivf_assign_1m": lambda: _noop(ivf_assign(vecs, centers)),
        "pq_encode_1m": lambda: _noop(pq_encode(vecs, books)),
    }
    if only:
        ops = {k: v for k, v in ops.items() if k in only}
    out = {}
    for name, run in ops.items():
        run()  # warmup (codegen, caches)
        times = []
        for _ in range(RUNS):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        out[name] = round(statistics.median(times), 3)
        print(f"[cpus={cpus}] {name}: {out[name]}s", file=sys.stderr, flush=True)
    spark.stop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--ops", default="", help="comma-separated op subset")
    args = ap.parse_args()
    only = set(filter(None, args.ops.split(",")))
    if args.measure:
        print(json.dumps(measure(args.cpus, only or None)))
        return
    generate()
    results = {}
    for cpus in (8, 32):
        cmd = [sys.executable, __file__, "--measure", "--cpus", str(cpus)]
        if args.ops:
            cmd += ["--ops", args.ops]
        proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
        results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(proc.stderr[-2000:], flush=True)
    rows = []
    for name in results[32]:
        t8, t32 = results[8][name], results[32][name]
        rows.append((name, t8, t32, round(t8 / t32, 2)))
    print(json.dumps({"cpus8": results[8], "cpus32": results[32]}))
    print("\n| operator | local[8] | local[32] | ratio (ideal 4x) |")
    print("|---|---|---|---|")
    for name, t8, t32, r in rows:
        print(f"| {name} | {t8}s | {t32}s | {r}x |")


if __name__ == "__main__":
    main()
