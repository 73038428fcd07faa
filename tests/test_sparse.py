"""Sparse vector search (SPLADE-style dot product): hand-checked scores,
scan vs inverted-layout parity, partition pruning of the persisted
postings, JVM-only plans."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.sparse import (
    sparse_invert,
    sparse_persist_inverted,
    sparse_topk,
    sparse_topk_inverted,
)


@pytest.fixture(scope="module")
def sparse_docs(spark):
    # (doc_id, indices, values) — indices sorted, vocab of 10 dims
    rows = [
        (1, [0, 3, 7], [1.0, 2.0, 0.5]),
        (2, [3, 5], [4.0, 1.0]),
        (3, [1, 7, 9], [3.0, 1.0, 2.0]),
        (4, [2, 4], [5.0, 5.0]),        # no overlap with the test query
        (5, [0, 3, 5, 7], [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, indices array<int>, values array<float>"
    ).cache()


QI, QV = [0, 3, 7], [1.0, 1.0, 1.0]
# hand scores: d1 = 1+2+0.5 = 3.5; d2 = 4; d3 = 1; d4 = 0 (excluded); d5 = 1.5


def test_sparse_topk_hand_scores(sparse_docs):
    got = sparse_topk(sparse_docs, QI, QV, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (2, 4.0), (1, 3.5), (5, 1.5), (3, 1.0),
    ]


def test_sparse_topk_with_filter(sparse_docs):
    got = sparse_topk(sparse_docs, QI, QV, k=10,
                      filters=F.col("doc_id") != 2).collect()
    assert got[0]["doc_id"] == 1


def test_inverted_parity_with_scan(sparse_docs):
    postings = sparse_invert(sparse_docs)
    a = sparse_topk(sparse_docs, QI, QV, k=10).collect()
    b = sparse_topk_inverted(postings, QI, QV, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["id"], r["score"]) for r in b
    ]


def test_persisted_postings_prune_partitions(spark, sparse_docs, tmp_path):
    import os

    path = str(tmp_path / "postings")
    sparse_persist_inverted(sparse_invert(sparse_docs), path)
    # layout has one directory per dim; the query touches only its dims
    dims_on_disk = {d for d in os.listdir(path) if d.startswith("dim=")}
    assert {"dim=0", "dim=3", "dim=7"} <= dims_on_disk
    postings = spark.read.parquet(path)
    probe = postings.filter(F.col("dim").isin(QI))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dim" in plan
    got = sparse_topk_inverted(postings, QI, QV, k=10).collect()
    assert [r["id"] for r in got] == [2, 1, 5, 3]


def test_query_validation(sparse_docs):
    with pytest.raises(ValueError):
        sparse_topk(sparse_docs, [1, 2], [1.0])
    with pytest.raises(ValueError):
        sparse_topk_inverted(sparse_invert(sparse_docs), [1], [])


def test_plans_are_jvm_only(sparse_docs):
    from vectordb_cloud_spark.plans.inspect import explain_str

    p1 = explain_str(sparse_topk(sparse_docs, QI, QV, k=5), mode="simple")
    p2 = explain_str(
        sparse_topk_inverted(sparse_invert(sparse_docs), QI, QV, k=5),
        mode="simple")
    for plan in (p1, p2):
        assert not any(tok in plan for tok in
                       ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))


def test_sparse_fuses_with_dense_via_rrf(spark, sparse_docs, embeddings):
    """Hybrid sparse+dense: sparse_topk's (id, score) list drops straight
    into rrf_fuse next to a dense kNN list — the SPLADE+dense fusion
    pattern."""
    from vectordb_cloud_spark.operators.knn import knn_search
    from vectordb_cloud_spark.operators.lexical import rrf_fuse

    sparse_hits = sparse_topk(sparse_docs, QI, QV, k=4).withColumnRenamed(
        "doc_id", "vec_id")
    qv = [float(x) for x in
          embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    dense_hits = knn_search(
        embeddings.filter(F.col("vec_id") <= 5), qv, k=4, tiebreak="vec_id"
    ).select("vec_id", "dist")
    fused = rrf_fuse([sparse_hits.select("vec_id", "score"), dense_hits],
                     id_col="vec_id", k=5).collect()
    assert len(fused) == 5
    # ids from BOTH lists surface
    ids = {r["vec_id"] for r in fused}
    assert ids & {2, 1, 5, 3}            # sparse side
    assert 0 in ids                      # dense side's self-hit


def test_hashed_tfidf_sparse_real_corpus_retrieval(spark, sf_dir):
    """Sparse lexical vectors from the fixture corpus: shape invariants
    (sorted unique indices in vocab, unit norm) and real retrieval — a
    doc's own sparse vector as the query returns that doc first."""
    import numpy as np

    from vectordb_cloud_spark.functions.embedding import hashed_tfidf_sparse

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    sv = hashed_tfidf_sparse(docs, vocab_size=4096).cache()
    rows = sv.limit(20).collect()
    for r in rows:
        idx = list(r["indices"])
        assert idx == sorted(set(idx))
        assert all(0 <= i < 4096 for i in idx)
        assert abs(np.linalg.norm(r["values"]) - 1.0) < 1e-5
        assert len(idx) == len(r["values"])

    target = sv.filter(F.col("doc_id") == rows[0]["doc_id"]).first()
    got = sparse_topk(sv, list(target["indices"]),
                      [float(v) for v in target["values"]], k=3)
    top = got.first()
    assert top["doc_id"] == target["doc_id"]
    assert abs(top["score"] - 1.0) < 1e-4  # self-cosine of a unit vector

    # inverted layout agrees on the real corpus too
    inv = sparse_topk_inverted(sparse_invert(sv), list(target["indices"]),
                               [float(v) for v in target["values"]], k=3)
    assert [r["id"] for r in inv.collect()] == \
        [r["doc_id"] for r in got.collect()]


def test_duplicate_query_dims_rejected_everywhere(sparse_docs):
    """Duplicates would crash one path and silently double-count the
    other; both must reject identically up front."""
    with pytest.raises(ValueError, match="duplicate"):
        sparse_topk(sparse_docs, [3, 3, 7], [1.0, 1.0, 1.0])
    with pytest.raises(ValueError, match="duplicate"):
        sparse_topk_inverted(sparse_invert(sparse_docs),
                             [3, 3, 7], [1.0, 1.0, 1.0])


def test_bucketed_postings_prune_buckets_and_match(spark, sparse_docs,
                                                   tmp_path):
    """bucket_dims=N: directories ∝ N (not vocab), the query prunes to its
    dims' buckets, the exact-dim filter is pushed into the scan, and
    results match the per-dim layout bit-for-bit (VERDICT r6 #6)."""
    import os

    from vectordb_cloud_spark.operators.sparse import sparse_read_inverted

    path = str(tmp_path / "postings_bucketed")
    sparse_persist_inverted(sparse_invert(sparse_docs), path, bucket_dims=4)
    dirs = {d for d in os.listdir(path) if d.startswith("bucket=")}
    assert len(dirs) <= 4 and dirs  # 10-dim vocab -> at most 4 directories

    postings, n_buckets = sparse_read_inverted(spark, path)
    assert n_buckets == 4
    got = sparse_topk_inverted(postings, QI, QV, k=10,
                               bucket_dims=n_buckets)
    # parity with the unbucketed layout / the scan path
    assert [(r["id"], r["score"]) for r in got.collect()] == [
        (2, 4.0), (1, 3.5), (5, 1.5), (3, 1.0),
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    # bucket prune at the partition level, dim filter pushed to the scan
    assert "PartitionFilters" in plan and "bucket" in plan
    assert "PushedFilters" in plan and "dim" in plan


def test_bucketed_probe_reads_fewer_files(spark, tmp_path):
    """A query over a few dims reads only its buckets' files: the layout
    contract at SPLADE vocab sizes, measured by actual files read."""
    vocab, n_docs, n_buckets = 64, 200, 8
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_sort(F.array_distinct(F.transform(
                F.sequence(F.lit(0), F.lit(9)),
                lambda i: F.pmod(F.xxhash64(F.col("id"), i),
                                 F.lit(vocab)).cast("int"),
            ))).alias("indices"),
        )
        .withColumn(
            "values",
            F.transform("indices", lambda d: F.lit(1.0)).cast("array<float>"),
        )
    )
    path = str(tmp_path / "bucketed_vocab64")
    sparse_persist_inverted(sparse_invert(docs), path,
                            bucket_dims=n_buckets)
    postings = spark.read.parquet(path)
    qi, qv = [0, 8], [1.0, 1.0]  # both dims hash to bucket 0
    # input_file_name() reflects the files the PRUNED scan actually reads
    # (Dataset.inputFiles lists the whole relation, pruning or not)
    hits = postings.filter(
        F.col("bucket").isin([0]) & F.col("dim").isin(qi)
    )
    files = {r[0] for r in
             hits.select(F.input_file_name()).distinct().collect()}
    assert files and all("bucket=0" in f for f in files)
    # and the query itself returns rows from that pruned read
    got = sparse_topk_inverted(postings, qi, qv, k=5,
                               bucket_dims=n_buckets).collect()
    assert len(got) == 5


def test_read_inverted_detects_unbucketed_layout(spark, sparse_docs,
                                                 tmp_path):
    from vectordb_cloud_spark.operators.sparse import sparse_read_inverted

    path = str(tmp_path / "postings_plain")
    sparse_persist_inverted(sparse_invert(sparse_docs), path)
    postings, n_buckets = sparse_read_inverted(spark, path)
    assert n_buckets is None
    got = sparse_topk_inverted(postings, QI, QV, k=10).collect()
    assert [r["id"] for r in got] == [2, 1, 5, 3]


def test_sparse_dot_to_duplicate_dims_and_nonfinite_stored(spark):
    """ADVICE r10: the map-fold builder itself (a) sums duplicate query
    dims driver-side instead of throwing Spark's duplicate-map-key error
    at runtime (the public search entries still reject duplicates up
    front), and (b) never multiplies a stored dim outside the query's
    support — a non-finite stored value there contributes exact +0.0,
    exactly as the old per-query-dim chain behaved."""
    import pytest as _pytest

    from vectordb_cloud_spark.operators.sparse import sparse_dot_to

    df = spark.createDataFrame(
        [(1, [0, 3, 7], [1.0, float("inf"), 2.0]),
         (2, [3, 5], [float("nan"), 1.0])],
        "doc_id long, indices array<int>, values array<float>")
    score = sparse_dot_to("indices", "values", [0, 7, 0], [1.0, 2.0, 0.5])
    got = {r["doc_id"]: r["s"]
           for r in df.select("doc_id", score.alias("s")).collect()}
    # dim 0 weight folds to 1.0 + 0.5; stored inf at unqueried dim 3 is a
    # null-key branch, never multiplied
    assert got[1] == _pytest.approx(1.5 * 1.0 + 2.0 * 2.0)
    assert got[2] == 0.0  # stored NaN at dim 3, dim 3 not in query


def test_sparse_dot_duplicate_dims_overflow_falls_back(spark):
    """Two FINITE duplicate-dim values whose sum overflows to inf must not
    render an 'inf' map literal (F.expr would throw at parse time) — the
    finiteness guard applies to the SUMMED per-dim values, and the
    element-wise chain serves the query (r11 review)."""
    import math as _math

    from vectordb_cloud_spark.operators.sparse import sparse_dot_to

    big = 1.7e308
    df = spark.createDataFrame(
        [(1, [3], [1.0]), (2, [4], [1.0])],
        "doc_id long, indices array<int>, values array<double>")
    out = {r["doc_id"]: r["s"] for r in df.select(
        F.col("doc_id"),
        sparse_dot_to("indices", "values", [3, 3], [big, big]).alias("s"),
    ).collect()}
    assert _math.isinf(out[1]) and out[2] == 0.0
