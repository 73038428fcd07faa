"""Scalar (int8) and binary quantization — codes valid, reconstruction
error bounded, recall vs exact, full-oversample == exact, JVM-only plans.
Same gate style as test_pq.py (the third member of the quantization
family)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.ann import brute_force_topk, recall_at_k
from vectordb_cloud_spark.operators.sq import (
    bq_encode,
    bq_search,
    bq_train,
    sq_encode,
    sq_search,
    sq_train,
)


@pytest.fixture(scope="module")
def qvec(embeddings):
    row = embeddings.filter(F.col("vec_id") == 0).first()
    return [float(x) for x in row["embedding"]]


@pytest.fixture(scope="module")
def sq_stats(embeddings):
    return sq_train(embeddings)


@pytest.fixture(scope="module")
def sq_encoded(embeddings, sq_stats):
    mins, maxs = sq_stats
    return sq_encode(embeddings, mins, maxs).cache()


def test_sq_codes_are_int8_and_bounded(sq_encoded):
    row = sq_encoded.select("sq_code").first()
    codes = row["sq_code"]
    assert len(codes) == 64
    assert all(-128 <= c <= 127 for c in codes)


def test_sq_reconstruction_error_within_half_step(sq_encoded, sq_stats):
    """Equal-width quantization guarantee: |dequant(x) - x| <= step/2."""
    mins, maxs = sq_stats
    step = (np.asarray(maxs) - np.asarray(mins)) / 255.0
    rows = sq_encoded.select("embedding", "sq_code").limit(50).collect()
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        deq = (np.asarray(r["sq_code"], dtype=np.float64) + 128.0) * step + mins
        assert np.all(np.abs(deq - x) <= step / 2 + 1e-9)


def test_sq_search_recall_vs_exact(embeddings, sq_encoded, sq_stats, qvec):
    """int8 on 64 dims loses little: near-exact top-k expected."""
    mins, maxs = sq_stats
    exact = brute_force_topk(embeddings, qvec, k=10)
    approx = sq_search(sq_encoded, mins, maxs, qvec, k=10, tiebreak="vec_id")
    assert recall_at_k(approx, exact, "vec_id") >= 0.8


def test_sq_search_with_filter(sq_encoded, sq_stats, qvec):
    mins, maxs = sq_stats
    got = sq_search(sq_encoded, mins, maxs, qvec, k=5,
                    filters=F.col("label") == 2, tiebreak="vec_id")
    assert all(r["label"] == 2 for r in got.collect())


def test_sq_search_plan_is_jvm_only(sq_encoded, sq_stats, qvec):
    from vectordb_cloud_spark.plans.inspect import explain_str

    mins, maxs = sq_stats
    plan = explain_str(sq_search(sq_encoded, mins, maxs, qvec, k=10),
                       mode="simple")
    assert not any(tok in plan for tok in
                   ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))


@pytest.fixture(scope="module")
def bq_thresholds(embeddings):
    return bq_train(embeddings)


@pytest.fixture(scope="module")
def bq_encoded(embeddings, bq_thresholds):
    return bq_encode(embeddings, bq_thresholds).cache()


def test_bq_words_match_numpy_packing(bq_encoded, bq_thresholds):
    t = np.asarray(bq_thresholds)
    rows = bq_encoded.select("embedding", "bq_code").limit(20).collect()
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        want = 0
        for j, b in enumerate((x > t).astype(int)):
            want |= int(b) << j
        if want >= 1 << 63:
            want -= 1 << 64
        assert len(r["bq_code"]) == 1  # 64 dims -> one word
        assert r["bq_code"][0] == want


def test_bq_full_oversample_equals_exact(embeddings, bq_encoded,
                                         bq_thresholds, qvec):
    """Rescoring every row (oversample >= corpus) IS brute force."""
    n = embeddings.count()
    exact = brute_force_topk(embeddings, qvec, k=10)
    got = bq_search(bq_encoded, embeddings, bq_thresholds, qvec, k=10,
                    oversample=n, tiebreak="vec_id")
    assert recall_at_k(got, exact, "vec_id") == 1.0


def test_bq_search_recall_with_modest_oversample(embeddings, bq_encoded,
                                                 bq_thresholds, qvec):
    exact = brute_force_topk(embeddings, qvec, k=10)
    got = bq_search(bq_encoded, embeddings, bq_thresholds, qvec, k=10,
                    oversample=8, tiebreak="vec_id")
    assert got.count() == 10
    assert recall_at_k(got, exact, "vec_id") >= 0.3


def test_bq_hamming_phase_is_jvm_only(bq_encoded, bq_thresholds, qvec):
    """The scan phase (codes -> hamming) must stay in codegen; the rescore
    runs through knn-style exact scoring which is plan-gated elsewhere."""
    from vectordb_cloud_spark.plans.inspect import explain_str

    code = F.col("bq_code")
    probe = bq_encoded.withColumn(
        "hamming",
        F.bit_count(F.element_at(code, 1).bitwiseXOR(F.lit(0).cast("long"))),
    )
    plan = explain_str(probe, mode="simple")
    assert not any(tok in plan for tok in
                   ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))


def test_sq_bq_dim_1024(spark):
    """Dim-robustness gate (VERDICT r6 #2): train/encode/search at a real
    embedding width. The old train emitted 2x1024 aggregate expressions and
    the old bit-pack chained 1024 adds — plan-compile blowups; the
    posexplode-stats + aggregate-folded forms must handle dim 1024 in
    ordinary wall-clock time (loose bound as a regression tripwire)."""
    import time

    t0 = time.time()
    dim, n = 1024, 300
    vecs = (
        spark.range(n)
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000))
                           - 1000.0) / 1000.0,
            ).cast("array<float>"),
        )
        .withColumnRenamed("id", "vec_id")
    ).cache()
    qv = [float(x) for x in
          vecs.filter(F.col("vec_id") == 0).first()["embedding"]]

    mins, maxs = sq_train(vecs)
    assert len(mins) == dim == len(maxs)
    enc = sq_encode(vecs, mins, maxs)
    got = sq_search(enc, mins, maxs, qv, k=5, tiebreak="vec_id").collect()
    assert got[0]["vec_id"] == 0  # int8 at dim 1024 still finds the query

    thr = bq_train(vecs)
    assert len(thr) == dim
    bq = bq_encode(vecs, thr)
    row = bq.select("bq_code").first()
    assert len(row["bq_code"]) == dim // 64  # 16 packed words
    exact = brute_force_topk(vecs, qv, k=5)
    full = bq_search(bq, vecs, thr, qv, k=5, oversample=n, tiebreak="vec_id")
    assert recall_at_k(full, exact, "vec_id") == 1.0
    # the regression this test guards is PLAN-SHAPE, not machine speed
    # (the old forms put ~2x1024 aggregate expressions / 1024 chained
    # shiftlefts into one stage): gate the explain() size directly instead
    # of wall clock, which flakes on contended runners. The folded forms
    # explain in a few KB regardless of dim; a per-dim expression blowup
    # at dim 1024 is megabytes.
    from vectordb_cloud_spark.plans.inspect import explain_str

    # the folded forms put O(words)=dim/64 expression nodes in the plan
    # (plan TEXT still scales with dim via printed literal arrays — that's
    # fine); the old per-dim chains would put ~dim occurrences here
    for df in (enc.select("sq_code"), bq.select("bq_code")):
        plan = explain_str(df, mode="simple")
        for tok in ("shiftleft", "zip_with", "aggregate"):
            assert plan.count(tok) <= dim // 16, (tok, plan.count(tok))
    vecs.unpersist()
    assert time.time() - t0 < 600  # generous tripwire only


def test_ivf_sq_layout_prunes_and_rescores(spark, embeddings, sq_stats, qvec,
                                           tmp_path):
    """IVF + SQ8 composed: partition pruning AND compressed lists, exact
    distances after rescore; full-probe full-oversample == brute force."""
    from vectordb_cloud_spark.operators.ann import ivf_build
    from vectordb_cloud_spark.operators.sq import ivf_sq_persist, ivf_sq_search

    mins, maxs = sq_stats
    centers, _ = ivf_build(embeddings, k_centroids=4)
    path = str(tmp_path / "ivf_sq")
    ivf_sq_persist(embeddings, centers, mins, maxs, path)

    # layout holds codes, not vectors
    cols = set(spark.read.parquet(path).columns)
    assert cols == {"vec_id", "sq_code", "centroid_id"}

    n = embeddings.count()
    exact = brute_force_topk(embeddings, qvec, k=10)
    full = ivf_sq_search(spark, path, embeddings, centers, mins, maxs, qvec,
                         k=10, nprobe=4, oversample=n)
    assert recall_at_k(full, exact, "vec_id") == 1.0
    # rescored distances are EXACT (match brute force bit-for-bit)
    de = {r["vec_id"]: r["dist"] for r in exact.collect()}
    for r in full.collect():
        assert abs(r["dist"] - de[r["vec_id"]]) < 1e-9

    part = ivf_sq_search(spark, path, embeddings, centers, mins, maxs, qvec,
                         k=10, nprobe=3, oversample=2)
    assert part.count() == 10
    assert recall_at_k(part, exact, "vec_id") >= 0.5
