"""Product quantization: encoding validity, compression, and ADC recall."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.ann import brute_force_topk, recall_at_k
from vectordb_cloud_spark.operators.pq import pq_encode, pq_search, pq_train


@pytest.fixture(scope="module")
def pq_index(embeddings):
    codebooks = pq_train(embeddings, m_subvectors=8, k_codes=16)
    encoded = pq_encode(embeddings, codebooks).select("vec_id", "pq_code").cache()
    encoded.count()
    return codebooks, encoded


def test_codebook_shape(pq_index):
    codebooks, _ = pq_index
    assert len(codebooks) == 8
    assert all(len(book) == 16 for book in codebooks)
    assert all(len(c) == 8 for book in codebooks for c in book)  # 64/8 dims


def test_codes_valid_and_compressed(pq_index, embeddings):
    _, encoded = pq_index
    stats = encoded.select(
        F.size("pq_code").alias("m"),
        F.array_min("pq_code").alias("lo"),
        F.array_max("pq_code").alias("hi"),
    ).agg(F.min("m"), F.max("m"), F.min("lo"), F.max("hi")).collect()[0]
    assert stats[0] == stats[1] == 8  # M codes per vector
    assert stats[2] >= 0 and stats[3] < 16  # codes within codebook range
    assert encoded.count() == embeddings.count()


def test_adc_recall_vs_exact(pq_index, embeddings):
    codebooks, encoded = pq_index
    q = [float(x) for x in embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = brute_force_topk(embeddings, q, k=10)
    # rerank window: ADC top-30 then exact top-10 would be the real deploy;
    # raw ADC top-10 recall floor keeps the test honest about quantization loss
    approx = pq_search(encoded, codebooks, q, k=10)
    r = recall_at_k(approx, exact, "vec_id")
    assert r >= 0.2  # 256x-compressed codes on random 64-dim data

    # PQ + rerank: ADC candidates -> exact distances -> top-10 (the standard
    # two-stage deployment) must beat raw ADC
    cand = pq_search(encoded, codebooks, q, k=50).select("vec_id")
    rerank_pool = embeddings.join(cand, "vec_id")
    reranked = brute_force_topk(rerank_pool, q, k=10)
    r2 = recall_at_k(reranked, exact, "vec_id")
    assert r2 >= r


def test_ivfpq_residual_encoding_and_search(embeddings):
    """IVF-PQ composition (FAISS IVFPQ shape): coarse routing + residual
    codes. Recall floors are honest about quantization loss on the
    uniform-random fixture (residual encoding only clearly beats raw PQ on
    clustered data); the rerank stage is the production-quality path."""
    from vectordb_cloud_spark.operators.pq import ivfpq_build, ivfpq_search

    q = [float(x) for x in embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = brute_force_topk(embeddings, q, k=10)

    centers, codebooks, encoded = ivfpq_build(
        embeddings, k_centroids=4, m_subvectors=8, k_codes=16
    )
    encoded = encoded.cache()
    assert set(encoded.columns) == {"vec_id", "centroid_id", "pq_code"}
    assert encoded.count() == embeddings.count()
    # every code row routes to a real centroid
    cids = {r[0] for r in encoded.select("centroid_id").distinct().collect()}
    assert cids.issubset({c[0] for c in centers})

    # full probe: every list searched -> pure residual-ADC quality
    approx = ivfpq_search(encoded, centers, codebooks, q, k=10, nprobe=4)
    r_full = recall_at_k(approx, exact, "vec_id")
    assert r_full >= 0.2  # 8-byte codes on random 64-dim data

    # partial probe stays sane (routing loses at most the unprobed lists)
    approx2 = ivfpq_search(encoded, centers, codebooks, q, k=10, nprobe=2)
    assert recall_at_k(approx2, exact, "vec_id") >= 0.1

    # ADC candidates -> exact rerank (the standard two-stage deployment)
    cand = ivfpq_search(encoded, centers, codebooks, q, k=50, nprobe=4).select("vec_id")
    reranked = brute_force_topk(embeddings.join(cand, "vec_id"), q, k=10)
    assert recall_at_k(reranked, exact, "vec_id") >= r_full
    encoded.unpersist()
