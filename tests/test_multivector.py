"""Multivector MaxSim search vs a NumPy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.multivector import (
    maxsim_score,
    multivector_topk,
    pooled_vector,
    split_into_tokens,
)

N_TOKENS = 4


@pytest.fixture(scope="module")
def mv(embeddings):
    return embeddings.select(
        "vec_id", "label",
        split_into_tokens("embedding", N_TOKENS).alias("token_vectors"),
    ).cache()


@pytest.fixture(scope="module")
def mv_rows(mv):
    return [(r["vec_id"], np.array(r["token_vectors"], dtype=np.float64))
            for r in mv.collect()]


def _truth(mv_rows, q, k):
    qm = np.array(q)
    scored = [
        (vid, float(sum((qm @ d.T).max(axis=1))))
        for vid, d in mv_rows
    ]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def test_split_shapes(mv):
    row = mv.first()
    toks = row["token_vectors"]
    assert len(toks) == N_TOKENS
    assert all(len(t) == 64 // N_TOKENS for t in toks)


def test_split_roundtrip_flatten(embeddings, mv):
    flat = mv.select(
        "vec_id", F.flatten("token_vectors").alias("back")
    ).join(embeddings.select("vec_id", "embedding"), "vec_id")
    bad = flat.filter(
        F.col("back").cast("array<float>") != F.col("embedding")
    ).count()
    assert bad == 0


def test_maxsim_matches_numpy(mv, mv_rows):
    q = dict(mv_rows)[0].tolist()
    got = multivector_topk(mv, q, k=7, filters=F.col("vec_id") != 0).collect()
    want = [t for t in _truth(mv_rows, q, k=8) if t[0] != 0][:7]
    assert [r["vec_id"] for r in got] == [t[0] for t in want]
    for r, t in zip(got, want):
        assert r["maxsim"] == pytest.approx(t[1], rel=1e-9)


def test_maxsim_self_match_is_top(mv, mv_rows):
    q = dict(mv_rows)[5].tolist()
    top = multivector_topk(mv, q, k=1).first()
    assert top["vec_id"] == 5  # a point MaxSims itself best


def test_single_token_reduces_to_dot_topk(mv, mv_rows):
    # one query token == plain max-dot-product search over token pool
    q = [dict(mv_rows)[3][0].tolist()]
    got = multivector_topk(mv, q, k=5).collect()
    want = _truth(mv_rows, np.array(q), k=5)
    assert [r["vec_id"] for r in got] == [t[0] for t in want]


def test_pooled_vector_is_token_mean(mv, mv_rows):
    got = mv.filter(F.col("vec_id") == 2).select(
        pooled_vector("token_vectors").alias("p")
    ).first()["p"]
    want = dict(mv_rows)[2].mean(axis=0)
    assert np.allclose(got, want, rtol=1e-9)


def test_plan_is_jvm_topk(mv, mv_rows):
    q = dict(mv_rows)[0].tolist()
    plan = multivector_topk(mv, q, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_empty_query_rejected(mv):
    with pytest.raises(ValueError):
        maxsim_score("token_vectors", [])
