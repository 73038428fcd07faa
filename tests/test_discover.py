"""Discovery / context search vs a NumPy ground-truth reranker."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.discover import (
    context_search,
    discover,
)


@pytest.fixture(scope="module")
def emb_rows(embeddings):
    return [(r["vec_id"], np.array(r["embedding"], dtype=np.float64))
            for r in embeddings.collect()]


def _vec(emb_rows, vid):
    return dict(emb_rows)[vid].tolist()


def _truth(emb_rows, target, pairs, k, with_target=True):
    scored = []
    for vid, v in emb_rows:
        cs = sum(
            1 for pos, neg in pairs
            if np.linalg.norm(v - np.array(pos)) < np.linalg.norm(v - np.array(neg))
        )
        td = float(np.linalg.norm(v - np.array(target))) if with_target else 0.0
        scored.append((vid, cs, td))
    scored.sort(key=lambda t: (-t[1], t[2], t[0]))
    return scored[:k]


def test_discover_matches_numpy(embeddings, emb_rows):
    target = _vec(emb_rows, 0)
    pairs = [(_vec(emb_rows, 1), _vec(emb_rows, 2)),
             (_vec(emb_rows, 3), _vec(emb_rows, 4)),
             (_vec(emb_rows, 5), _vec(emb_rows, 6))]
    got = discover(embeddings, target, pairs, k=8).collect()
    want = _truth(emb_rows, target, pairs, k=8)
    assert [r["vec_id"] for r in got] == [t[0] for t in want]
    assert [r["context_score"] for r in got] == [t[1] for t in want]
    for r, t in zip(got, want):
        assert r["target_dist"] == pytest.approx(t[2], rel=1e-9)


def test_discover_respects_filters(embeddings, emb_rows):
    target = _vec(emb_rows, 0)
    pairs = [(_vec(emb_rows, 1), _vec(emb_rows, 2))]
    got = discover(embeddings, target, pairs, k=5,
                   filters=F.col("label") == 3).collect()
    assert got and all(r["label"] == 3 for r in got)


def test_context_search_rank_is_score_then_id(embeddings, emb_rows):
    pairs = [(_vec(emb_rows, 1), _vec(emb_rows, 2)),
             (_vec(emb_rows, 3), _vec(emb_rows, 4))]
    got = context_search(embeddings, pairs, k=10).collect()
    keys = [(-r["context_score"], r["vec_id"]) for r in got]
    assert keys == sorted(keys)
    # top row really does carry a maximal context score
    truth = _truth(emb_rows, [0.0] * 64, pairs, k=1, with_target=False)
    assert got[0]["context_score"] == truth[0][1]


def test_discover_plan_is_jvm_topk(embeddings, emb_rows):
    target = _vec(emb_rows, 0)
    pairs = [(_vec(emb_rows, 1), _vec(emb_rows, 2))]
    plan = discover(embeddings, target, pairs, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_empty_pairs_rejected(embeddings):
    with pytest.raises(ValueError):
        discover(embeddings, [0.0] * 64, [], k=5)
