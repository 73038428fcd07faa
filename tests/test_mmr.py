"""MMR diversity reranking + Qdrant nearest/by-id query forms (r12).

Ground truth: an independent numpy replay of the greedy
Carbonell-Goldstein selection over the exact candidate pool.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.query_api import query_points


@pytest.fixture(scope="module")
def emb_rows(embeddings):
    return [(r["vec_id"], np.array(r["embedding"], dtype=np.float64))
            for r in embeddings.collect()]


def _vec(emb_rows, vid):
    return dict(emb_rows)[vid].tolist()


def _mmr_replay(emb_rows, qv, k, diversity, pool_n, exclude=()):
    """Independent greedy replay: pool = exact top-pool_n by L2 (id
    tiebreak), rel = -dist, pairwise sim = -euclid."""
    q = np.asarray(qv)
    scored = sorted(
        (float(np.linalg.norm(v - q)), vid, v)
        for vid, v in emb_rows if vid not in exclude
    )[:pool_n]
    ids = [vid for _, vid, _ in scored]
    rel = {vid: -d for d, vid, _ in scored}
    vecs = {vid: v for _, vid, v in scored}
    chosen = []
    while len(chosen) < min(k, len(ids)):
        best, best_score = None, None
        for vid in ids:
            if vid in chosen:
                continue
            if not chosen:
                s = rel[vid]
            else:
                red = max(-float(np.linalg.norm(vecs[vid] - vecs[c]))
                          for c in chosen)
                s = (1 - diversity) * rel[vid] - diversity * red
            if best_score is None or s > best_score:
                best, best_score = vid, s
        chosen.append(best)
    return chosen


def test_mmr_matches_numpy_greedy(embeddings, emb_rows):
    qv = _vec(emb_rows, 0)
    for d in (0.0, 0.3, 0.7, 1.0):
        got = query_points(
            embeddings, {"nearest": qv,
                         "mmr": {"diversity": d, "candidates_limit": 24}},
            limit=6, id_col="vec_id",
        ).collect()
        want = _mmr_replay(emb_rows, qv, 6, d, 24)
        assert [r["vec_id"] for r in got] == want, f"diversity={d}"
        assert [r["mmr_rank"] for r in got] == list(range(6))
    # diversity=0 degenerates to the plain kNN order
    knn = query_points(embeddings, qv, limit=6, id_col="vec_id").collect()
    mmr0 = query_points(
        embeddings, {"nearest": qv, "mmr": {"diversity": 0.0}},
        limit=6, id_col="vec_id").collect()
    assert [r["vec_id"] for r in mmr0] == [r["vec_id"] for r in knn]


def test_mmr_first_pick_and_diversity_extreme(embeddings, emb_rows):
    """The first selection is always the most relevant candidate; at
    diversity=1 later picks maximize distance from the selected set."""
    qv = _vec(emb_rows, 3)
    got = query_points(
        embeddings, {"nearest": qv, "mmr": {"diversity": 1.0,
                                            "candidates_limit": 16}},
        limit=4, id_col="vec_id").collect()
    knn1 = query_points(embeddings, qv, limit=1, id_col="vec_id").first()
    assert got[0]["vec_id"] == knn1["vec_id"]
    assert _mmr_replay(emb_rows, qv, 4, 1.0, 16) == \
        [r["vec_id"] for r in got]


def test_nearest_unwrap_and_query_by_id(embeddings, emb_rows):
    qv = _vec(emb_rows, 5)
    bare = query_points(embeddings, qv, limit=5, id_col="vec_id").collect()
    wrapped = query_points(embeddings, {"nearest": qv}, limit=5,
                           id_col="vec_id").collect()
    assert [r["vec_id"] for r in wrapped] == [r["vec_id"] for r in bare]
    # by-id: uses point 5's stored vector, excludes point 5 itself (and
    # still fills the limit from the next-nearest rank)
    by_id = query_points(embeddings, 5, limit=5, id_col="vec_id").collect()
    assert 5 not in [r["vec_id"] for r in by_id]
    bare6 = query_points(embeddings, qv, limit=6, id_col="vec_id").collect()
    assert [r["vec_id"] for r in by_id] == \
        [r["vec_id"] for r in bare6 if r["vec_id"] != 5][:5]
    # {"nearest": id} is the same thing
    by_id2 = query_points(embeddings, {"nearest": 5}, limit=5,
                          id_col="vec_id").collect()
    assert [r["vec_id"] for r in by_id2] == [r["vec_id"] for r in by_id]
    # missing id is loud
    with pytest.raises(ValueError, match="not found"):
        query_points(embeddings, 10**12, limit=5, id_col="vec_id")


def test_query_by_id_in_prefetch_leg(embeddings, emb_rows):
    """A prefetch leg's query may be a point id too: the leg scores with
    the stored vector and never returns the example row."""
    got = query_points(
        embeddings, {"fusion": "rrf"},
        prefetch=[{"query": {"nearest": 7}, "limit": 10}],
        limit=10, id_col="vec_id",
    ).collect()
    assert got and 7 not in [r["vec_id"] for r in got]
    # single-leg rrf preserves the leg's rank order = kNN from 7's vector
    want = query_points(embeddings, 7, limit=10, id_col="vec_id").collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]


def test_mmr_composes_with_prefetch_filter_threshold(embeddings, emb_rows):
    """MMR over a prefetch candidate union; filters and score_threshold
    restrict the pool before selection."""
    qv = _vec(emb_rows, 0)
    pre = [{"query": qv, "limit": 12}]
    got = query_points(
        embeddings, {"nearest": qv, "mmr": {"diversity": 0.5,
                                            "candidates_limit": 12}},
        prefetch=pre, limit=4, id_col="vec_id").collect()
    # pool == the leg's 12 candidates == exact top-12, so the selection
    # equals the single-stage replay over the same pool
    assert [r["vec_id"] for r in got] == _mmr_replay(emb_rows, qv, 4, 0.5, 12)
    # filter: only label 3 candidates are selectable
    flt = query_points(
        embeddings, {"nearest": qv, "mmr": {"diversity": 0.5}},
        query_filter={"must": [{"key": "label", "match": {"value": 3}}]},
        limit=4, id_col="vec_id").collect()
    labels = {r["vec_id"]: r["label"] for r in flt}
    assert flt and all(v == 3 for v in labels.values())
    # threshold: no selected point is worse than the cut
    ranked = query_points(embeddings, qv, limit=10, id_col="vec_id").collect()
    t = (ranked[4]["dist"] + ranked[5]["dist"]) / 2
    cut = query_points(
        embeddings, {"nearest": qv, "mmr": {"diversity": 0.9,
                                            "candidates_limit": 32}},
        limit=8, id_col="vec_id", score_threshold=t).collect()
    assert cut and len(cut) == 5 and all(r["dist"] <= t for r in cut)
    assert {r["vec_id"] for r in cut} == {r["vec_id"] for r in ranked[:5]}


def test_mmr_rejections(embeddings, emb_rows):
    qv = _vec(emb_rows, 0)
    with pytest.raises(ValueError, match="diversity"):
        query_points(embeddings, {"nearest": qv, "mmr": {"diversity": 1.5}},
                     limit=3, id_col="vec_id").collect()
    with pytest.raises(ValueError, match="dense"):
        query_points(embeddings,
                     {"nearest": {"indices": [1], "values": [1.0]},
                      "mmr": {}}, limit=3, id_col="vec_id")
    with pytest.raises(ValueError, match="group_by"):
        query_points(embeddings, {"nearest": qv, "mmr": {}},
                     group_by="label", limit=3, id_col="vec_id")
    with pytest.raises(ValueError, match="top-level"):
        query_points(embeddings, {"fusion": "rrf"},
                     prefetch=[{"query": {"nearest": qv, "mmr": {}},
                                "limit": 5}], limit=3, id_col="vec_id")
    with pytest.raises(ValueError, match="candidates_limit"):
        query_points(embeddings,
                     {"nearest": qv, "mmr": {"candidates_limit": 2}},
                     limit=5, id_col="vec_id").collect()
    with pytest.raises(ValueError, match="beside 'nearest'"):
        query_points(embeddings, {"nearest": qv, "bogus": 1}, limit=3,
                     id_col="vec_id")


def test_mmr_pool_is_hard_bounded(embeddings, emb_rows):
    """The bounded-collect contract is enforced, not advisory: explicit
    pools above MAX_CANDIDATES_LIMIT are rejected loudly BEFORE any scan,
    and the default pool clamps up to k instead of self-rejecting when
    limit+offset exceeds the 1024 soft cap (ADVICE r12)."""
    from vectordb_cloud_spark.operators.mmr import (MAX_CANDIDATES_LIMIT,
                                                    mmr_search)

    qv = _vec(emb_rows, 0)
    with pytest.raises(ValueError, match="ceiling"):
        query_points(
            embeddings,
            {"nearest": qv, "mmr": {"candidates_limit": 10_000_000}},
            limit=5, id_col="vec_id")
    # default pool with k > 1024: no self-inflicted ValueError — the
    # default clamps to k (pool is the whole small fixture, so every row
    # comes back)
    n = embeddings.count()
    got = query_points(embeddings, {"nearest": qv, "mmr": {}},
                       limit=1500, id_col="vec_id").collect()
    assert len(got) == min(1500, n)
    # k itself above the ceiling is the same loud error
    with pytest.raises(ValueError, match="ceiling"):
        mmr_search(embeddings, qv, k=MAX_CANDIDATES_LIMIT + 1,
                   id_col="vec_id")
    # unsupported metric fails up front, before the scan + collect
    with pytest.raises(ValueError, match="metric"):
        mmr_search(embeddings, qv, k=3, metric="manhattan",
                   id_col="vec_id")


def test_mmr_and_by_id_through_the_service(spark, tmp_path):
    """VectorService.query passes the forms through: {"nearest": {"text"}}
    embeds, by-id resolves + self-excludes, mmr_rank rides the response."""
    from vectordb_cloud_spark.api import VectorService

    svc = VectorService(spark, str(tmp_path / "cat"), dim=16)
    texts = ["alpha beta", "alpha beta gamma", "delta epsilon",
             "zeta eta theta", "iota kappa"]
    for i, t in enumerate(texts):
        assert svc.insert(i + 1, 9, t, "s", "en") == 1
    plain = svc.query(9, {"query": {"text": "alpha"}, "limit": 3})
    near = svc.query(9, {"query": {"nearest": {"text": "alpha"}},
                         "limit": 3})
    assert [h["id"] for h in near] == [h["id"] for h in plain]
    mmr = svc.query(9, {"query": {"nearest": {"text": "alpha"},
                                  "mmr": {"diversity": 0.4}}, "limit": 3})
    assert [h["mmr_rank"] for h in mmr] == [0, 1, 2]
    assert mmr[0]["id"] == plain[0]["id"]  # first pick = most relevant
    by_id = svc.query(9, {"query": 2, "limit": 4})
    assert by_id and 2 not in [h["id"] for h in by_id]
