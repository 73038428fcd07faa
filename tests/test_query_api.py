"""Universal query API: every dispatch branch against its ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.query_api import dbsf_fuse, query_points


@pytest.fixture(scope="module")
def emb_rows(embeddings):
    return [(r["vec_id"], np.array(r["embedding"], dtype=np.float64))
            for r in embeddings.collect()]


def _vec(emb_rows, vid):
    return dict(emb_rows)[vid].tolist()


def test_plain_vector_query_equals_knn(embeddings, emb_rows):
    from vectordb_cloud_spark.operators.knn import knn_search

    q = _vec(emb_rows, 0)
    got = query_points(embeddings, query=q, limit=5,
                       query_filter={"must": [{"key": "vec_id",
                                               "range": {"gt": 0}}]})
    want = knn_search(embeddings, q, k=5, filters=F.col("vec_id") > 0,
                      tiebreak="vec_id")
    assert [r["vec_id"] for r in got.collect()] == \
        [r["vec_id"] for r in want.collect()]


def test_scroll_sample_recommend_discover_branches(embeddings, emb_rows):
    # scroll page
    page = query_points(embeddings, limit=4)
    assert [r["vec_id"] for r in page.collect()] == [0, 1, 2, 3]
    # random sample: deterministic per seed, filter respected
    s1 = query_points(embeddings, {"sample": "random"}, limit=5, seed=3,
                      query_filter={"must": [{"key": "label",
                                              "match": {"value": 3}}]})
    s2 = query_points(embeddings, {"sample": "random"}, limit=5, seed=3,
                      query_filter={"must": [{"key": "label",
                                              "match": {"value": 3}}]})
    r1, r2 = s1.collect(), s2.collect()
    assert [r["vec_id"] for r in r1] == [r["vec_id"] for r in r2]
    assert all(r["label"] == 3 for r in r1)
    # recommend delegates (mean-difference query, examples excluded)
    rec = query_points(embeddings, {"recommend": {"positive": [0, 1],
                                                  "negative": [2]}}, limit=5)
    ids = [r["vec_id"] for r in rec.collect()]
    assert len(ids) == 5 and not {0, 1, 2} & set(ids)
    # discover delegates
    disc = query_points(embeddings, {"discover": {
        "target": _vec(emb_rows, 0),
        "context": [{"positive": _vec(emb_rows, 1),
                     "negative": _vec(emb_rows, 2)}],
    }}, limit=5)
    assert disc.count() == 5 and "context_score" in disc.columns


def test_prefetch_rescore_two_stage(embeddings, emb_rows):
    q = _vec(emb_rows, 0)
    out = query_points(
        embeddings, query=q,
        prefetch=[{"query": q, "limit": 50}],
        limit=5,
        query_filter={"must": [{"key": "vec_id", "range": {"gt": 0}}]},
    ).collect()
    # candidates covered the true top-5, so two-stage == exact
    truth = sorted(
        ((float(np.linalg.norm(v - np.array(q))), vid)
         for vid, v in emb_rows if vid > 0)
    )[:5]
    assert [r["vec_id"] for r in out] == [vid for _, vid in truth]


def test_prefetch_rrf_and_dbsf_fusion(embeddings, emb_rows):
    q0, q1 = _vec(emb_rows, 0), _vec(emb_rows, 1)
    pre = [{"query": q0, "limit": 10}, {"query": q1, "limit": 10}]
    rrf = query_points(embeddings, {"fusion": "rrf"}, prefetch=pre, limit=5)
    assert rrf.count() == 5 and "rrf_score" in rrf.columns
    # both self-hits rank at the very top of their own lists -> both fused in
    top_ids = {r["vec_id"] for r in rrf.collect()}
    assert {0, 1} <= top_ids
    dbsf = query_points(embeddings, {"fusion": "dbsf"}, prefetch=pre, limit=5)
    assert dbsf.count() == 5 and "dbsf_score" in dbsf.columns
    assert {0, 1} <= {r["vec_id"] for r in dbsf.collect()}


def test_dbsf_normalization_direction(spark):
    # lower dist must mean higher fused score
    a = spark.createDataFrame([(1, 0.1), (2, 1.0), (3, 2.0)],
                              "vec_id long, dist double")
    fused = dbsf_fuse([a], k=3)
    assert [r["vec_id"] for r in fused.collect()] == [1, 2, 3]


def test_query_api_errors(embeddings):
    with pytest.raises(ValueError, match="fusion"):
        query_points(embeddings, {"fusion": "bogus"},
                     prefetch=[{"query": [0.0] * 64}])
    with pytest.raises(ValueError, match="prefetch requires"):
        query_points(embeddings, {"sample": "random"},
                     prefetch=[{"query": [0.0] * 64}])
    with pytest.raises(ValueError, match="'query'"):
        query_points(embeddings, {"fusion": "rrf"}, prefetch=[{"limit": 5}])
    # r12: a bare int is a query-by-stored-point-id now (Qdrant parity),
    # so the unsupported-shape probe uses a float instead
    with pytest.raises(ValueError, match="unsupported query"):
        query_points(embeddings, query=4.2)


def test_query_points_sparse_branch(spark):
    """Qdrant SparseVector query through the universal endpoint: `using`
    names a collection-convention sparse column pair; bare indices/values
    columns work with using=None."""
    from vectordb_cloud_spark.query_api import query_points

    df = spark.createDataFrame(
        [(1, [2, 7], [1.0, 2.0], "a"), (2, [7, 13], [3.0, 1.0], "b"),
         (3, [13, 40], [2.0, 2.0], "a")],
        "vec_id long, sparse_text_indices array<int>, "
        "sparse_text_values array<float>, grp string",
    )
    got = query_points(df, query={"indices": [7, 13], "values": [1.0, 1.0]},
                       using="text", limit=3)
    rows = [(r["vec_id"], r["score"]) for r in got.collect()]
    assert rows == [(2, 4.0), (1, 2.0), (3, 2.0)]
    flt = query_points(df, query={"indices": [7, 13], "values": [1.0, 1.0]},
                       using="text", limit=3,
                       query_filter={"must": [{"key": "grp", "match": {"value": "a"}}]})
    assert [r["vec_id"] for r in flt.collect()] == [1, 3]
    bare = df.withColumnRenamed("sparse_text_indices", "indices") \
             .withColumnRenamed("sparse_text_values", "values")
    got2 = query_points(bare, query={"indices": [7], "values": [2.0]}, limit=2)
    assert [r["vec_id"] for r in got2.collect()] == [2, 1]


def test_fusion_direction_cosine_leg(spark):
    """ADVICE r8: knn_search emits cosine/dot SIMILARITY under 'dist';
    fusion must rank such legs descending, not ascending."""
    df = spark.createDataFrame(
        [(1, [100.0, 0.0]), (2, [0.9, 0.5]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    pre = [{"query": [1.0, 0.0], "limit": 3, "metric": "cosine"}]
    # cosine order is 1 (sim 1.0), 2 (~0.87), 3 (0.0); ascending-dist
    # misreading would invert it
    rrf = query_points(df, {"fusion": "rrf"}, prefetch=pre, limit=3)
    assert [r["vec_id"] for r in rrf.collect()] == [1, 2, 3]
    dbsf = query_points(df, {"fusion": "dbsf"}, prefetch=pre, limit=3)
    assert [r["vec_id"] for r in dbsf.collect()] == [1, 2, 3]


def test_fusion_filter_applies_before_limit(embeddings, emb_rows):
    """ADVICE r8: the top-level filter prunes merged candidates BEFORE the
    final truncation, so the response fills up to `limit` from the
    remaining candidates instead of coming back short."""
    q0 = _vec(emb_rows, 0)
    n_pre, k = 20, 5
    out = query_points(
        embeddings, {"fusion": "rrf"},
        prefetch=[{"query": q0, "limit": n_pre}], limit=k,
        query_filter={"must": [{"key": "vec_id", "range": {"gte": 10}}]},
    ).collect()
    # replay: leg = top-20 by l2 (tiebreak id), then filter, then top-5 —
    # single-leg rrf preserves the leg's rank order
    import numpy as np
    leg = sorted(
        (float(np.linalg.norm(v - np.array(q0))), vid) for vid, v in emb_rows
    )[:n_pre]
    want = [vid for _, vid in leg if vid >= 10][:k]
    assert [r["vec_id"] for r in out] == want
    assert len(out) == k  # enough matching candidates -> full page


def test_nested_prefetch_funnel_sparse_dense_maxsim(spark):
    """The Qdrant multi-stage funnel as ONE query_points call:
    sparse retrieval -> dense rescore -> MaxSim (multivector) rescore,
    verified against a full numpy replay."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, d = 30, 4
    dense = rng.randn(n, d).round(3)
    toks = rng.randn(n, 2, d).round(3)
    rows = []
    for i in range(n):
        idxs = sorted(int(x) for x in rng.choice(50, size=3, replace=False))
        vals = [float(v) for v in rng.rand(3).round(3)]
        rows.append((i, [float(x) for x in dense[i]],
                     [[float(x) for x in t] for t in toks[i]],
                     idxs, vals))
    df = spark.createDataFrame(
        rows,
        "vec_id long, embedding array<double>, "
        "token_vectors array<array<double>>, "
        "indices array<int>, values array<double>",
    )
    sq_idx, sq_val = [5, 17, 23], [1.0, 0.5, 2.0]
    dq = [0.1, -0.2, 0.3, 0.05]
    qtoks = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = query_points(
        df, query=qtoks,
        prefetch=[{
            "query": dq, "limit": 5,
            "prefetch": [{"query": {"indices": sq_idx, "values": sq_val},
                          "limit": 10}],
        }],
        limit=3,
    ).collect()
    got = [r["vec_id"] for r in out]

    # --- numpy replay of the whole funnel
    sparse_scores = {}
    for vid, _, _, idxs, vals in rows:
        s = sum(qv * vals[idxs.index(qi)]
                for qi, qv in zip(sq_idx, sq_val) if qi in idxs)
        if round(s, 6) != 0.0:
            sparse_scores[vid] = s
    stage1 = [vid for vid, _ in sorted(
        sparse_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    dvec = np.array(dq)
    stage2 = [vid for _, vid in sorted(
        (float(np.linalg.norm(dense[vid] - dvec)), vid) for vid in stage1
    )[:5]]

    def maxsim(vid):
        return sum(max(float(np.dot(t, np.array(q))) for t in toks[vid])
                   for q in qtoks)

    want = sorted(stage2, key=lambda v: (-maxsim(v), v))[:3]
    assert got == want


def test_single_stage_multivector_query(spark):
    """A bare token-matrix query (no prefetch) dispatches to MaxSim."""
    import numpy as np

    rng = np.random.RandomState(3)
    toks = rng.randn(8, 2, 3).round(3)
    df = spark.createDataFrame(
        [(i, [[float(x) for x in t] for t in toks[i]]) for i in range(8)],
        "vec_id long, token_vectors array<array<double>>",
    )
    qtoks = [[1.0, 0.0, 0.0]]
    got = [r["vec_id"] for r in
           query_points(df, query=qtoks, limit=3).collect()]

    def maxsim(i):
        return max(float(np.dot(t, np.array(qtoks[0]))) for t in toks[i])

    want = sorted(range(8), key=lambda i: (-maxsim(i), i))[:3]
    assert got == want


def test_formula_query_rescopes_prefetch_leg(spark):
    """Qdrant formula query: one prefetch leg's candidates re-ordered by a
    formula over $score and payload fields, verified against numpy."""
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(20, 3).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(i % 4)) for i in range(20)],
        "vec_id long, embedding array<double>, label int",
    )
    q = [0.2, -0.1, 0.3]
    out = query_points(
        df, {"formula": {"sum": [{"neg": "$score"}, "label"]}},
        prefetch=[{"query": q, "limit": 10}], limit=4,
    ).collect()
    dists = {i: float(np.linalg.norm(vecs[i] - np.array(q)))
             for i in range(20)}
    leg = sorted(range(20), key=lambda i: (dists[i], i))[:10]
    want = sorted(leg, key=lambda i: (-(-dists[i] + (i % 4)), i))[:4]
    assert [r["vec_id"] for r in out] == want
    # top-level filter prunes candidates BEFORE the limit
    flt = query_points(
        df, {"formula": {"sum": [{"neg": "$score"}, "label"]}},
        prefetch=[{"query": q, "limit": 10}], limit=4,
        query_filter={"must": [{"key": "label", "range": {"gte": 1}}]},
    ).collect()
    want_f = sorted([i for i in leg if i % 4 >= 1],
                    key=lambda i: (-(-dists[i] + (i % 4)), i))[:4]
    assert [r["vec_id"] for r in flt] == want_f
    with pytest.raises(ValueError, match="one prefetch leg"):
        query_points(df, {"formula": {"neg": "$score"}},
                     prefetch=[{"query": q}, {"query": q}], limit=2)


def test_group_by_and_order_by_through_query_points(embeddings, emb_rows):
    from vectordb_cloud_spark.operators.knn import search_groups

    q = _vec(emb_rows, 0)
    got = query_points(embeddings, query=q, group_by="label", limit=3,
                       group_size=2).collect()
    want = search_groups(embeddings, q, group_by="label", k_groups=3,
                         hits_per_group=2, id_col="vec_id").collect()
    assert [(r["vec_id"], r["group_rank"], r["hit_rank"]) for r in got] == \
        [(r["vec_id"], r["group_rank"], r["hit_rank"]) for r in want]
    with pytest.raises(ValueError, match="dense vector"):
        query_points(embeddings, query={"sample": "random"},
                     group_by="label")
    # scroll order_by: (key, id) ascending
    page = query_points(embeddings, limit=5, order_by="label").collect()
    want_rows = sorted(
        ((r["label"], r["vec_id"]) for r in embeddings.collect())
    )[:5]
    assert [(r["label"], r["vec_id"]) for r in page] == want_rows


def test_order_by_object_form_and_desc(embeddings):
    page = query_points(
        embeddings, limit=5,
        order_by={"key": "label", "direction": "desc"},
    ).collect()
    want = sorted(
        ((r["label"], r["vec_id"]) for r in embeddings.collect()),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r["label"], r["vec_id"]) for r in page] == want
    with pytest.raises(ValueError, match="direction"):
        query_points(embeddings, limit=2,
                     order_by={"key": "label", "direction": "sideways"})


def test_beam_search_empty_collection_returns_empty(spark):
    from vectordb_cloud_spark.operators.graph_ann import graph_beam_search

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    adj = spark.createDataFrame([], "src long, dst long, dist double")
    out = graph_beam_search(empty, adj, [0.0, 0.0], k=5)
    assert out.count() == 0 and out.columns == ["vec_id", "dist"]


def test_offset_paging_matches_unpaged(embeddings, emb_rows):
    q = _vec(emb_rows, 0)
    full = [r["vec_id"] for r in
            query_points(embeddings, query=q, limit=9).collect()]
    page2 = [r["vec_id"] for r in
             query_points(embeddings, query=q, limit=3, offset=3).collect()]
    assert page2 == full[3:6]
    # fusion branch pages too
    pre = [{"query": q, "limit": 12}]
    fused = [r["vec_id"] for r in
             query_points(embeddings, {"fusion": "rrf"}, prefetch=pre,
                          limit=8).collect()]
    fpage = [r["vec_id"] for r in
             query_points(embeddings, {"fusion": "rrf"}, prefetch=pre,
                          limit=4, offset=4).collect()]
    assert fpage == fused[4:8]
    # scroll branch
    scroll = [r["vec_id"] for r in
              query_points(embeddings, limit=4, offset=2).collect()]
    assert scroll == [2, 3, 4, 5]
    with pytest.raises(ValueError, match="offset"):
        query_points(embeddings, query=q, limit=2, offset=-1)
    with pytest.raises(ValueError, match="group_by"):
        query_points(embeddings, query=q, group_by="label", offset=2)


def test_recommend_lookup_from_other_frame(spark):
    """Qdrant recommend lookup_from: example ids resolve against a second
    collection; the searched collection is not id-excluded."""
    from vectordb_cloud_spark.operators.knn import recommend

    books = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    movies = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, [9.0, 9.0]), (3, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    got = [r["vec_id"] for r in
           recommend(movies, [1], k=3, lookup_from=books,
                     tiebreak="vec_id").collect()]
    # query = books#1 vector (0,0); movie 1 is NOT excluded despite
    # sharing the example's id value
    assert got == [1, 3, 2]


def test_score_threshold_dense_sparse_fusion(embeddings, emb_rows):
    """Qdrant score_threshold: exclude WORSE-than-threshold results —
    dist <= t on distance legs, score >= t on similarity/fusion scores.
    Ground truth from the unthresholded ranking itself."""
    from vectordb_cloud_spark.operators.knn import knn_search

    q = _vec(emb_rows, 0)
    ranked = knn_search(embeddings, q, k=10, tiebreak="vec_id").collect()
    t = (ranked[2]["dist"] + ranked[3]["dist"]) / 2  # between ranks 3 and 4
    got = query_points(embeddings, query=q, limit=10,
                       score_threshold=t).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in ranked[:3]]
    # threshold below the best distance: empty result, no error
    assert query_points(embeddings, query=q, limit=10,
                        score_threshold=-1.0).count() == 0
    # fusion: rrf scores rank descending, cut keeps >= t
    legs = [{"query": q, "limit": 5},
            {"query": _vec(emb_rows, 1), "limit": 5}]
    fused = query_points(embeddings, {"fusion": "rrf"}, prefetch=legs,
                         limit=10).collect()
    tf = fused[1]["rrf_score"]  # keep ranks 1-2 (ties by >=)
    cut = query_points(embeddings, {"fusion": "rrf"}, prefetch=legs,
                       limit=10, score_threshold=tf).collect()
    assert [r["vec_id"] for r in cut] == \
        [r["vec_id"] for r in fused if r["rrf_score"] >= tf]
    # unsupported branches refuse loudly
    with pytest.raises(ValueError, match="score_threshold"):
        query_points(embeddings, None, limit=5, score_threshold=0.5)
    with pytest.raises(ValueError, match="score_threshold"):
        query_points(embeddings, {"sample": "random"},
                     limit=5, score_threshold=0.5)


def test_score_threshold_recommend_discover(embeddings, emb_rows):
    """Qdrant accepts score_threshold on recommend and discover (r12,
    ADVICE r11): each branch cuts on its PRIMARY ranking score —
    recommend's distance (average_vector: plain monotone cut; best_score:
    prefix cut on the clean tier, contaminated excluded), discover's
    context_score (higher-is-better). Ground truth from the unthresholded
    ranking itself."""
    # average_vector: dist ascending — threshold between ranks 3 and 4
    full = query_points(embeddings, {"recommend": {"positive": [0, 1]}},
                        limit=10, id_col="vec_id").collect()
    t = (full[2]["dist"] + full[3]["dist"]) / 2
    cut = query_points(embeddings, {"recommend": {"positive": [0, 1]}},
                       limit=10, id_col="vec_id",
                       score_threshold=t).collect()
    assert [r["vec_id"] for r in cut] == [r["vec_id"] for r in full[:3]]
    # best_score with negatives: the cut keeps the CLEAN prefix within
    # the bound and excludes every contaminated point (dist <= 0 rows)
    body = {"recommend": {"positive": [0], "negative": [1],
                          "strategy": "best_score"}}
    full = query_points(embeddings, body, limit=100_000,
                        id_col="vec_id").collect()
    clean = [r for r in full if r["dist"] > 0]
    assert clean and len(clean) < len(full)  # both tiers present
    tb = (clean[min(2, len(clean) - 1)]["dist"]
          + clean[min(3, len(clean) - 1)]["dist"]) / 2
    cut = query_points(embeddings, body, limit=100_000, id_col="vec_id",
                       score_threshold=tb).collect()
    assert [r["vec_id"] for r in cut] == \
        [r["vec_id"] for r in clean if r["dist"] <= tb]
    # discover: context_score descending — cut at rank 2's score keeps
    # exactly the rows at or above it (>= keeps ties)
    import numpy as np

    v0 = np.asarray(_vec(emb_rows, 0))
    v1 = np.asarray(_vec(emb_rows, 1))
    dbody = {"discover": {
        "target": [float(x) for x in (v0 + v1) / 2],
        "context": [{"positive": _vec(emb_rows, 0),
                     "negative": _vec(emb_rows, 1)}],
    }}
    full = query_points(embeddings, dbody, limit=10, id_col="vec_id").collect()
    td = full[1]["context_score"]
    cut = query_points(embeddings, dbody, limit=10, id_col="vec_id",
                       score_threshold=td).collect()
    assert [r["vec_id"] for r in cut] == \
        [r["vec_id"] for r in full if r["context_score"] >= td]
    # non-finite thresholds stay loud on both branches
    with pytest.raises(ValueError, match="finite"):
        query_points(embeddings, body, limit=5, id_col="vec_id",
                     score_threshold=float("inf"))
    with pytest.raises(ValueError, match="finite"):
        query_points(embeddings, dbody, limit=5, id_col="vec_id",
                     score_threshold=float("nan"))


def test_score_threshold_per_leg_group_by_and_nan(embeddings, emb_rows):
    """Review fixes: a prefetch LEG's own score_threshold cuts that leg's
    candidates before fusion; group_by + score_threshold cuts points then
    groups the survivors (Qdrant query-groups); NaN thresholds are
    rejected loudly instead of silently emptying the result."""
    import math

    from vectordb_cloud_spark.operators.knn import knn_search

    q = _vec(emb_rows, 0)
    ranked = knn_search(embeddings, q, k=10, tiebreak="vec_id").collect()
    t = (ranked[2]["dist"] + ranked[3]["dist"]) / 2
    # per-leg cut: the dense leg keeps only its top-3, so fusion can only
    # surface ids from {leg2 top-5} ∪ {leg1 top-3}
    fused = query_points(embeddings, {"fusion": "rrf"}, prefetch=[
        {"query": q, "limit": 10, "score_threshold": t},
        {"query": _vec(emb_rows, 1), "limit": 5},
    ], limit=20).collect()
    leg1 = {r["vec_id"] for r in ranked[:3]}
    leg2 = {r["vec_id"] for r in
            knn_search(embeddings, _vec(emb_rows, 1), k=5,
                       tiebreak="vec_id").collect()}
    assert {r["vec_id"] for r in fused} <= (leg1 | leg2)
    # group_by: every returned hit meets the cut; groups come only from
    # qualifying points
    grouped = query_points(embeddings, query=q, group_by="label", limit=3,
                           group_size=2, score_threshold=t).collect()
    assert grouped and all(r["dist"] <= t for r in grouped)
    with pytest.raises(ValueError, match="finite"):
        query_points(embeddings, query=q, limit=5,
                     score_threshold=float("nan"))


def test_random_sample_prefetch_leg(embeddings, emb_rows):
    """r14 grammar dreg: Qdrant allows `{"sample": "random"}` as a
    PREFETCH leg — seeded-deterministic candidates rescored by the outer
    query. The result must equal the outer query restricted to exactly
    the sample's candidate set."""
    from vectordb_cloud_spark.operators.knn import knn_search
    from vectordb_cloud_spark.sources.readers import random_sample

    q = _vec(emb_rows, 0)
    got = query_points(
        embeddings, query=q, limit=5,
        prefetch=[{"query": {"sample": "random"}, "limit": 20}],
    )
    cand = [r["vec_id"] for r in
            random_sample(embeddings, 20, id_col="vec_id")
            .select("vec_id").collect()]
    want = knn_search(embeddings.filter(F.col("vec_id").isin(cand)),
                      q, k=5, tiebreak="vec_id")
    assert [r["vec_id"] for r in got.collect()] == \
        [r["vec_id"] for r in want.collect()]
    # and as a fusion leg: rank order = the sample's own seeded order
    fused = query_points(
        embeddings, query={"fusion": "rrf"}, limit=3,
        prefetch=[{"query": {"sample": "random"}, "limit": 5},
                  {"query": q, "limit": 5}],
    )
    assert fused.count() == 3


def test_query_by_id_lookup_from_other_frame(spark, embeddings, emb_rows):
    """r14 grammar dreg: lookup_from applies to query-by-ID (and its mmr
    sibling) — the id resolves in the FOREIGN frame and, being a foreign
    id space, excludes nothing from this collection's results."""
    from vectordb_cloud_spark.operators.knn import knn_search

    foreign = spark.createDataFrame(
        [(999, _vec(emb_rows, 7))],
        "vec_id long, embedding array<float>",
    )
    got = query_points(embeddings, query={"nearest": 999}, limit=3,
                       lookup_from=foreign)
    want = knn_search(embeddings, _vec(emb_rows, 7), k=3,
                      tiebreak="vec_id")
    assert [r["vec_id"] for r in got.collect()] == \
        [r["vec_id"] for r in want.collect()]
    assert got.first()["vec_id"] == 7  # NOT excluded: foreign id space
    # same resolution under the mmr sibling
    mmr = query_points(
        embeddings,
        query={"nearest": 999, "mmr": {"diversity": 0.4,
                                       "candidates_limit": 12}},
        limit=4, lookup_from=foreign)
    assert mmr.count() == 4
