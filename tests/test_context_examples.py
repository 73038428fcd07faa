"""r12 grammar parity: context-only queries, ID-form discover/context
examples, raw-vector recommend examples, and scroll order_by.start_from —
each against an independent replay."""

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


def test_context_only_query_matches_operator(embeddings, emb_rows):
    """query: {"context": ...} ranks by the pair score alone — equal to
    operators.discover.context_search; accepts a single pair object or a
    list; score_threshold cuts on context_score."""
    from vectordb_cloud_spark.operators.discover import context_search

    pair = {"positive": _vec(emb_rows, 1), "negative": _vec(emb_rows, 2)}
    got = query_points(embeddings, {"context": pair}, limit=6,
                       id_col="vec_id").collect()
    want = context_search(
        embeddings, [(pair["positive"], pair["negative"])], k=6,
        id_col="vec_id").collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    # list form with two pairs
    pairs = [pair, {"positive": _vec(emb_rows, 3),
                    "negative": _vec(emb_rows, 4)}]
    got2 = query_points(embeddings, {"context": pairs}, limit=6,
                        id_col="vec_id").collect()
    want2 = context_search(
        embeddings, [(p["positive"], p["negative"]) for p in pairs], k=6,
        id_col="vec_id").collect()
    assert [r["vec_id"] for r in got2] == [r["vec_id"] for r in want2]
    # threshold: keep context_score >= t (prefix of the ranking)
    t = got[2]["context_score"]
    cut = query_points(embeddings, {"context": pair}, limit=6,
                       id_col="vec_id", score_threshold=t).collect()
    assert [r["vec_id"] for r in cut] == \
        [r["vec_id"] for r in got if r["context_score"] >= t]


def test_context_and_discover_accept_point_ids(embeddings, emb_rows):
    """ID-form examples resolve to the stored vectors and are excluded
    from results (Qdrant's example-exclusion rule)."""
    v1, v2 = _vec(emb_rows, 1), _vec(emb_rows, 2)
    by_vec = query_points(embeddings,
                          {"context": {"positive": v1, "negative": v2}},
                          limit=60, id_col="vec_id").collect()
    by_id = query_points(embeddings,
                         {"context": {"positive": 1, "negative": 2}},
                         limit=50, id_col="vec_id").collect()
    want = [r["vec_id"] for r in by_vec if r["vec_id"] not in (1, 2)]
    got = [r["vec_id"] for r in by_id]
    assert got == want[:len(got)] and not {1, 2} & set(got)
    # discover: target by id, context mixed id/vector
    tgt = _vec(emb_rows, 0)
    d_vec = query_points(embeddings, {"discover": {
        "target": tgt, "context": [{"positive": v1, "negative": v2}],
    }}, limit=60, id_col="vec_id").collect()
    d_id = query_points(embeddings, {"discover": {
        "target": 0, "context": [{"positive": 1, "negative": v2}],
    }}, limit=50, id_col="vec_id").collect()
    want = [r["vec_id"] for r in d_vec if r["vec_id"] not in (0, 1)]
    got = [r["vec_id"] for r in d_id]
    assert got == want[:len(got)] and not {0, 1} & set(got)


def test_discover_context_lookup_from_other_frame(spark):
    """Qdrant lookup_from for discover/context (r13): id-form examples
    resolve against the SECOND frame; the searched collection is not
    id-excluded (foreign id space). Parity against the same query with
    the foreign vectors passed raw."""
    books = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, [5.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    movies = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, [9.0, 9.0]), (3, [5.0, 5.0]),
         (4, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    by_id = query_points(
        movies, {"context": {"positive": 1, "negative": 2}},
        limit=4, id_col="vec_id", lookup_from=books).collect()
    by_vec = query_points(
        movies, {"context": {"positive": [0.0, 0.0],
                             "negative": [10.0, 10.0]}},
        limit=4, id_col="vec_id").collect()
    # same ranking, and movie ids 1/2 are NOT excluded (foreign ids)
    assert [r["vec_id"] for r in by_id] == [r["vec_id"] for r in by_vec]
    assert len(by_id) == 4
    d_id = query_points(
        movies, {"discover": {"target": 3,
                              "context": [{"positive": 1, "negative": 2}]}},
        limit=4, id_col="vec_id", lookup_from=books).collect()
    d_vec = query_points(
        movies, {"discover": {"target": [5.0, 0.0],
                              "context": [{"positive": [0.0, 0.0],
                                           "negative": [10.0, 10.0]}]}},
        limit=4, id_col="vec_id").collect()
    assert [r["vec_id"] for r in d_id] == [r["vec_id"] for r in d_vec]
    assert len(d_id) == 4
    # a missing foreign id is the same loud not-found as recommend's
    import pytest

    with pytest.raises(ValueError, match="not found"):
        query_points(movies, {"context": {"positive": 99, "negative": 2}},
                     limit=4, id_col="vec_id", lookup_from=books)


def test_recommend_accepts_raw_vectors(embeddings, emb_rows):
    """Raw example vectors join the pool directly (no exclusion): a
    vector-form positive equals the id-form query EXCEPT the example row
    itself may now appear."""
    v0 = _vec(emb_rows, 0)
    by_vec = query_points(embeddings, {"recommend": {"positive": [v0]}},
                          limit=6, id_col="vec_id").collect()
    # the example's own row is the nearest hit when nothing excludes it
    assert by_vec[0]["vec_id"] == 0
    by_id = query_points(embeddings, {"recommend": {"positive": [0]}},
                         limit=5, id_col="vec_id").collect()
    assert [r["vec_id"] for r in by_vec[1:]] == \
        [r["vec_id"] for r in by_id]
    # mixed ids + vectors in both slots, best_score strategy: replay the
    # two-tier ranking in numpy over the same pools
    v3 = _vec(emb_rows, 3)
    got = query_points(embeddings, {"recommend": {
        "positive": [0, v3], "negative": [_vec(emb_rows, 2)],
        "strategy": "best_score",
    }}, limit=8, id_col="vec_id").collect()
    pos = [np.asarray(v0), np.asarray(v3)]
    neg = [np.asarray(_vec(emb_rows, 2))]
    rows = []
    for vid, v in emb_rows:
        if vid == 0:  # only the id-form example is excluded
            continue
        bp = min(float(np.linalg.norm(v - p)) for p in pos)
        bn = min(float(np.linalg.norm(v - n)) for n in neg)
        bad = bp >= bn
        rows.append((int(bad), -bn if bad else bp, vid))
    want = [vid for _, _, vid in sorted(rows)[:8]]
    assert [r["vec_id"] for r in got] == want


def test_order_by_start_from(spark):
    """Cursor-style ordered scroll: start_from is inclusive and
    direction-aware, compiled as a scan predicate."""
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(40)], "vec_id long, grp long")
    asc = query_points(df, None, limit=10, id_col="vec_id",
                       order_by={"key": "grp", "start_from": 5}).collect()
    assert [(r["grp"], r["vec_id"]) for r in asc] == sorted(
        (g, i) for i, g in [(i, i % 7) for i in range(40)] if g >= 5
    )[:10]
    desc = query_points(df, None, limit=10, id_col="vec_id",
                        order_by={"key": "grp", "direction": "desc",
                                  "start_from": 1}).collect()
    want = sorted(((g, i) for i, g in [(i, i % 7) for i in range(40)]
                   if g <= 1), key=lambda t: (-t[0], t[1]))[:10]
    assert [(r["grp"], r["vec_id"]) for r in desc] == want
    with pytest.raises(ValueError, match="unknown order_by"):
        query_points(df, None, limit=5, id_col="vec_id",
                     order_by={"key": "grp", "bogus": 1})
