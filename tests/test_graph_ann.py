"""Graph ANN (NSW-style kNN graph + beam search): structure, persistence,
and recall vs exact — the same gate the LSH/IVF/PQ families get."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.ann import brute_force_topk, recall_at_k
from vectordb_cloud_spark.operators.graph_ann import (
    graph_beam_search,
    knn_graph_build,
    knn_graph_persist,
)


@pytest.fixture(scope="module")
def graph(spark, embeddings):
    return knn_graph_build(embeddings, degree=8, refine_rounds=1).cache()


def test_graph_degree_bound_and_no_self_loops(graph, embeddings):
    n = embeddings.count()
    per_src = graph.groupBy("src").agg(F.count("*").alias("d")).collect()
    assert all(r["d"] <= 8 for r in per_src)
    assert len(per_src) > 0.9 * n  # LSH candidates cover ~every node
    assert graph.filter(F.col("src") == F.col("dst")).count() == 0


def test_refinement_round_does_not_worsen_edges(spark, embeddings):
    g0 = knn_graph_build(embeddings, degree=8, refine_rounds=0)
    g1 = knn_graph_build(embeddings, degree=8, refine_rounds=1)
    # NN-descent re-selects from a superset of candidates: the mean kept
    # edge distance can only improve (or tie) per node
    m0 = g0.agg(F.avg("dist")).first()[0]
    m1 = g1.agg(F.avg("dist")).first()[0]
    assert m1 <= m0 + 1e-9


def test_beam_search_recall_vs_exact(spark, embeddings, graph):
    qv = [float(x) for x in
          embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = brute_force_topk(embeddings, qv, k=10)
    got = graph_beam_search(embeddings, graph, qv, k=10, beam=16, max_hops=4)
    assert got.count() == 10
    assert recall_at_k(got, exact, "vec_id") >= 0.6


def test_beam_search_over_persisted_graph(spark, embeddings, graph, tmp_path):
    path = str(tmp_path / "knn_graph")
    knn_graph_persist(graph, path)
    reloaded = spark.read.parquet(path)
    qv = [float(x) for x in
          embeddings.filter(F.col("vec_id") == 3).first()["embedding"]]
    a = graph_beam_search(embeddings, graph, qv, k=5).collect()
    b = graph_beam_search(embeddings, reloaded, qv, k=5).collect()
    assert [(r["vec_id"], round(r["dist"], 9)) for r in a] == [
        (r["vec_id"], round(r["dist"], 9)) for r in b
    ]


def test_wider_beam_does_not_reduce_recall(spark, embeddings, graph):
    qv = [float(x) for x in
          embeddings.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = brute_force_topk(embeddings, qv, k=10)
    narrow = graph_beam_search(embeddings, graph, qv, k=10, beam=4, max_hops=4)
    wide = graph_beam_search(embeddings, graph, qv, k=10, beam=32, max_hops=4)
    r_narrow = recall_at_k(narrow, exact, "vec_id")
    r_wide = recall_at_k(wide, exact, "vec_id")
    assert r_wide >= r_narrow
