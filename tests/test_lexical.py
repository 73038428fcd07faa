"""BM25 lexical search: hand-computed reference scores on a toy corpus, and
ranking sanity over the document fixture."""

import math

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.lexical import bm25_index, bm25_search


@pytest.fixture(scope="module")
def toy_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark query engine"),
            (2, "spark spark shuffle"),
            (3, "vector search engine index"),
        ],
        "doc_id long, text string",
    )
    return bm25_index(docs)


def _bm25(tf, df, n, dl, avg, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avg))


def test_bm25_matches_hand_computation(toy_index):
    postings, docstats, doclens, corpus = toy_index
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_search(postings, docstats, doclens, corpus, "spark", k=10).collect()
    }
    n, avg = 3, (3 + 3 + 4) / 3
    expect = {
        1: round(_bm25(1, 2, n, 3, avg), 6),
        2: round(_bm25(2, 2, n, 3, avg), 6),
    }
    assert got == expect
    assert got[2] > got[1]  # higher tf wins at equal length


def test_bm25_multi_term_and_rare_term_weighting(toy_index):
    postings, docstats, doclens, corpus = toy_index
    got = bm25_search(postings, docstats, doclens, corpus, "spark engine", k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert set(ids) == {1, 2, 3}
    assert ids[0] == 1  # matches both terms -> outranks single-term docs


def test_bm25_empty_query_raises(toy_index):
    postings, docstats, doclens, corpus = toy_index
    with pytest.raises(ValueError):
        bm25_search(postings, docstats, doclens, corpus, "   ")


def test_bm25_on_fixture_returns_relevant_docs(spark, documents):
    postings, docstats, doclens, corpus = bm25_index(documents)
    hits = bm25_search(postings, docstats, doclens, corpus, "vector", k=5)
    rows = hits.collect()
    assert 0 < len(rows) <= 5
    # every hit actually contains the term
    ids = [r["doc_id"] for r in rows]
    texts = {
        r["doc_id"]: r["text"]
        for r in documents.filter(F.col("doc_id").isin(ids)).collect()
    }
    assert all("vector" in t.lower() for t in texts.values())


def test_rrf_hybrid_fusion(spark, toy_index, documents):
    """RRF fusion of BM25 and vector kNN candidate lists: a doc ranked well
    in BOTH lists must outrank docs present in only one."""
    from vectordb_cloud_spark.operators.lexical import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0)], "doc_id long, score double"
    )
    vec = spark.createDataFrame(
        [(2, 0.1), (4, 0.2), (1, 0.9)], "doc_id long, dist double"
    )
    fused = rrf_fuse([lex, vec], k=4).collect()
    ids = [r["doc_id"] for r in fused]
    assert set(ids) == {1, 2, 3, 4}
    assert ids[0] == 2  # rank2 lexically + rank1 semantically beats everything
    # every fused score positive and sorted descending
    scores = [r["rrf_score"] for r in fused]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_search_end_to_end(spark, documents):
    """BM25 + mock-embed kNN fused: the top fused hit must contain the query
    term (lexically relevant) and the result is deterministic."""
    from vectordb_cloud_spark.functions.embedding import mock_embed, mock_vector
    from vectordb_cloud_spark.operators.lexical import hybrid_search

    tables = bm25_index(documents)
    points = documents.repartition(1).select(
        "doc_id", mock_embed("text", 32).alias("embedding")
    ).cache()
    q = "vector search"
    fused = hybrid_search(tables, points, q, mock_vector(q, 32), k=5)
    rows = fused.collect()
    assert 0 < len(rows) <= 5
    again = hybrid_search(tables, points, q, mock_vector(q, 32), k=5).collect()
    assert rows == again
    top_text = documents.filter(F.col("doc_id") == rows[0]["doc_id"]).first()["text"].lower()
    assert "vector" in top_text or "search" in top_text
