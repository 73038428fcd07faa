"""Document chunking (operators/chunking.py): token-window coverage,
overlap, tail handling, and the no-Python-plan property."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.chunking import chunk_and_embed, chunk_documents


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_hand_computed_windows(spark):
    # 10 tokens, chunk=4, overlap=1 -> stride 3: starts 0,3,6; start 9 is
    # pure-overlap (9+1 >= 10) and suppressed... 9+1=10 >= 10 -> dropped
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    got = chunk_documents(_doc(spark, text), chunk_tokens=4, overlap=1).collect()
    assert [(r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in got] == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t6 t7 t8 t9", 4),
    ]


def test_every_token_covered_and_overlap_exact(spark):
    text = " ".join(f"w{i}" for i in range(50))
    rows = chunk_documents(_doc(spark, text), chunk_tokens=8, overlap=3).orderBy("chunk_idx").collect()
    seen = []
    prev = None
    for r in rows:
        toks = r["chunk_text"].split()
        assert len(toks) == r["n_tokens"] <= 8
        if prev is not None and len(toks) >= 3:
            assert prev[-3:] == toks[:3]  # consecutive chunks share the overlap
        seen.extend(toks if prev is None else toks[3:])
        prev = toks
    assert seen == text.split()  # full coverage, in order, no duplicates


def test_short_doc_single_chunk(spark):
    got = chunk_documents(_doc(spark, "only three tokens"), chunk_tokens=128, overlap=32).collect()
    assert len(got) == 1 and got[0]["n_tokens"] == 3 and got[0]["chunk_idx"] == 0


def test_empty_and_null_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "one tok")], "doc_id long, text string"
    )
    got = chunk_documents(df).collect()
    assert [r["doc_id"] for r in got] == [4]


def test_bad_overlap_raises(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_doc(spark, "x"), chunk_tokens=4, overlap=4)


def test_corpus_chunking_is_narrow_jvm_plan(spark, sf_dir):
    """Chunking a corpus must be one shuffle-free JVM map stage: no Exchange,
    no Python eval nodes — the property that makes it free at 100 TB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(docs, chunk_tokens=32, overlap=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    n_docs = docs.filter(F.length(F.trim("text")) > 0).count()
    assert out.count() >= n_docs  # at least one chunk per non-empty doc
    # chunk token budget respected corpus-wide
    assert out.filter(F.col("n_tokens") > 32).count() == 0


def test_chunk_and_embed_shape(spark):
    text = " ".join(f"w{i}" for i in range(40))
    rows = chunk_and_embed(_doc(spark, text), dim=8, chunk_tokens=16, overlap=4).collect()
    assert all(len(r["embedding"]) == 8 for r in rows)
    assert len(rows) >= 3


def test_chunk_tfidf_index_and_passage_topk(spark):
    """Passage retrieval end to end: a query phrased like one doc's MIDDLE
    passage must surface that doc via max-pooled chunk scores, with the
    right chunk pinned for snippeting."""
    from vectordb_cloud_spark.operators.chunking import (
        chunk_tfidf_index,
        passage_topk,
    )

    filler_a = " ".join(f"alpha{i} beta{i}" for i in range(30))
    filler_b = " ".join(f"gamma{i} delta{i}" for i in range(30))
    target_passage = ("the rare saturn moon count answer lives in this "
                      "exact middle passage of the long document here")
    docs = spark.createDataFrame(
        [
            (1, f"{filler_a} {target_passage} {filler_a}"),
            (2, f"{filler_b} nothing about planets here at all {filler_b}"),
            (3, "short unrelated document about parquet files"),
        ],
        "doc_id long, text string",
    )
    index = chunk_tfidf_index(docs, chunk_tokens=20, overlap=5).cache()
    # chunk table shape: composite key + text + real embedding
    assert {"doc_id", "chunk_idx", "chunk_text", "n_tokens", "embedding"} <= \
        set(index.columns)
    assert index.filter(F.size("embedding") != 64).count() == 0
    # doc 1 produced multiple chunks; exactly one holds the target phrase
    hits = index.filter(F.col("chunk_text").contains("saturn moon count"))
    assert hits.count() >= 1
    target_chunk = hits.first()["chunk_idx"]

    # query = the target passage itself, embedded in the SAME chunk space:
    # reuse its indexed embedding as the query vector
    qv = [float(x) for x in hits.first()["embedding"]]
    got = passage_topk(index, qv, k=2, per_doc="max")
    rows = got.collect()
    assert rows[0]["doc_id"] == 1
    assert rows[0]["best_chunk_idx"] == target_chunk
    assert rows[0]["score"] > rows[1]["score"]

    # avg pooling ranks doc 1 first too (its other chunks share no terms,
    # but competitors share zero as well)
    avg = passage_topk(index, qv, k=3, per_doc="avg").collect()
    assert avg[0]["doc_id"] == 1


def test_passage_topk_plan_is_jvm_only(spark):
    from vectordb_cloud_spark.operators.chunking import (
        chunk_tfidf_index,
        passage_topk,
    )
    from vectordb_cloud_spark.plans.inspect import explain_str

    docs = spark.createDataFrame(
        [(1, "some words " * 30)], "doc_id long, text string")
    index = chunk_tfidf_index(docs, chunk_tokens=10, overlap=2)
    plan = explain_str(passage_topk(index, [0.1] * 64, k=5), mode="simple")
    assert not any(tok in plan for tok in
                   ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))
