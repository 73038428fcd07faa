"""Sequence packing: budget invariants, completeness, and efficiency."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.packing import pack_sequences, packing_efficiency


def test_packs_respect_budget_and_cover_all_docs(spark, documents):
    budget = 400
    packs = pack_sequences(documents, max_tokens=budget, drop_oversize=True).cache()
    rows = packs.collect()
    assert rows
    assert all(r["total_tokens"] <= budget for r in rows)
    assert all(r["n_docs"] == len(r["doc_ids"]) for r in rows)
    packed_ids = sorted(i for r in rows for i in r["doc_ids"])
    from vectordb_cloud_spark.functions.text import token_count

    eligible = sorted(
        r["doc_id"]
        for r in documents.select("doc_id", token_count("text").alias("t")).collect()
        if r["t"] <= budget
    )
    assert packed_ids == eligible  # every eligible doc packed exactly once


def test_packing_beats_one_doc_per_sequence(spark, documents):
    budget = 400
    packs = pack_sequences(documents, max_tokens=budget, drop_oversize=True)
    n_docs = sum(r["n_docs"] for r in packs.collect())
    n_packs = packs.count()
    assert n_packs < n_docs  # packing actually combines documents
    assert packing_efficiency(packs, budget) >= 0.5  # FFD fills at least half


def test_oversize_raises_unless_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "short doc"), (2, " ".join(["w"] * 100))], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, max_tokens=50)
    packs = pack_sequences(docs, max_tokens=50, drop_oversize=True)
    ids = [i for r in packs.collect() for i in r["doc_ids"]]
    assert ids == [1]


def test_supplied_token_counts_are_used(spark):
    docs = spark.createDataFrame(
        [(1, "irrelevant", 30), (2, "irrelevant", 30), (3, "irrelevant", 50)],
        "doc_id long, text string, n_real long",
    )
    packs = pack_sequences(docs, max_tokens=60, tokens_col="n_real",
                           n_partitions=1).collect()
    sizes = sorted(r["total_tokens"] for r in packs)
    assert sizes == [50, 60]  # 30+30 packed together; 50 alone


def test_packing_independent_of_input_file_layout(spark, documents, tmp_path):
    """The recipe contract: the same rows re-read from a DIFFERENT physical
    file split must produce identical packs (fixed hash-partition count, not
    the input's layout)."""
    documents.select("doc_id", "text").repartition(3).write.parquet(str(tmp_path / "a"))
    documents.select("doc_id", "text").repartition(9).write.parquet(str(tmp_path / "b"))
    pa = pack_sequences(spark.read.parquet(str(tmp_path / "a")), 400, drop_oversize=True)
    pb = pack_sequences(spark.read.parquet(str(tmp_path / "b")), 400, drop_oversize=True)
    a = sorted(tuple(r["doc_ids"]) for r in pa.collect())
    b = sorted(tuple(r["doc_ids"]) for r in pb.collect())
    assert a == b
