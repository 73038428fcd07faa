"""Repetition filter: loopy docs score high and get dropped; varied docs
score low and survive."""

from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.repetition import (
    filter_repetitive,
    repetition_stats,
)


def _docs(spark):
    loop = " ".join(["buy now click here"] * 10)
    varied = "a perfectly ordinary sentence with mostly unique words in this line"
    return spark.createDataFrame(
        [(1, loop), (2, varied), (3, "tiny")], "doc_id long, text string"
    )


def test_repetition_scores_separate_loop_from_varied(spark):
    stats = {r["doc_id"]: r["dup_gram_fraction"] for r in repetition_stats(_docs(spark)).collect()}
    assert stats[1] > 0.8   # the loop is almost entirely repeated 3-grams
    assert stats[2] == 0.0  # all grams unique
    assert stats[3] == 0.0  # shorter than one gram -> defined as 0


def test_filter_repetitive_drops_only_the_loop(spark):
    kept = filter_repetitive(_docs(spark), max_dup_gram_fraction=0.3)
    assert {r["doc_id"] for r in kept.collect()} == {2, 3}
    assert "dup_gram_fraction" in kept.columns  # audit column retained


def test_fixture_corpus_is_mostly_unrepetitive(spark, documents):
    stats = repetition_stats(documents)
    high = stats.filter(F.col("dup_gram_fraction") > 0.5).count()
    assert high < documents.count() * 0.05
