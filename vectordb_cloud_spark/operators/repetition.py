"""Repetition filtering: drop degenerate, loopy documents.

Boilerplate and generation loops show up as REPEATED n-grams; the published
heuristic (C4/Gopher family) thresholds the fraction of a document's
n-grams that belong to n-gram types occurring more than once. Complementary
to dedup (which compares ACROSS documents — this looks WITHIN one) and to
``quality_score`` (which sees token/punctuation shape, not structure).

Scale shape: explode to (doc, gram) pairs, two grouped aggregations — the
shuffle key is the doc id and the per-doc gram counts partial-aggregate
map-side, so cost is corpus-token-linear with no joins between documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.text import ngram_shingles


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 3,
) -> DataFrame:
    """Annotate each doc with ``dup_gram_fraction``: the share of its
    ``gram_n``-grams that belong to gram types seen more than once in the
    SAME document (0 = no internal repetition, → 1 = a loop). Docs shorter
    than one gram get 0.0."""
    grams = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(ngram_shingles(F.lower(F.col(text_col)), gram_n)).alias("__g"),
    )
    per_gram = grams.groupBy("__id", "__g").agg(F.count("*").alias("__c"))
    per_doc = per_gram.groupBy("__id").agg(
        (
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(F.lit(0)))
            / F.sum("__c")
        ).alias("dup_gram_fraction")
    )
    return docs.join(
        per_doc.withColumnRenamed("__id", id_col), on=id_col, how="left"
    ).na.fill({"dup_gram_fraction": 0.0})


def filter_repetitive(
    docs: DataFrame,
    max_dup_gram_fraction: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 3,
) -> DataFrame:
    """Corpus minus documents whose duplicate-gram fraction exceeds the
    threshold (annotation column retained for auditability)."""
    return repetition_stats(docs, id_col, text_col, gram_n).filter(
        F.col("dup_gram_fraction") <= max_dup_gram_fraction
    )
