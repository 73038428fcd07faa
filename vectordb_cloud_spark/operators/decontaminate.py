"""Benchmark decontamination: remove training docs that overlap an eval set.

Evaluation integrity requires that no training document contains a long
verbatim span from a benchmark. The standard check is n-gram collision
(13-grams in GPT-3's report; n is a knob): a training doc sharing any
word-n-gram with any eval doc is contaminated.

Scale shape: both sides explode to DISTINCT n-gram hashes (xxhash64 of the
joined shingle — 8 bytes per gram, never the text), the join is an
equi-join on the hash, and the verdict per training doc is a semi-join.
Shuffle volume is bounded by distinct-gram counts; the eval side (thousands
of docs) is tiny next to the training corpus and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.text import ngram_shingles


def _gram_hashes(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    normalized = F.lower(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(ngram_shingles(normalized, n))).alias("__g"),
    ).select("id", F.xxhash64("__g").alias("gram"))


def find_contaminated(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    train_id: str = "doc_id",
    train_text: str = "text",
    eval_id: str = "doc_id",
    eval_text: str = "text",
) -> DataFrame:
    """Training docs sharing >= 1 word-``n``-gram with any eval doc.

    Returns (train doc id, n_hits, eval_ids) — the audit record naming which
    benchmarks each contaminated doc collides with. Case-insensitive,
    whitespace-tokenized, matching the usual published methodology.
    """
    tg = _gram_hashes(train, train_id, train_text, n)
    eg = _gram_hashes(eval_set, eval_id, eval_text, n).withColumnRenamed("id", "eval_id")
    hits = tg.join(F.broadcast(eg), "gram")
    return (
        hits.groupBy("id")
        .agg(
            F.count("*").alias("n_hits"),
            F.array_sort(F.collect_set("eval_id")).alias("eval_ids"),
        )
        .withColumnRenamed("id", train_id)
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    train_id: str = "doc_id",
    train_text: str = "text",
    eval_id: str = "doc_id",
    eval_text: str = "text",
) -> DataFrame:
    """The clean corpus: training docs minus every contaminated one
    (anti-join against the contamination audit)."""
    bad = find_contaminated(
        train, eval_set, n, train_id, train_text, eval_id, eval_text
    ).select(train_id)
    return train.join(bad, on=train_id, how="left_anti")
