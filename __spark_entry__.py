"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (and the
north-star extensions) as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL for the correctness gate: ALL
50/50 registry entries are oracle-backed (since r9), including the
ANN/LSH/PQ/quantized/text-index searches, the multimodal md5-chain
decode, and (r13) the greedy MMR diversity selection — each REPLAYED
over the materialized index/collection structures (or, for the
iterative algorithms, as the unrolled per-step SQL program) that the
Spark side actually wrote/ran.

Implementation lives in ``vectordb_cloud_spark/queries.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vectordb_cloud_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's GET /search pipeline (embed -> tenant filter
    -> exact top-k L2 -> {id, string, score} projection;
    /root/reference/app.py:58-75) over sf0.001 documents with the
    deterministic mock embedder."""
    from pyspark.sql import functions as F

    from vectordb_cloud_spark.functions.embedding import mock_embed, mock_vector
    from vectordb_cloud_spark.operators.knn import knn_search, search_response

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    points = docs.select(
        F.col("doc_id").alias("text_id"),
        "text",
        (F.col("doc_id") % 100).alias("user_id"),
        F.col("source").alias("site"),
        "lang",
    ).withColumn("embedding", mock_embed("text"))
    qvec = mock_vector("spark join order sort table")
    hits = knn_search(points, qvec, k=5, filters=F.col("user_id") == 7)
    return search_response(hits)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.registry()


def oracle_sql() -> dict[str, str]:
    return _q.oracles()
