"""vectordb_cloud_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference vector-search service
(smiley88888/VectorDB-cloud), re-expressed Spark-first.

The reference is a multi-tenant text vector store: embed text, upsert
``(id, vector, payload)`` points, run metadata-filtered top-k L2 nearest-neighbor
search, filtered/substring/regex deletes, and nearest-centroid classification
(see SURVEY.md). Here every operator is a declarative DataFrame transformation so
Catalyst/Tungsten handle pushdown, pruning, codegen, and AQE; the only Python
boundary is the (mock or real) embedding pandas_udf.

Layout:
- ``session``     — tuned SparkSession builder
- ``collections`` — collection (table) lifecycle: create/drop/list/copy-init
- ``functions``   — vector math, embedding, text-analysis column expressions
- ``operators``   — kNN search, classification, dedup, DML, relational ops
- ``streaming``   — Structured Streaming ingest + windowed analytics
"""

from vectordb_cloud_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
