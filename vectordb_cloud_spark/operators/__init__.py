from vectordb_cloud_spark.operators.knn import knn_search, knn_batch, knn_join_exact
from vectordb_cloud_spark.operators.classify import nearest_centroid, classify_title

__all__ = [
    "knn_search",
    "knn_batch",
    "knn_join_exact",
    "nearest_centroid",
    "classify_title",
]
