from vectordb_cloud_spark.operators.knn import knn_search, knn_batch, knn_join_exact, search_response
from vectordb_cloud_spark.operators.classify import nearest_centroid, label_centroids, classify_title
from vectordb_cloud_spark.operators.ann import (
    ivf_build,
    ivf_knn_join,
    ivf_persist,
    ivf_search,
    ivf_search_persisted,
    lsh_fit,
    lsh_knn,
    lsh_self_join_pairs,
    lsh_similarity_join,
)
from vectordb_cloud_spark.operators.dedup import (
    dedup_keep_canonical,
    dedup_keep_first,
    dup_components,
    embedding_near_dup,
    embedding_near_dup_lsh,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dup_pairs,
)
from vectordb_cloud_spark.operators.anomaly import robust_outliers, zscore_outliers
from vectordb_cloud_spark.operators.decontaminate import decontaminate, find_contaminated
from vectordb_cloud_spark.operators.lexical import (
    bm25_index,
    bm25_search,
    hybrid_search,
    rrf_fuse,
)
from vectordb_cloud_spark.operators.pq import (
    ivfpq_build,
    ivfpq_search,
    pq_encode,
    pq_search,
    pq_train,
)
from vectordb_cloud_spark.operators.graph_ann import (
    graph_beam_search,
    knn_graph_append,
    knn_graph_build,
    knn_graph_persist,
)
from vectordb_cloud_spark.operators.sq import (
    bq_encode,
    bq_search,
    bq_train,
    sq_encode,
    sq_search,
    sq_train,
)
from vectordb_cloud_spark.operators.packing import pack_sequences, packing_efficiency
from vectordb_cloud_spark.operators.repetition import filter_repetitive, repetition_stats
from vectordb_cloud_spark.operators.sampling import (
    hash_shard,
    stratified_sample,
    weighted_mixture,
)
from vectordb_cloud_spark.operators.temporal import asof_join, range_join
from vectordb_cloud_spark.operators.skew import salted_agg, salted_join

__all__ = [
    "knn_search",
    "knn_batch",
    "knn_join_exact",
    "search_response",
    "nearest_centroid",
    "label_centroids",
    "classify_title",
    "ivf_build",
    "ivf_knn_join",
    "ivf_persist",
    "ivf_search",
    "ivf_search_persisted",
    "lsh_fit",
    "lsh_knn",
    "lsh_self_join_pairs",
    "lsh_similarity_join",
    "dedup_keep_canonical",
    "dedup_keep_first",
    "dup_components",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_near_dup_pairs",
    "robust_outliers",
    "zscore_outliers",
    "decontaminate",
    "find_contaminated",
    "filter_repetitive",
    "repetition_stats",
    "bm25_index",
    "bm25_search",
    "hybrid_search",
    "rrf_fuse",
    "ivfpq_build",
    "graph_beam_search",
    "knn_graph_append",
    "knn_graph_build",
    "knn_graph_persist",
    "bq_encode",
    "bq_search",
    "bq_train",
    "sq_encode",
    "sq_search",
    "sq_train",
    "ivfpq_search",
    "pq_encode",
    "pq_search",
    "pq_train",
    "pack_sequences",
    "packing_efficiency",
    "hash_shard",
    "stratified_sample",
    "weighted_mixture",
    "asof_join",
    "range_join",
    "salted_agg",
    "salted_join",
]
