from vectordb_cloud_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_distance_to,
    l2_norm,
)
from vectordb_cloud_spark.functions.embedding import mock_embed, embed_text
from vectordb_cloud_spark.functions.text import (
    doc_fingerprint,
    lang_id_expr,
    ngram_shingles,
    quality_score,
    token_count,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_distance_to",
    "l2_norm",
    "mock_embed",
    "embed_text",
    "doc_fingerprint",
    "lang_id_expr",
    "ngram_shingles",
    "quality_score",
    "token_count",
]
