from vectordb_cloud_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_distance_to,
    l2_norm,
)
from vectordb_cloud_spark.functions.embedding import mock_embed, mock_vector, embed_text
from vectordb_cloud_spark.functions.ids import uuid3_dns
from vectordb_cloud_spark.functions.sketches import (
    merged_distinct_estimate,
    user_count_sketches,
)
from vectordb_cloud_spark.functions.text import (
    bpe_token_estimate,
    char_ngrams,
    doc_fingerprint,
    lang_id_expr,
    mean_word_length,
    ngram_shingles,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    words,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_distance_to",
    "l2_norm",
    "mock_embed",
    "mock_vector",
    "embed_text",
    "uuid3_dns",
    "merged_distinct_estimate",
    "user_count_sketches",
    "bpe_token_estimate",
    "char_ngrams",
    "doc_fingerprint",
    "lang_id_expr",
    "mean_word_length",
    "ngram_shingles",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "words",
]
