"""Document chunking: split long documents into overlapping token windows.

The standard precursor to embedding / training-data packing: a 100k-token
document cannot go through a 128-token embedder (the reference truncates at
128 and silently drops the rest — /root/reference/insert.py:21); chunking
keeps all content by emitting overlapping windows instead.

Everything is JVM column algebra — ``split`` → ``sequence`` of window starts
→ ``transform``+``slice``+``array_join`` → ``posexplode`` — so chunking an
entire corpus is one narrow map stage: no shuffle, no Python, scales linearly
with input bytes and pipelines into the downstream embed/pack stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.text import words


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Explode each document into whitespace-token windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.

    Output: (id_col, chunk_idx, chunk_text, n_tokens). The final window may
    be shorter; a trailing window that would contain only overlap (no new
    tokens) is suppressed; empty/NULL documents produce no rows. Every token
    of the document appears in at least one chunk and consecutive chunks
    share exactly ``overlap`` tokens (except a shorter tail).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = words(text_col)
    n = F.size(toks)
    # window start offsets: 0, stride, 2*stride, ... ; a start past the last
    # NEW token (start + overlap >= n) would emit a pure-overlap chunk — drop
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s + overlap < n),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("chunk_text"),
            F.least(n - s, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )
    return (
        docs.filter(n > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c"))
        .select(id_col, "chunk_idx", "__c.chunk_text", "__c.n_tokens")
    )


def chunk_and_embed(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Chunk then embed each chunk (mock embedder here; swap
    ``embed_text_batched`` in where torch exists). One narrow stage end to
    end: scan → chunk → Arrow-batched embed → ready for collection upsert
    keyed by (doc, chunk)."""
    from vectordb_cloud_spark.functions.embedding import mock_embed

    chunked = chunk_documents(docs, id_col, text_col, chunk_tokens, overlap)
    return chunked.withColumn("embedding", mock_embed("chunk_text", dim))


def chunk_tfidf_index(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Chunk the corpus and embed every chunk with the REAL (weights-free)
    hashed-TF-IDF embedder — the passage-retrieval index. Output:
    (id_col, chunk_idx, chunk_text, n_tokens, embedding), ready to persist
    and search with any ANN family keyed by the composite (doc, chunk).

    IDF statistics are computed over CHUNKS (each chunk is a "document" to
    the embedder) — the standard passage-indexing choice: a term frequent
    across one long document but rare in the corpus keeps its
    discriminative weight at the passage level."""
    from vectordb_cloud_spark.functions.embedding import hashed_tfidf_embed

    chunked = chunk_documents(docs, id_col, text_col, chunk_tokens, overlap)
    # composite STRING key, not a 64-bit hash: at billions of chunks the
    # birthday bound makes xxhash64 collisions expected, and a collision
    # here would merge two unrelated chunks' TF statistics and fan the
    # wrong vector out through the join
    with_key = chunked.withColumn(
        "__ck", F.concat_ws(":", F.col(id_col), F.col("chunk_idx"))
    )
    emb = hashed_tfidf_embed(with_key, id_col="__ck", text_col="chunk_text",
                             dim=dim)
    return with_key.join(emb, "__ck").drop("__ck")


def passage_topk(
    chunk_index: DataFrame,
    query_vector: list[float],
    k: int = 10,
    per_doc: str = "max",
    id_col: str = "doc_id",
    vector_col: str = "embedding",
    filters=None,
) -> DataFrame:
    """Document top-k from a chunk-level index: score every chunk against
    the query (cosine), aggregate per document (``max`` = best passage —
    the late-interaction reduction; ``avg`` = whole-doc relevance), return
    the k best documents with their best chunk pinned for snippeting.

    One narrow scan (chunk scoring is fused column algebra), one partial
    agg on doc_id, one TakeOrderedAndProject — no joins, no Python. At
    100 TB the chunk index is the table being scanned, so pair it with an
    IVF/SQ layout over the chunk embeddings and pass the probe predicate
    as ``filters``.
    """
    from vectordb_cloud_spark.functions.vector import cosine_similarity_to

    if per_doc not in ("max", "avg"):
        raise ValueError(f"per_doc must be 'max' or 'avg', got {per_doc!r}")
    df = chunk_index if filters is None else chunk_index.filter(filters)
    scored = df.withColumn(
        "__score", cosine_similarity_to(F.col(vector_col), query_vector)
    )
    agg = (
        F.max("__score") if per_doc == "max" else F.avg("__score")
    ).alias("score")
    # (score, chunk_idx) struct ordering makes the argmax deterministic
    # when two chunks tie on score (max_by alone picks arbitrarily)
    best_chunk = F.max_by(
        "chunk_idx", F.struct(F.col("__score"), F.col("chunk_idx"))
    ).alias("best_chunk_idx")
    return (
        scored.groupBy(id_col)
        .agg(F.round(agg, 6).alias("score"), best_chunk)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
