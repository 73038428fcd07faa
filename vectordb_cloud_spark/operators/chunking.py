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
