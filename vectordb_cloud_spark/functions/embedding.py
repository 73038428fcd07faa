"""Text → embedding as a vectorized pandas_udf.

The reference embeds one text per torch forward pass
(/root/reference/insert.py:16-28, duplicated in search.py:17-28 and
app.py:155-160) with a HuggingFace transformer, truncated at 128 tokens.
That is the single mandatory Python boundary in the whole engine; everything
else stays JVM-side. Two implementations behind one interface:

- ``mock_embed`` — deterministic, dependency-free: md5(text) seeds a small
  xorshift stream that fills a fixed-dim float32 vector. Stable across
  machines/runs, so golden top-k tests and the DuckDB oracle don't need torch
  (SURVEY.md §5 determinism note).
- ``embed_text`` — the real HF model behind an import-try (torch/transformers
  are not in this container). Batched: one forward pass per Arrow batch, not
  per row — fixing the reference's one-text-at-a-time loop.

At 100 TB the embedding pass dominates; the pandas_udf form distributes it
across all executors with Arrow-batched transfer and lets Spark pipeline it
with the downstream write.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64  # matches the driver's embeddings.embedding test table
MAX_TOKENS = 128  # reference truncation, /root/reference/insert.py:21


def _mock_vector(text: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding: md5 of the (token-truncated) text
    seeds a xorshift64* stream -> float32 in [-1, 1)."""
    truncated = " ".join(text.split()[:MAX_TOKENS])
    seed = struct.unpack("<Q", hashlib.md5(truncated.encode("utf-8")).digest()[:8])[0]
    out = np.empty(dim, dtype=np.float32)
    x = seed or 0x9E3779B97F4A7C15
    for i in range(dim):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        out[i] = ((x & 0xFFFFFFFF) / 2147483648.0) - 1.0
    return out


def mock_vector(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Driver-side helper for building query vectors in tests/services."""
    return [float(v) for v in _mock_vector(text, dim)]


def mock_embed(col: Column | str, dim: int = DEFAULT_DIM) -> Column:
    """Vectorized deterministic embedder (Arrow-batched pandas_udf)."""

    @F.pandas_udf(ArrayType(FloatType(), containsNull=False))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _mock_vector(t or "", dim))

    return _embed(F.col(col) if isinstance(col, str) else col)


def embed_text(col: Column | str, model_name: str = "sentence-transformers/all-MiniLM-L6-v2") -> Column:
    """Real HF embedder (reference models: multilingual-e5-large prod,
    MiniLM-L6-v2 test — /root/reference/QdrantCloud.py:20-23). Batched per
    Arrow chunk. Raises if torch/transformers are absent (not in this image);
    use ``mock_embed`` there.
    """
    try:
        import torch  # noqa: F401
        from transformers import AutoModel, AutoTokenizer  # noqa: F401
    except ImportError as exc:  # pragma: no cover - deps not in test image
        raise NotImplementedError(
            "transformers/torch not installed in this environment; "
            "use mock_embed() for deterministic tests"
        ) from exc

    @F.pandas_udf(ArrayType(FloatType(), containsNull=False))
    def _embed(texts: pd.Series) -> pd.Series:  # pragma: no cover - torch absent
        import torch
        from transformers import AutoModel, AutoTokenizer

        # Lazily cached per executor process; weights load once per worker.
        global _HF_CACHE
        try:
            tok, model = _HF_CACHE[model_name]
        except (NameError, KeyError):
            tok = AutoTokenizer.from_pretrained(model_name)
            model = AutoModel.from_pretrained(model_name)
            model.eval()
            try:
                _HF_CACHE[model_name] = (tok, model)
            except NameError:
                _HF_CACHE = {model_name: (tok, model)}
        with torch.no_grad():
            inputs = tok(
                texts.fillna("").tolist(),
                padding=True,
                truncation=True,
                max_length=MAX_TOKENS,
                return_tensors="pt",
            )
            # pooler_output per the reference (/root/reference/insert.py:24)
            vecs = model(**inputs).pooler_output.numpy().astype(np.float32)
        return pd.Series(list(vecs))

    return _embed(F.col(col) if isinstance(col, str) else col)


def embed_with_predict_fn(
    col: Column | str,
    make_predict_fn,
    batch_size: int = 64,
) -> Column:
    """Generic production-inference wiring: ``pyspark.ml.functions.
    predict_batch_udf`` around an injectable model factory.

    ``make_predict_fn`` runs ONCE per python worker (the loaded model is
    cached and shared across every batch and task that worker executes) and
    returns ``predict(texts: np.ndarray) -> np.ndarray`` called per
    ``batch_size`` slice. Extracted from ``embed_text_batched`` so the
    contract — worker-level factory caching, batch slicing, array<float>
    output — is testable with a fake factory where torch is absent
    (tests/test_embedding_real.py::test_predict_batch_contract)."""
    from pyspark.ml.functions import predict_batch_udf

    udf = predict_batch_udf(
        make_predict_fn,
        return_type=ArrayType(FloatType(), containsNull=False),
        batch_size=batch_size,
    )
    return udf(F.col(col) if isinstance(col, str) else col)


def embed_text_batched(
    col: Column | str,
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    batch_size: int = 64,
) -> Column:
    """The production inference wiring: ``pyspark.ml.functions.
    predict_batch_udf`` around the same HF model as ``embed_text``.

    predict_batch_udf is the right 100 TB shape for model inference — the
    model factory (``make_predict_fn``) runs ONCE per python worker and the
    loaded model is cached and shared across every batch and every task that
    worker executes, the fixed ``batch_size`` decouples GPU/CPU batch sizing
    from Arrow chunk sizing, and Spark can pipeline the UDF with the
    surrounding scan/write. Raises loudly when torch/transformers are absent
    (this container); the skip-marked test in tests/test_embedding_real.py
    exercises the full path wherever torch exists.
    """
    try:
        import torch  # noqa: F401
        from transformers import AutoModel, AutoTokenizer  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformers/torch not installed in this environment; "
            "use mock_embed() for deterministic tests"
        ) from exc

    def make_predict_fn():  # pragma: no cover - torch absent in test image
        import torch
        from transformers import AutoModel, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name)
        model = AutoModel.from_pretrained(model_name)
        model.eval()

        def predict(texts: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                enc = tok(
                    ["" if t is None else str(t) for t in texts.tolist()],
                    padding=True,
                    truncation=True,
                    max_length=MAX_TOKENS,
                    return_tensors="pt",
                )
                return model(**enc).pooler_output.numpy().astype(np.float32)

        return predict

    return embed_with_predict_fn(col, make_predict_fn, batch_size=batch_size)
