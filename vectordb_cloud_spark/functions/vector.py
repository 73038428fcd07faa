"""Vector math as native Spark Column expressions — no Python UDFs.

The reference computes L2 (Euclidean) distance as ``np.linalg.norm(a - b)``
(/root/reference/app.py:169) and creates every collection with
``Distance.EUCLID`` (/root/reference/insert.py:72). Here the same math is a
``zip_with``/``aggregate`` column expression, so it runs JVM-side inside
whole-stage codegen — no per-row Python boundary, and it scales linearly with
executor count.

All arithmetic is done in double precision with an explicit cast up front so
results are deterministic and reproducible against the DuckDB oracle
(float32 inputs, float64 fold in element order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product of two ``array<numeric>`` columns."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = _as_double_array(a)
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance between two array columns (reference metric,
    /root/reference/insert.py:72, /root/reference/app.py:169)."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_distance_to(a: Column | str, query: list[float]) -> Column:
    """L2 distance from an array column to a constant query vector.

    The query vector becomes a literal array in the plan (broadcast to every
    task for free as part of the serialized plan) — the shape of the
    reference's single-query search (/root/reference/search.py:43-48).
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    return l2_distance(a, q)


def manhattan_distance(a: Column | str, b: Column | str) -> Column:
    """L1 distance (Qdrant ``Distance.MANHATTAN``) — same fused
    zip_with/aggregate shape as L2, abs instead of square."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def manhattan_distance_to(a: Column | str, query: list[float]) -> Column:
    """L1 distance from an array column to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return manhattan_distance(a, q)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; used by the near-duplicate / similarity-search
    extensions (not a reference op — reference is L2-only)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_similarity_to(a: Column | str, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(x)) for x in query])
    return cosine_similarity(a, q)
