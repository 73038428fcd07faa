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

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def lit_double_array(values) -> Column:
    """``array<double>`` literal built with ONE py4j call.

    Plan-equivalent to ``F.array(*[F.lit(float(v)) for v in values])`` but
    ~70x cheaper to CONSTRUCT (measured r10: 0.7 ms vs 51 ms at dim=64) —
    the per-element form pays a py4j round trip per ``lit``, which was a
    measurable slice of serving-path plan construction. ``repr(float)`` is
    shortest-roundtrip, and Spark SQL's ``D``-suffixed literal parses it
    back to the exact same double (parity-tested). Non-finite values fall
    back to the element-wise path ('inf'/'nan' aren't SQL literals).
    """
    vals = [float(v) for v in values]
    if not vals:
        return F.array().cast("array<double>")
    if all(map(math.isfinite, vals)):
        return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")
    return F.array(*[F.lit(v) for v in vals])


def lit_long_array(values) -> Column:
    """``array<bigint>`` literal in one py4j call (see lit_double_array)."""
    vals = [int(v) for v in values]
    if not vals:
        return F.array().cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")


def _arr_sql(values) -> str | None:
    """SQL text of an array<double> literal, or None if a value is
    non-finite (those go through the element-wise ``lit`` path)."""
    vals = [float(v) for v in values]
    if vals and all(map(math.isfinite, vals)):
        return "array(" + ",".join(f"{v!r}D" for v in vals) + ")"
    return None


# Whole-expression SQL templates for column-vs-literal-query distances.
# Same expression tree Catalyst sees from the F.zip_with/F.aggregate
# builders below (ZipWith/ArrayAggregate/ArrayTransform nodes), but ONE
# py4j call instead of ~10 (each Python lambda in a higher-order function
# costs round trips) — serving-path plan construction dropped ~40 ms/query
# at dim=64 (measured r10). Bit-identical results: same fold order, same
# double arithmetic.
_DIST_SQL = {
    "l2": ("sqrt(aggregate(zip_with({c}, {q}, (x, y) -> (x - y) * (x - y)), "
           "0.0D, (acc, v) -> acc + v))"),
    "manhattan": ("aggregate(zip_with({c}, {q}, (x, y) -> abs(x - y)), "
                  "0.0D, (acc, v) -> acc + v)"),
    "dot": ("aggregate(zip_with({c}, {q}, (x, y) -> x * y), "
            "0.0D, (acc, v) -> acc + v)"),
    "cosine": ("(aggregate(zip_with({c}, {q}, (x, y) -> x * y), "
               "0.0D, (acc, v) -> acc + v) / "
               "(sqrt(aggregate(transform({c}, x -> x * x), "
               "0.0D, (acc, v) -> acc + v)) * "
               "sqrt(aggregate(transform({q}, x -> x * x), "
               "0.0D, (acc, v) -> acc + v))))"),
}


def distance_to_expr(vector_col: str, query, metric: str) -> Column | None:
    """One-py4j-call distance expression from a NAMED array column to a
    literal query vector; None when inexpressible (non-finite values) —
    callers fall back to the Column-builder path."""
    arr = _arr_sql(query)
    if arr is None or metric not in _DIST_SQL:
        return None
    c = f"cast(`{vector_col}` as array<double>)"
    return F.expr(_DIST_SQL[metric].format(c=c, q=arr))


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
    A NAMED column takes the one-expr SQL path (see distance_to_expr).
    """
    if isinstance(a, str):
        e = distance_to_expr(a, query, "l2")
        if e is not None:
            return e
    return l2_distance(a, lit_double_array(query))


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
    if isinstance(a, str):
        e = distance_to_expr(a, query, "manhattan")
        if e is not None:
            return e
    return manhattan_distance(a, lit_double_array(query))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; used by the near-duplicate / similarity-search
    extensions (not a reference op — reference is L2-only)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_similarity_to(a: Column | str, query: list[float]) -> Column:
    if isinstance(a, str):
        e = distance_to_expr(a, query, "cosine")
        if e is not None:
            return e
    return cosine_similarity(a, lit_double_array(query))
