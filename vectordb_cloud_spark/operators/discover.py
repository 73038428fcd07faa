"""Discovery and context search — Qdrant's ``/points/discover`` API.

The reference talks to Qdrant Cloud through qdrant-client
(/root/reference/QdrantCloud.py:24, search.py:43-48); beyond plain
``search`` that client exposes *discovery* search: steer the ranking with a
``target`` vector plus ``context`` pairs of (positive, negative) examples.
Public semantics (Qdrant docs, "Discovery API"):

- Each context pair divides space: a point is "inside" the pair's positive
  zone when it is closer to the positive example than to the negative one.
- **Discover** (target + pairs): rank by how many pairs place the point in
  the positive zone (more is better), break ties by distance to the target
  (closer is better).
- **Context search** (pairs only): rank purely by the pair score; among
  points with equal pair score the order is unspecified — we tiebreak on id
  for determinism.

Spark-first shape: the examples are a handful of vectors, so they fold into
the plan as literal arrays (same as every single-query search here — the
plan ships to executors once; this is NOT the per-row literal-matrix trap,
which needs thousands of cells). Scoring is one narrow map over the points
scan — pair indicators and the target distance are pure column expressions
inside whole-stage codegen — followed by ``orderBy().limit(k)`` which
Spark executes as TakeOrderedAndProject: per-partition top-k, k rows per
partition to the driver, no shuffle of the corpus. At 100 TB this is
exactly the brute-force-scan cost, filter-pushdown friendly, and trivially
parallel; to go sublinear, feed the routed candidate set from any of the
ANN indexes (IVF/graph/LSH) in as ``points``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.vector import l2_distance_to


def context_score(
    vector_col: Column | str,
    context_pairs: list[tuple[list[float], list[float]]],
) -> Column:
    """Number of (positive, negative) pairs whose positive example is the
    nearer of the two — Qdrant's context score, as one column expression."""
    if not context_pairs:
        raise ValueError("context_pairs must be non-empty")
    col = F.col(vector_col) if isinstance(vector_col, str) else vector_col
    score: Column | None = None
    for pos, neg in context_pairs:
        ind = (
            l2_distance_to(col, [float(x) for x in pos])
            < l2_distance_to(col, [float(x) for x in neg])
        ).cast("int")
        score = ind if score is None else score + ind
    return score


def discover(
    points: DataFrame,
    target: list[float],
    context_pairs: list[tuple[list[float], list[float]]],
    k: int = 10,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    filters: Column | None = None,
    score_threshold: float | None = None,
) -> DataFrame:
    """Discovery search: best context score, then closest to target.

    Returns the top-k rows with ``context_score`` and ``target_dist``
    columns appended; deterministic via the id tiebreak.

    ``score_threshold``: Qdrant accepts score_threshold on discover; the
    cut applies to the PRIMARY ranking score (``context_score``, higher
    is better — rows with ``context_score < t`` are excluded). The
    ranking is lexicographic on (context_score desc, ...), so the
    qualifying set is a prefix of the ranking and the cut is exact
    (Qdrant's cut-then-limit semantics).
    """
    import math

    df = points if filters is None else points.filter(filters)
    scored = df.withColumn(
        "context_score", context_score(vector_col, context_pairs)
    ).withColumn(
        "target_dist", l2_distance_to(F.col(vector_col), [float(x) for x in target])
    )
    if score_threshold is not None:
        score_threshold = float(score_threshold)
        if not math.isfinite(score_threshold):
            # NaN compares false everywhere — it would silently empty the
            # result instead of failing validation (query_points' rule)
            raise ValueError("score_threshold must be finite")
        scored = scored.filter(
            F.col("context_score") >= F.lit(score_threshold))
    return (
        scored.orderBy(
            F.col("context_score").desc(),
            F.col("target_dist").asc(),
            F.col(id_col).asc(),
        )
        .limit(k)
    )


def context_search(
    points: DataFrame,
    context_pairs: list[tuple[list[float], list[float]]],
    k: int = 10,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    filters: Column | None = None,
) -> DataFrame:
    """Context-only search: rank by pair score alone (id tiebreak)."""
    df = points if filters is None else points.filter(filters)
    scored = df.withColumn(
        "context_score", context_score(vector_col, context_pairs)
    )
    return (
        scored.orderBy(F.col("context_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
