"""Universal query API — Qdrant's ``POST /points/query`` facade.

Qdrant 1.10+ funnels every read through one endpoint: a ``query`` (a
vector, ``{"sample": "random"}``, a recommend/discover document, or a
fusion directive) plus optional ``prefetch`` sub-queries (each its own
vector/filter/limit/``using``), a top-level filter, and a named-vector
selector. The reference reaches the engine through the same client
(/root/reference/QdrantCloud.py:24), so this facade is the umbrella a
migrating user actually calls; every branch delegates to the operators
that already carry the plan-shape and oracle guarantees:

- vector query           → ``operators.knn.knn_search`` (shuffle-free top-k)
- vector + prefetch      → candidate union → ``exact_rescore_topk``
  (broadcast id join; the PQ/BQ two-stage shape)
- ``{"fusion": "rrf"}``  → ``operators.lexical.rrf_fuse``
- ``{"fusion": "dbsf"}`` → distribution-based score fusion (per-list
  μ±3σ normalization, Qdrant's documented DBSF), top-n-sized work only
- ``{"sample": "random"}`` → ``sources.random_sample`` (seeded, exact)
- ``{"recommend": ...}`` → ``operators.knn.recommend``
- ``{"discover": ...}``  → ``operators.discover.discover``
- ``query=None``         → id-ordered scroll page

``using`` selects a named vector (``vec_{name}`` column, see
``CollectionCatalog.vector_col_of``); ``query_filter`` takes the
:mod:`vectordb_cloud_spark.filters` DSL document. Filters on a prefetch
apply inside that prefetch; the top-level filter applies to the final
candidate set — Qdrant's documented scoping.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectordb_cloud_spark.filters import compile_filter


def _vector_col(using: str | None) -> str:
    return f"vec_{using}" if using else "embedding"


def dbsf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "vec_id",
    k: int = 10,
    higher_is_better: bool | list[bool] = False,
) -> DataFrame:
    """Distribution-based score fusion: each list's scores normalize to
    [0, 1] using mean ± 3σ as the limits (Qdrant's DBSF), then sum per id.
    Score direction is per-list (``dist`` ascending vs similarity
    descending). Inputs are top-n candidate lists, so the per-list stats
    aggregate is a handful of rows — corpus size never enters."""
    if isinstance(higher_is_better, bool):
        higher_is_better = [higher_is_better] * len(ranked_lists)
    parts = []
    for df, hib in zip(ranked_lists, higher_is_better):
        score_col = "score" if "score" in df.columns else "dist"
        s = F.col(score_col).cast("double")
        stats = df.agg(
            F.avg(s).alias("mu"), F.coalesce(F.stddev(s), F.lit(0.0)).alias("sd")
        )
        lo = F.col("mu") - 3 * F.col("sd")
        span = F.when(F.col("sd") > 0, 6 * F.col("sd")).otherwise(F.lit(1.0))
        norm = F.least(F.greatest((s - lo) / span, F.lit(0.0)), F.lit(1.0))
        if not hib:
            norm = 1.0 - norm
        parts.append(
            df.crossJoin(F.broadcast(stats)).select(
                id_col, norm.alias("__dbsf")
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return (
        unioned.groupBy(id_col)
        .agg(F.round(F.sum("__dbsf"), 6).alias("dbsf_score"))
        .orderBy(F.col("dbsf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _run_prefetch(
    points: DataFrame,
    spec: dict[str, Any],
    id_col: str,
    metric: str,
) -> DataFrame:
    from vectordb_cloud_spark.operators.knn import knn_search

    if "query" not in spec:
        raise ValueError(f"prefetch needs a 'query' vector: {spec!r}")
    pred = compile_filter(spec.get("filter"), id_col=id_col)
    return knn_search(
        points,
        [float(x) for x in spec["query"]],
        k=int(spec.get("limit", 100)),
        vector_col=_vector_col(spec.get("using")),
        filters=pred,
        metric=spec.get("metric", metric),
        tiebreak=id_col,
    )


def query_points(
    points: DataFrame,
    query: Any = None,
    prefetch: list[dict] | None = None,
    using: str | None = None,
    query_filter: dict | None = None,
    limit: int = 10,
    id_col: str = "vec_id",
    metric: str = "l2",
    seed: int = 42,
    rrf_k: int = 60,
) -> DataFrame:
    """One entry point for every read — see module docstring for the
    dispatch table. Returns a DataFrame whose shape matches the operator
    that served the branch (ids + score/dist columns for searches, full
    rows for scroll/sample)."""
    pred = compile_filter(query_filter, id_col=id_col)
    vcol = _vector_col(using)

    # --- fusion / rescore branches need the prefetch lists first
    if prefetch:
        lists = [
            _run_prefetch(points, spec, id_col, metric) for spec in prefetch
        ]
        if isinstance(query, dict) and "fusion" in query:
            from vectordb_cloud_spark.operators.lexical import rrf_fuse

            kind = query["fusion"]
            if kind == "rrf":
                fused = rrf_fuse(lists, id_col=id_col, k=limit, rrf_k=rrf_k,
                                 max_list_rows=None)
            elif kind == "dbsf":
                fused = dbsf_fuse(lists, id_col=id_col, k=limit)
            else:
                raise ValueError(f"unknown fusion {kind!r}")
            if pred is not None:
                score_col = [c for c in fused.columns if c != id_col][0]
                fused = fused.join(
                    points.filter(pred).select(id_col), id_col, "left_semi"
                ).orderBy(F.col(score_col).desc(), F.col(id_col).asc())
            return fused
        if isinstance(query, (list, tuple)):
            from vectordb_cloud_spark.operators.knn import exact_rescore_topk

            cand = lists[0].select(id_col)
            for extra in lists[1:]:
                cand = cand.unionByName(extra.select(id_col))
            cand = cand.distinct()
            base = points if pred is None else points.filter(pred)
            return exact_rescore_topk(
                base, cand, [float(x) for x in query], k=limit,
                id_col=id_col, vector_col=vcol,
            )
        raise ValueError(
            "prefetch requires a fusion directive or a rescore vector as "
            f"the top-level query; got {query!r}"
        )

    # --- single-stage branches
    if query is None:
        df = points if pred is None else points.filter(pred)
        return df.orderBy(F.col(id_col).asc()).limit(limit)
    if isinstance(query, (list, tuple)):
        from vectordb_cloud_spark.operators.knn import knn_search

        return knn_search(points, [float(x) for x in query], k=limit,
                          vector_col=vcol, filters=pred, metric=metric,
                          tiebreak=id_col)
    if isinstance(query, dict):
        if "indices" in query and "values" in query:
            # sparse query vector (Qdrant SparseVector) — `using` names the
            # configured sparse vector; columns follow the collection
            # convention sparse_{name}_indices/values (or the bare
            # indices/values pair when `using` is None)
            from vectordb_cloud_spark.operators.sparse import sparse_topk

            if using:
                icol, vcol_s = (f"sparse_{using}_indices",
                                f"sparse_{using}_values")
            else:
                icol, vcol_s = "indices", "values"
            df = points.filter(F.col(icol).isNotNull())
            if pred is not None:
                df = df.filter(pred)
            return sparse_topk(df, list(query["indices"]),
                               [float(x) for x in query["values"]],
                               k=limit, id_col=id_col,
                               idx_col=icol, val_col=vcol_s)
        if query.get("sample") == "random":
            from vectordb_cloud_spark.sources.readers import random_sample

            df = points if pred is None else points.filter(pred)
            return random_sample(df, limit, seed=seed, id_col=id_col)
        if "recommend" in query:
            from vectordb_cloud_spark.operators.knn import recommend

            spec = query["recommend"]
            return recommend(points, list(spec.get("positive") or []),
                             list(spec.get("negative") or []), k=limit,
                             id_col=id_col, vector_col=vcol, filters=pred,
                             tiebreak=id_col,
                             strategy=spec.get("strategy", "average_vector"))
        if "discover" in query:
            from vectordb_cloud_spark.operators.discover import discover

            spec = query["discover"]
            pairs = [(p["positive"], p["negative"])
                     for p in spec.get("context") or []]
            return discover(points, spec["target"], pairs, k=limit,
                            vector_col=vcol, id_col=id_col, filters=pred)
    raise ValueError(f"unsupported query: {query!r}")
