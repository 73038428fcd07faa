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
- query + prefetch       → candidate union → rescore with the top-level
  query (broadcast left-semi id join; the PQ/BQ two-stage shape). The
  rescore query may itself be dense, sparse, or a multivector token
  matrix (MaxSim) — Qdrant's documented hybrid funnels.
- nested ``prefetch``    → each prefetch spec may carry its own
  ``prefetch`` list; inner legs produce candidates, the outer leg's
  ``query`` rescores them — recursion to any depth, so the standard
  sparse→dense→MaxSim funnel is one call.
- prefetch leg queries   → dense vector (``knn_search``), sparse
  ``{"indices","values"}`` (``sparse_topk``), or a token-matrix
  multivector (``multivector_topk`` MaxSim) — selected by query shape.
- ``{"fusion": "rrf"}``  → ``operators.lexical.rrf_fuse`` (per-leg score
  direction threaded: cosine/dot similarity legs rank descending)
- ``{"fusion": "dbsf"}`` → distribution-based score fusion (per-list
  μ±3σ normalization, Qdrant's documented DBSF), top-n-sized work only
- ``{"sample": "random"}`` → ``sources.random_sample`` (seeded, exact)
- ``{"recommend": ...}`` → ``operators.knn.recommend`` (positive/negative
  take point IDs or raw vectors, Qdrant's RecommendInput)
- ``{"discover": ...}``  → ``operators.discover.discover`` (target and
  context examples likewise by ID or vector; id-form examples excluded)
- ``{"context": ...}``   → ``operators.discover.context_search`` — the
  context-only query (pair or list of pairs, same ID/vector grammar)
- ``{"formula": ...}`` + one prefetch leg → ``formula.rescore_with_formula``
  (Qdrant score boosting: ``$score`` binds to the leg's native score
  column, payload fields resolve as variables)
- scalar / ``{"nearest": X}`` → query-by-stored-point (the id's vector,
  the point itself excluded) / the explicit NearestQuery unwrap; an
  ``"mmr"`` sibling reranks the dense leg for diversity
  (``operators.mmr``, greedy Carbonell-Goldstein over a bounded pool)
- ``group_by=``/``group_size=``/``with_lookup=`` → grouped query via
  ``operators.knn.search_groups`` (dense vector queries)
- ``query=None``         → id-ordered scroll page (``order_by=`` walks
  ``(key, id)`` — Qdrant scroll ordering; a bare string is ascending,
  the object form ``{"key": ..., "direction": "desc", "start_from": v}``
  flips it / begins the walk at ``v`` inclusive as a scan predicate)

``using`` selects a named vector (``vec_{name}`` column, see
``CollectionCatalog.vector_col_of``; sparse legs use the
``sparse_{name}_indices/values`` pair, multivector legs ``mv_{name}``);
``query_filter`` takes the :mod:`vectordb_cloud_spark.filters` DSL
document. Filters on a prefetch apply inside that prefetch; the
top-level filter applies to the final candidate set BEFORE the final
limit (Qdrant filters merged candidates, then truncates — ADVICE r8).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectordb_cloud_spark.filters import compile_filter


from vectordb_cloud_spark.errors import PointNotFoundError  # noqa: F401
# re-exported: query-by-id callers historically import it from here


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
        score_col = _leg_score_col(df.columns)
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


def _leg_score_col(cols: list[str]) -> str:
    """The score column a candidate leg carries — shared by every consumer
    (dbsf normalization, formula rescoring) so a new leg type only needs
    one update here; rrf_fuse in operators/lexical.py mirrors the same
    (score, dist, maxsim) precedence."""
    return next((c for c in ("score", "dist", "maxsim") if c in cols),
                "dist")


def _sparse_cols(using: str | None) -> tuple[str, str]:
    if using:
        return f"sparse_{using}_indices", f"sparse_{using}_values"
    return "indices", "values"


def _is_sparse_query(q: Any) -> bool:
    return isinstance(q, dict) and "indices" in q and "values" in q


def _is_multivector_query(q: Any) -> bool:
    return (
        isinstance(q, (list, tuple))
        and len(q) > 0
        and isinstance(q[0], (list, tuple))
    )


def _metric_score_expr(vector_col: str, qv: list[float],
                       metric: str) -> tuple[Column, bool]:
    """(score expression, higher_is_better) for a dense query under one
    metric — the scan-predicate form of knn_search's dispatch, used where
    a score cut must apply to POINTS before another operator ranks them
    (group_by + score_threshold: Qdrant cuts points, then groups form
    from the survivors)."""
    from vectordb_cloud_spark.functions.vector import (
        cosine_similarity_to,
        distance_to_expr,
        dot_product,
        l2_distance_to,
        lit_double_array,
        manhattan_distance_to,
    )

    if metric == "l2":
        return l2_distance_to(vector_col, qv), False
    if metric == "cosine":
        return cosine_similarity_to(vector_col, qv), True
    if metric == "dot":
        e = distance_to_expr(vector_col, qv, "dot")
        if e is None:
            e = dot_product(F.col(vector_col), lit_double_array(qv))
        return e, True
    if metric == "manhattan":
        return manhattan_distance_to(vector_col, qv), False
    raise ValueError(f"unknown metric {metric!r}")


def _score_query(
    base: DataFrame,
    query: Any,
    using: str | None,
    pred: Column | None,
    k: int,
    id_col: str,
    metric: str,
) -> tuple[DataFrame, bool, str]:
    """Score ``base`` (the full collection or a candidate-restricted frame)
    with one query — dense / sparse / multivector dispatch by query shape.
    Returns ``(topk_df, higher_is_better, score_col)`` so fusion knows
    each leg's score direction (ADVICE r8: cosine/dot similarity also
    lands in the ``dist`` column) and threshold cuts filter the COMPUTED
    score column — not a same-named payload column `_leg_score_col`'s
    precedence could pick up."""
    if _is_sparse_query(query):
        from vectordb_cloud_spark.operators.sparse import sparse_topk

        icol, vcol = _sparse_cols(using)
        df = base.filter(F.col(icol).isNotNull())
        if pred is not None:
            df = df.filter(pred)
        out = sparse_topk(
            df, list(query["indices"]), [float(x) for x in query["values"]],
            k=k, id_col=id_col, idx_col=icol, val_col=vcol,
        )
        return out, True, "score"
    if _is_multivector_query(query):
        from vectordb_cloud_spark.operators.multivector import multivector_topk

        tokens_col = f"mv_{using}" if using else "token_vectors"
        out = multivector_topk(
            base, [[float(x) for x in tok] for tok in query],
            k=k, tokens_col=tokens_col, id_col=id_col, filters=pred,
        )
        return out, True, "maxsim"
    if isinstance(query, (list, tuple)):
        from vectordb_cloud_spark.operators.knn import knn_search

        out = knn_search(
            base, [float(x) for x in query], k=k,
            vector_col=_vector_col(using), filters=pred, metric=metric,
            tiebreak=id_col,
        )
        return out, metric in ("cosine", "dot"), "dist"
    if isinstance(query, dict) and query.get("sample") == "random":
        # Qdrant allows a random-sample PREFETCH leg (r14 grammar dreg):
        # seeded-deterministic candidates for the outer query to rescore.
        # The leg's "score" is its own sample order (the seeded shuffle
        # hash, ascending), so rank-based fusion sees the sample's order —
        # Qdrant's arbitrary-order semantics, made replayable.
        from vectordb_cloud_spark.sources.readers import random_sample

        df = base if pred is None else base.filter(pred)
        out = random_sample(df, k, id_col=id_col).withColumn(
            "score",
            F.xxhash64(F.col(id_col), F.lit(42)).cast("double"))
        return out, False, "score"
    raise ValueError(f"unsupported leg query: {query!r}")


def _candidate_union(legs: list[DataFrame], id_col: str) -> DataFrame:
    cand = legs[0].select(id_col)
    for extra in legs[1:]:
        cand = cand.unionByName(extra.select(id_col))
    return cand.distinct()


def _restrict_to_candidates(
    points: DataFrame, legs: list[DataFrame], id_col: str
) -> DataFrame:
    """Restrict ``points`` to the union of the legs' candidate ids — the
    funnel's stage handoff. Prefetch candidate lists are top-n bounded, so
    they collect driver-side (one bounded job per stage, exactly Qdrant's
    sequential prefetch execution) and push into the next stage's scan as
    ONE parsed ``id IN (...)`` predicate: on an id-sorted/bucketed layout
    that is row-group/file pruning, so a rescore stage reads the
    candidates' row groups instead of re-scanning the corpus behind a
    semi join. Non-integral ids or oversize unions keep the broadcast
    left-semi join (shared primitive: ``operators.knn.restrict_to_ids``)."""
    from vectordb_cloud_spark.operators.knn import restrict_to_ids

    return restrict_to_ids(points, _candidate_union(legs, id_col),
                           id_col=id_col)


def _point_vector(points: DataFrame, pid, vector_col: str,
                  id_col: str) -> list[float]:
    """Resolve a query-by-ID (Qdrant: ``query: <point id>`` / ``query:
    {"nearest": <point id>}``) to the stored point's vector — one bounded
    equality probe (file-skippable on the id-sorted buckets), the same
    contract as recommend's example fetch. Resolves against the
    UNFILTERED collection, as Qdrant does (the filter scopes results, not
    the example lookup). Raises when the id is absent."""
    rows = (
        points.filter(F.col(id_col) == F.lit(pid))
        .select(F.col(vector_col).cast("array<double>"))
        .limit(1)
        .collect()
    )
    if not rows or rows[0][0] is None:
        raise PointNotFoundError(
            f"query point id {pid!r} not found in collection")
    return [float(x) for x in rows[0][0]]


def _unwrap_nearest(query: Any) -> tuple[Any, dict | None]:
    """Qdrant's explicit NearestQuery form: ``{"nearest": X}`` equals the
    bare query ``X``; an ``mmr`` sibling requests diversity reranking.
    Returns ``(inner_query, mmr_spec_or_None)``."""
    if isinstance(query, dict) and "nearest" in query:
        extra = set(query) - {"nearest", "mmr"}
        if extra:
            raise ValueError(
                f"unknown keys beside 'nearest': {sorted(extra)}")
        mmr = query.get("mmr")
        if mmr is not None and not isinstance(mmr, dict):
            raise ValueError(f"mmr must be an object, got {mmr!r}")
        return query["nearest"], mmr
    return query, None


def _is_point_id(query: Any) -> bool:
    return isinstance(query, (int, str)) and not isinstance(query, bool)


def _run_prefetch(
    points: DataFrame,
    spec: dict[str, Any],
    id_col: str,
    metric: str,
) -> tuple[DataFrame, bool]:
    """One prefetch leg, recursively: if the spec carries its own
    ``prefetch`` list, those inner legs run first and the leg's ``query``
    rescores only their candidate union (broadcast left-semi join — the
    multi-stage funnel). Returns ``(topk_df, higher_is_better)``."""
    if "query" not in spec:
        raise ValueError(f"prefetch needs a 'query' vector: {spec!r}")
    q, mmr = _unwrap_nearest(spec["query"])
    if mmr is not None:
        raise ValueError("mmr is supported on the top-level query only")
    if q is not spec["query"] or _is_point_id(q):
        spec = dict(spec, query=q)
        if _is_point_id(q):
            # by-id leg: the example's own row never scores (Qdrant)
            vcol = _vector_col(spec.get("using"))
            spec["query"] = _point_vector(points, q, vcol, id_col)
            excl = {"must_not": [{"has_id": [q]}]}
            spec["filter"] = ({"must": [spec["filter"], excl]}
                              if spec.get("filter") else excl)
    base = points
    inner = spec.get("prefetch")
    if inner:
        inner_specs = [inner] if isinstance(inner, dict) else list(inner)
        legs = [
            _run_prefetch(points, s, id_col, metric)[0] for s in inner_specs
        ]
        base = _restrict_to_candidates(points, legs, id_col)
    pred = compile_filter(spec.get("filter"), id_col=id_col)
    out, hib, sc = _score_query(
        base, spec["query"], spec.get("using"), pred,
        int(spec.get("limit", 100)), id_col, spec.get("metric", metric),
    )
    thr = spec.get("score_threshold")
    if thr is not None:
        # per-leg cut (Qdrant Prefetch.score_threshold): applied to the
        # leg's COMPUTED score before its candidates enter fusion/rescore
        t = float(thr)
        if not math.isfinite(t):
            raise ValueError("prefetch score_threshold must be finite")
        out = out.filter(F.col(sc) >= F.lit(t) if hib
                         else F.col(sc) <= F.lit(t))
    return out, hib


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
    group_by: str | None = None,
    group_size: int = 3,
    with_lookup: DataFrame | None = None,
    lookup_id_col: str | None = None,
    order_by: str | dict | None = None,
    offset: int = 0,
    lookup_from: DataFrame | None = None,
    score_threshold: float | None = None,
) -> DataFrame:
    """One entry point for every read — see module docstring for the
    dispatch table. Returns a DataFrame whose shape matches the operator
    that served the branch (ids + score/dist columns for searches, full
    rows for scroll/sample).

    ``query`` also accepts Qdrant's explicit forms (r12): a bare scalar
    (int/str) or ``{"nearest": <point id>}`` searches BY STORED POINT —
    the id's vector becomes the query and the point itself is excluded
    from results, resolved against the unfiltered collection (one bounded
    probe); ``{"nearest": <vector>}`` equals the bare vector; adding
    ``"mmr": {"diversity": d, "candidates_limit": N}`` reranks the dense
    leg for diversity (Maximal Marginal Relevance — greedy
    relevance-vs-redundancy selection over a bounded candidate pool, see
    ``operators.mmr``; composes with prefetch — the pool becomes the
    legs' candidate union — and with filters/offset/score_threshold;
    group_by and non-dense queries reject it loudly). MMR results carry
    ``dist`` (the relevance score, as Qdrant returns it) plus
    ``mmr_rank`` (selection order).

    ``score_threshold``: Qdrant's minimal-score cut — results with a
    WORSE score are excluded, where "worse" follows the branch's score
    direction (distance legs drop score > threshold, similarity legs —
    sparse/multivector/cosine/dot — and fusion scores drop score <
    threshold). Every supported branch ranks monotonically in its score,
    so cutting after the branch's top-``limit+offset`` equals cutting
    before it, exactly Qdrant's semantics (fewer than ``limit`` rows come
    back when the cut bites). Supported on the vector-query branches
    (dense/sparse/multivector, single-stage and prefetch-rescore), on
    fusion, on ``group_by`` (the cut applies to points, then groups form
    from the survivors — Qdrant's query-groups semantics), on
    ``recommend`` and ``discover`` (Qdrant accepts it there too — the cut
    applies to each branch's PRIMARY ranking score: recommend's distance
    — with best_score's tiered ranking cut as a prefix, see
    ``operators.knn.recommend`` — and discover's context_score, higher is
    better), and per prefetch leg via the spec's own ``score_threshold``
    key; scroll/sample/order_by have no score to cut (Qdrant rejects it
    there too) and formula scores are composite — unsupported,
    ValueError. Non-finite thresholds are rejected (NaN would silently
    empty the result).

    ``group_by``/``group_size``/``with_lookup``: Qdrant's grouped query —
    a dense vector query returns the best ``group_size`` hits per group
    for the ``limit`` nearest groups, optionally joining the group head's
    payload from a second collection (``operators.knn.search_groups``).
    ``order_by``: Qdrant scroll ordering — with ``query=None`` the page
    walks ``(order_by, id)`` ascending instead of plain id order.

    ``offset``: Qdrant result paging — skip the first ``offset`` ranked
    rows, return the next ``limit`` (each branch fetches
    ``limit + offset`` candidates, so deep paging costs what Qdrant
    documents it costs). ``lookup_from``: for recommend, discover, and
    context queries, resolve id-form examples against this second frame
    (Qdrant's lookup_from — the foreign id space excludes nothing from
    the results, r13)."""
    pred = compile_filter(query_filter, id_col=id_col)
    vcol = _vector_col(using)
    # Qdrant NearestQuery / query-by-ID / MMR (r12): {"nearest": X}
    # unwraps to the bare query X; a scalar X is a stored point id whose
    # vector becomes the query (the point itself excluded, as in Qdrant);
    # an "mmr" sibling requests diversity reranking of the dense leg
    query, mmr_spec = _unwrap_nearest(query)
    if _is_point_id(query):
        # r14 grammar dreg: Qdrant's lookup_from applies to the query-by-ID
        # form too (and composes with an mmr sibling) — the id resolves in
        # the FOREIGN collection, and the foreign id space excludes nothing
        # from this collection's results (the recommend lookup_from rule)
        qpid = query
        src = points if lookup_from is None else lookup_from
        query = _point_vector(src, qpid, vcol, id_col)
        if lookup_from is None:
            not_self = F.col(id_col) != F.lit(qpid)
            pred = not_self if pred is None else (pred & not_self)
    if mmr_spec is not None and not (
        isinstance(query, (list, tuple)) and query
        and not _is_multivector_query(query)
    ):
        raise ValueError("mmr requires a dense 'nearest' vector (or point "
                         f"id); got {query!r}")
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")
    if score_threshold is not None:
        score_threshold = float(score_threshold)
        if not math.isfinite(score_threshold):
            # NaN compares false everywhere — it would silently empty the
            # result instead of failing validation, and could never warm
            # a serving template; reject like Qdrant does
            raise ValueError("score_threshold must be finite")
    fetch = limit + offset

    def _cut(df: DataFrame, score_col: str,
             higher_is_better: bool) -> DataFrame:
        # score_threshold: monotone-in-rank per branch, so cutting the
        # branch's ranked top-`fetch` equals cutting before ranking
        if score_threshold is None:
            return df
        t = float(score_threshold)
        return df.filter(F.col(score_col) >= F.lit(t) if higher_is_better
                         else F.col(score_col) <= F.lit(t))

    def _no_threshold(branch: str) -> None:
        if score_threshold is not None:
            raise ValueError(
                f"score_threshold is not supported with {branch}")

    def _page(df: DataFrame, order: list | None = None) -> DataFrame:
        # every branch frame is internally ordered (orderBy upstream of
        # its limit), so Offset applies to the ranked stream; `order`
        # re-sorts frames that come back as local relations (fusion)
        if offset <= 0:
            return df
        if order is not None:
            df = df.orderBy(*order)
        return df.offset(offset)

    def _run_mmr(base: DataFrame) -> DataFrame:
        from vectordb_cloud_spark.operators.mmr import mmr_search

        out = mmr_search(
            base, [float(x) for x in query], k=fetch,
            diversity=float(mmr_spec.get("diversity", 0.5)),
            candidates_limit=mmr_spec.get("candidates_limit"),
            vector_col=vcol, id_col=id_col, filters=pred, metric=metric,
            score_threshold=score_threshold,
        )
        return _page(out)

    if group_by is not None:
        from vectordb_cloud_spark.operators.knn import search_groups

        if mmr_spec is not None:
            raise ValueError("mmr is not supported with group_by")
        if not isinstance(query, (list, tuple)) or _is_multivector_query(query):
            raise ValueError("group_by requires a dense vector query")
        if offset:
            raise ValueError("offset is not supported with group_by")
        if score_threshold is not None:
            # Qdrant query-groups accepts score_threshold: the cut applies
            # to POINTS (by the query's own score), then groups form from
            # the survivors — expressed as a scan predicate so
            # search_groups ranks only qualifying hits
            expr, hib_m = _metric_score_expr(
                vcol, [float(x) for x in query], metric)
            points = points.filter(
                expr >= F.lit(score_threshold) if hib_m
                else expr <= F.lit(score_threshold))
        return search_groups(
            points, [float(x) for x in query], group_by,
            k_groups=limit, hits_per_group=group_size, vector_col=vcol,
            filters=pred, id_col=id_col, with_lookup=with_lookup,
            lookup_id_col=lookup_id_col,
        )

    # --- fusion / rescore branches need the prefetch lists first
    if prefetch:
        if isinstance(prefetch, dict):
            prefetch = [prefetch]
        ran = [_run_prefetch(points, spec, id_col, metric) for spec in prefetch]
        lists = [df for df, _ in ran]
        hibs = [hib for _, hib in ran]
        if isinstance(query, dict) and "formula" in query:
            # Qdrant formula query: rescore ONE prefetch leg's candidates
            # with a formula over $score (the leg's native score column —
            # a distance for l2 legs, a similarity for sparse/maxsim legs)
            # and payload fields. Top-level filter prunes candidates first.
            from vectordb_cloud_spark.formula import rescore_with_formula

            if len(lists) != 1:
                raise ValueError(
                    "a formula query rescopes exactly one prefetch leg; "
                    f"got {len(lists)}"
                )
            _no_threshold("formula rescoring")
            leg = lists[0]
            score_col = _leg_score_col(leg.columns)
            if pred is not None:
                # survivors = candidate ids passing the top-level filter —
                # probed via id IN (row-group pruned) + pred, never a
                # corpus-wide filter scan on the join's build side
                keep = _restrict_to_candidates(points, [leg], id_col) \
                    .filter(pred).select(id_col)
                leg = leg.join(F.broadcast(keep), id_col, "left_semi")
            return _page(rescore_with_formula(
                leg, query["formula"], k=fetch,
                score_col=score_col, id_col=id_col,
            ))
        if isinstance(query, dict) and "fusion" in query:
            from vectordb_cloud_spark.operators.lexical import rrf_fuse

            kind = query["fusion"]
            # With a top-level filter, fuse over ALL candidates (the lists
            # are top-n, so this is bounded by Σ prefetch limits), filter
            # the merged set, THEN truncate — Qdrant filters merged
            # candidates before limiting (ADVICE r8).
            fuse_k = fetch if pred is None else max(fetch, sum(
                int(s.get("limit", 100)) for s in prefetch
            ))
            if kind == "rrf":
                fused = rrf_fuse(lists, id_col=id_col, k=fuse_k, rrf_k=rrf_k,
                                 max_list_rows=None, higher_is_better=hibs)
            elif kind == "dbsf":
                fused = dbsf_fuse(lists, id_col=id_col, k=fuse_k,
                                  higher_is_better=hibs)
            else:
                raise ValueError(f"unknown fusion {kind!r}")
            # fused scores (rrf sums / dbsf normalized sums) rank
            # descending — the threshold keeps score >= t
            fused = _cut(fused,
                         [c for c in fused.columns if c != id_col][0], True)
            if pred is not None:
                score_col = [c for c in fused.columns if c != id_col][0]
                keep = _restrict_to_candidates(points, [fused], id_col) \
                    .filter(pred).select(id_col)
                fused = (
                    fused.join(F.broadcast(keep), id_col, "left_semi")
                    .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
                    .limit(fetch)
                )
                return _page(fused)
            score_col = [c for c in fused.columns if c != id_col][0]
            return _page(fused,
                         order=[F.col(score_col).desc(), F.col(id_col).asc()])
        if (
            isinstance(query, (list, tuple)) or _is_sparse_query(query)
        ):
            # rescore the candidate union with the top-level query — dense,
            # sparse, or multivector (MaxSim), per query shape; candidates
            # hand off as an id IN probe (row-group pruning) when bounded
            base = _restrict_to_candidates(points, lists, id_col)
            if mmr_spec is not None:
                # Qdrant MMR over prefetched candidates: the pool is the
                # legs' union, the rerank is the same greedy selection
                return _run_mmr(base)
            out, hib, sc = _score_query(
                base, query, using, pred, fetch, id_col, metric
            )
            return _page(_cut(out, sc, hib))
        raise ValueError(
            "prefetch requires a fusion directive or a rescore query as "
            f"the top-level query; got {query!r}"
        )

    # --- single-stage branches
    if query is None:
        _no_threshold("scroll/order_by")
        df = points if pred is None else points.filter(pred)
        if order_by is not None:
            # Qdrant scroll order_by — bare string (ascending) or the
            # object form {"key": ..., "direction": "asc"|"desc",
            # "start_from": v}. The id tiebreak keeps the order total so
            # pages never skip/duplicate ties. ``start_from`` begins the
            # walk at that key value INCLUSIVE (Qdrant's semantics) —
            # compiled as a scan predicate, so the cursor-style
            # continuation prunes instead of offsetting.
            start_from = None
            if isinstance(order_by, dict):
                key_name = order_by["key"]
                direction = order_by.get("direction", "asc")
                start_from = order_by.get("start_from")
                extra = set(order_by) - {"key", "direction", "start_from"}
                if extra:
                    raise ValueError(
                        f"unknown order_by keys: {sorted(extra)}")
            else:
                key_name, direction = order_by, "asc"
            if direction not in ("asc", "desc"):
                raise ValueError(
                    f"order_by direction must be 'asc' or 'desc', "
                    f"got {direction!r}"
                )
            if start_from is not None:
                df = df.filter(
                    F.col(key_name) <= F.lit(start_from)
                    if direction == "desc"
                    else F.col(key_name) >= F.lit(start_from))
            key = (F.col(key_name).desc() if direction == "desc"
                   else F.col(key_name).asc())
            page = df.orderBy(key, F.col(id_col).asc())
        else:
            page = df.orderBy(F.col(id_col).asc())
        if offset:
            page = page.offset(offset)
        return page.limit(limit)
    if isinstance(query, (list, tuple)) or _is_sparse_query(query):
        if mmr_spec is not None:
            return _run_mmr(points)
        # dense vector, multivector token matrix (MaxSim), or sparse
        # {"indices","values"} (Qdrant SparseVector; `using` names the
        # configured vector — columns follow the collection conventions)
        out, hib, sc = _score_query(points, query, using, pred, fetch,
                                    id_col, metric)
        return _page(_cut(out, sc, hib))
    if isinstance(query, dict):
        if query.get("sample") == "random":
            from vectordb_cloud_spark.sources.readers import random_sample

            _no_threshold("random sampling")
            df = points if pred is None else points.filter(pred)
            return _page(random_sample(df, fetch, seed=seed, id_col=id_col))
        if "recommend" in query:
            from vectordb_cloud_spark.operators.knn import recommend

            spec = query["recommend"]
            return _page(recommend(
                points, list(spec.get("positive") or []),
                list(spec.get("negative") or []), k=fetch,
                id_col=id_col, vector_col=vcol, filters=pred,
                tiebreak=id_col,
                strategy=spec.get("strategy", "average_vector"),
                lookup_from=lookup_from,
                score_threshold=score_threshold))
        if "discover" in query or "context" in query:
            # discover/context examples follow Qdrant's grammar: each
            # positive/negative/target slot takes a raw vector OR a stored
            # point id (resolved with one bounded probe against the
            # unfiltered collection — or against ``lookup_from`` when
            # given, Qdrant's foreign-collection example source, r13);
            # id-form examples are excluded from the results ONLY when
            # they come from this collection (a foreign id space has
            # nothing to exclude), exactly as in recommend
            example_ids: list = []
            example_src = points if lookup_from is None else lookup_from

            def _resolve_example(x):
                if _is_point_id(x):
                    example_ids.append(x)
                    return _point_vector(example_src, x, vcol, id_col)
                return [float(v) for v in x]

            def _pairs(specs):
                specs = [specs] if isinstance(specs, dict) else list(specs)
                return [(_resolve_example(p["positive"]),
                         _resolve_example(p["negative"])) for p in specs]

            def _excluded(p):
                if not example_ids or lookup_from is not None:
                    return p
                ex = ~F.col(id_col).isin(example_ids)
                return ex if p is None else (p & ex)

            if "discover" in query:
                from vectordb_cloud_spark.operators.discover import discover

                spec = query["discover"]
                pairs = _pairs(spec.get("context") or [])
                target = _resolve_example(spec["target"])
                return _page(discover(points, target, pairs, k=fetch,
                                      vector_col=vcol, id_col=id_col,
                                      filters=_excluded(pred),
                                      score_threshold=score_threshold))
            # Qdrant ContextQuery: pairs only, no target — rank by the
            # context score alone (higher is better, id tiebreak); the
            # threshold cut is a prefix of that ranking, so post-top-k
            # filtering is exact
            from vectordb_cloud_spark.operators.discover import (
                context_search,
            )

            pairs = _pairs(query["context"])
            out = context_search(points, pairs, k=fetch, vector_col=vcol,
                                 id_col=id_col, filters=_excluded(pred))
            return _page(_cut(out, "context_score", True))
    raise ValueError(f"unsupported query: {query!r}")
