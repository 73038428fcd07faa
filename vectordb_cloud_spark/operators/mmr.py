"""Maximal Marginal Relevance (MMR) diversity reranking.

Qdrant's diversity search (universal query API: ``query: {"nearest": v,
"mmr": {"diversity": d, "candidates_limit": N}}``) — re-rank a bounded
candidate pool so results stay relevant to the query while penalizing
redundancy, per Carbonell & Goldstein, SIGIR '98:

    MMR(c) = (1 - d) * rel(c) - d * max_{s in S} sim(c, s)

greedily: the first pick is the most relevant candidate, each next pick
maximizes the relevance-minus-redundancy trade-off against the already
selected set S. ``diversity`` is Qdrant's knob: 0 = pure relevance (the
plain kNN order), 1 = pure diversity after the first pick.

Spark split: candidate RETRIEVAL is the distributed part — one exact
filtered top-``candidates_limit`` scan (``knn_search``: single map pass +
TakeOrderedAndProject, no shuffle) — while the greedy selection is
inherently sequential over the bounded pool, so it runs driver-side in
numpy over one bounded collect (ids + vectors + scores for at most
``candidates_limit`` rows — the same bounded-collect contract as
``recommend``'s example fetch; Qdrant likewise runs MMR as a single-node
rerank stage over its candidate pool). The selected ids then join back
into the candidate plan as a broadcast k-row frame, so the returned
DataFrame carries the points' full payload columns without collecting
them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hard ceiling on the MMR candidate pool. The greedy selection is a
#: driver-side O(pool²) similarity matrix over one bounded collect; this
#: cap makes the "bounded" contract enforced rather than advisory
#: (16384² float64 ≈ 2 GiB is the most a driver should ever pay here).
MAX_CANDIDATES_LIMIT = 16384


def _similarity_matrix(X, metric: str):
    """Pairwise similarity on the metric's own scale (higher = more
    similar): l2 -> negated euclidean distance, cosine -> normalized dot,
    dot -> inner product. The l2 form computes exact differences in row
    chunks rather than the ``|a|²+|b|²-2ab`` matmul identity — the
    identity's catastrophic cancellation perturbs near-ties enough to
    flip greedy picks vs a straightforward replay (found by this
    module's own ground-truth test), and bounded-pool MMR should be
    reproducible by the obvious numpy program."""
    import numpy as np

    if metric == "l2":
        n = X.shape[0]
        out = np.empty((n, n))
        step = max(1, (1 << 22) // max(1, n * X.shape[1]))  # ~32MB chunks
        for i in range(0, n, step):
            diff = X[i:i + step, None, :] - X[None, :, :]
            out[i:i + step] = np.sqrt((diff * diff).sum(axis=2))
        return -out
    if metric == "cosine":
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        Xn = X / norms[:, None]
        return Xn @ Xn.T
    if metric == "dot":
        return X @ X.T
    raise ValueError(f"unsupported metric for mmr: {metric!r}")


def mmr_select(ids, vectors, relevance, k: int, diversity: float,
               metric: str = "l2") -> list:
    """Pure greedy MMR over an in-memory pool: returns the selected ids in
    selection order. ``relevance`` must already be on a higher-is-better
    scale aligned with the metric (callers pass -dist for l2 legs).
    Deterministic: ties break on ascending id (numpy argmax takes the
    first maximum; candidates arrive in (rank, id) order)."""
    import numpy as np

    if not 0.0 <= float(diversity) <= 1.0:
        raise ValueError(
            f"mmr diversity must be in [0, 1], got {diversity!r}")
    k = min(int(k), len(ids))
    if k <= 0:
        return []
    X = np.asarray(vectors, dtype=np.float64)
    rel = np.asarray(relevance, dtype=np.float64)
    d = float(diversity)
    sim = _similarity_matrix(X, metric)
    n = len(ids)
    selected: list[int] = []
    best_sim = np.full(n, -np.inf)
    taken = np.zeros(n, dtype=bool)
    for _ in range(k):
        if not selected:
            score = rel.copy()
        else:
            score = (1.0 - d) * rel - d * best_sim
        score[taken] = -np.inf
        i = int(np.argmax(score))
        selected.append(i)
        taken[i] = True
        best_sim = np.maximum(best_sim, sim[:, i])
    return [ids[i] for i in selected]


def mmr_search(
    points: DataFrame,
    query_vector: list[float],
    k: int = 10,
    diversity: float = 0.5,
    candidates_limit: int | None = None,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    filters: Column | None = None,
    metric: str = "l2",
    score_threshold: float | None = None,
) -> DataFrame:
    """Diversity-aware top-k: exact filtered top-``candidates_limit``
    retrieval (distributed), greedy MMR selection over the pool
    (driver-side numpy, bounded), broadcast join back for the payload.

    Returns the selected rows with the leg's native score column
    (``dist`` — the relevance distance, as Qdrant returns the nearest
    score for MMR-selected points) plus ``mmr_rank`` (0-based selection
    order); rows come back ordered by ``mmr_rank``.

    ``candidates_limit`` defaults to ``max(4*k, 64)`` (softly capped at
    1024, but never below ``k``) — Qdrant's knob of the same name; a
    larger pool buys more diversity headroom for one longer scan + a
    bigger driver collect. Explicit pools above
    :data:`MAX_CANDIDATES_LIMIT` are rejected loudly — the greedy rerank
    is O(pool²) on the driver, so "bounded collect" is a hard contract.

    ``score_threshold`` cuts the CANDIDATE pool on the relevance score
    before selection (direction-aware like every other branch), so a
    point worse than the threshold can never be selected — fewer than
    ``k`` rows come back when the cut bites.
    """
    import math

    from vectordb_cloud_spark.operators.knn import knn_search

    if metric not in ("l2", "cosine", "dot"):
        # fail before paying the candidate scan + driver collect
        # (_similarity_matrix would only reject it after both)
        raise ValueError(f"unsupported metric for mmr: {metric!r}")
    k = int(k)
    if candidates_limit is None:
        # default pool: 4x the fetch, floored at 64, softly capped at 1024
        # — but never below k itself (k here is the caller's limit+offset,
        # which may legitimately exceed 1024)
        candidates_limit = max(k, min(1024, max(4 * k, 64)))
    candidates_limit = int(candidates_limit)
    if candidates_limit > MAX_CANDIDATES_LIMIT:
        raise ValueError(
            f"mmr candidates_limit ({candidates_limit}) exceeds the "
            f"bounded-collect ceiling ({MAX_CANDIDATES_LIMIT}): the greedy "
            f"selection is a driver-side O(pool²) rerank, so the pool is "
            f"hard-capped")
    if candidates_limit < k:
        raise ValueError(
            f"mmr candidates_limit ({candidates_limit}) must be >= the "
            f"fetch size limit+offset ({k})")
    if not 0.0 <= float(diversity) <= 1.0:
        # fail before paying the candidate scan (mmr_select re-checks for
        # direct callers)
        raise ValueError(
            f"mmr diversity must be in [0, 1], got {diversity!r}")
    if score_threshold is not None:
        score_threshold = float(score_threshold)
        if not math.isfinite(score_threshold):
            raise ValueError("score_threshold must be finite")
    cand = knn_search(points, query_vector, k=candidates_limit,
                      vector_col=vector_col, filters=filters, metric=metric,
                      tiebreak=id_col)
    hib = metric in ("cosine", "dot")  # knn_search emits similarity there
    if score_threshold is not None:
        cand = cand.filter(
            F.col("dist") >= F.lit(score_threshold) if hib
            else F.col("dist") <= F.lit(score_threshold))
    pool = (
        cand.select(F.col(id_col).alias("__id"),
                    F.col(vector_col).cast("array<double>").alias("__v"))
        .collect()
    )
    ids = [r["__id"] for r in pool]
    vecs = [r["__v"] for r in pool]
    # relevance recomputed in numpy from the collected vectors (not from
    # Spark's dist column): the selection then matches the obvious numpy
    # replay bit-for-bit instead of inheriting Spark's fold order; the
    # candidate CUT (top-pool, threshold) stays on Spark's scores above
    import numpy as np

    X = np.asarray(vecs, dtype=np.float64)
    q = np.asarray([float(x) for x in query_vector], dtype=np.float64)
    if metric == "l2":
        rel = -np.linalg.norm(X - q[None, :], axis=1)
    elif metric == "cosine":
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        qn = np.linalg.norm(q) or 1.0
        rel = (X @ q) / (norms * qn)
    else:  # dot
        rel = X @ q
    chosen = mmr_select(ids, vecs, rel, k=k, diversity=diversity,
                        metric=metric)
    spark = points.sparkSession
    from pyspark.sql.types import IntegerType, StructField, StructType

    # the broadcast k-row order frame joins on the candidate plan's own
    # id type (long/string/... alike), including the empty-selection case
    schema = StructType([
        StructField(id_col, cand.schema[id_col].dataType),
        StructField("mmr_rank", IntegerType()),
    ])
    from vectordb_cloud_spark.session import local_df

    order = local_df(spark, [(c, i) for i, c in enumerate(chosen)], schema)
    return (cand.join(F.broadcast(order), id_col)
            .orderBy(F.col("mmr_rank").asc()))
