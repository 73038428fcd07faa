"""Graph-based ANN: a distributed NSW-style neighbor graph + beam search.

The reference's server delegates ANN to Qdrant's HNSW index
(/root/reference/search.py:43). HNSW itself is a single-machine,
pointer-chasing structure — a literal port would serialize through one
node. This module is the Spark-idiomatic rendering of the same idea
(navigable small-world graph + greedy beam search), built from set
operations so every stage distributes:

- **Build** (`knn_graph_build`): candidate pairs come from LSH bucket
  collisions (bounded, never O(n²)), are scored exactly, and each node
  keeps its top-``degree`` neighbors (symmetrized, like HNSW's
  bidirectional links). An optional NN-descent-style refinement round
  joins neighbors-of-neighbors and re-selects top-``degree`` — the
  standard distributed kNN-graph improvement step (NN-Descent, Dong et
  al., WWW'11).
- **Persist** (`knn_graph_persist`): adjacency as a plain parquet table
  ``(src, dst)`` — at 100 TB this is bucketed by ``src`` so each beam hop
  is a pruned scan, and the vectors stay in the base table (no
  duplication into the index).
- **Search** (`graph_beam_search`): greedy beam search, one distributed
  round per hop: broadcast the current beam's neighbor ids (a few hundred
  ids — the ONLY driver-side state), semi-join the base table for their
  vectors, exact-score, keep beam top-``beam``. The loop runs
  ``max_hops`` rounds or until the beam stops improving; each round is a
  broadcast-pruned scan + TakeOrderedAndProject, so no hop ever shuffles
  the corpus.

Degree/beam/hops trade recall for reads exactly like HNSW's M/ef: tests
gate recall@10 vs exact (test_graph_ann.py) the same way the LSH/IVF/PQ
families are gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.vector import l2_distance, l2_distance_to


def _top_per_src(pairs: DataFrame, degree: int) -> DataFrame:
    """Keep each src's ``degree`` nearest dsts (dist, dst tiebreak)."""
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    return (
        pairs.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= degree)
        .drop("__rk")
    )


def knn_graph_build(
    points: DataFrame,
    degree: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    n_blockings: int = 2,
    refine_rounds: int = 1,
    seed: int = 42,
    max_train_rows: int = 100_000,
) -> DataFrame:
    """Build a symmetric kNN graph: ``(src, dst, dist)`` with up to
    ``degree`` out-edges per node.

    Candidates come from ``n_blockings`` INDEPENDENT k-means partitions of
    the corpus (different seeds over one driver-side sample — the
    random-partition-tree idea, flattened): nodes in the same cluster of
    any partition are candidate neighbors, so the pair space is
    Σ block_size² per blocking — n²/n_blocks in expectation, never n².
    (Round 6 replaced the earlier unthresholded-LSH generator: on a
    unit-norm corpus its single-projection buckets collapsed to ~2 per
    table, which IS n².) A second blocking with a different seed recovers
    neighbors split across the first partition's boundaries; each
    ``refine_round`` then runs one NN-descent step (Dong et al., WWW'11) —
    propose neighbors-of-neighbors, score, re-select — which repairs the
    remaining recall. Every stage is an equi-join on a block/centroid key
    or a bounded per-key top-k; nothing is quadratic, and the only
    driver-side state is the sampled k-means fit.
    """
    import numpy as np

    from vectordb_cloud_spark.operators.ann import _lloyd_fit, ivf_assign

    vecs0 = points.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if n_blocks is None:
        # target ~128 rows per block: Σ block² stays ~128·n while blocks
        # keep enough neighbors for the NN-descent rounds to bootstrap.
        # (Very large corpora want recursive partitioning below this —
        # build shards via hash_shard and union the graphs, then refine.)
        n_blocks = max(2, int(points.count()) // 128)
    sample = vecs0.select("vec").limit(max_train_rows).collect()
    X = np.asarray([r["vec"] for r in sample], dtype=np.float64)
    banded_parts = []
    for s in range(n_blockings):
        centers_np = _lloyd_fit(X, n_blocks, seed + s)
        centers = [(i, [float(x) for x in c]) for i, c in enumerate(centers_np)]
        assigned = ivf_assign(vecs0, centers, "vec").select(
            "id",
            (F.lit(s) * (n_blocks + 1) + F.col("centroid_id")).alias("block"),
        )
        banded_parts.append(assigned)
    banded = banded_parts[0]
    for p in banded_parts[1:]:
        banded = banded.unionByName(p)
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.block") == F.col("r.block"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    side = vecs0
    pairs = (
        cand.join(side.select(F.col("id").alias("id_a"), F.col("vec").alias("va")), "id_a")
        .join(side.select(F.col("id").alias("id_b"), F.col("vec").alias("vb")), "id_b")
        .withColumn("dist", l2_distance(F.col("va"), F.col("vb")))
        .select("id_a", "id_b", "dist")
    )
    # symmetrize: an (a,b) candidate is an edge candidate for BOTH endpoints
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "dist"
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "dist")
    )
    graph = _top_per_src(edges, degree)

    vecs = points.select(
        F.col(id_col).alias("__vid"), F.col(vec_col).cast("array<double>").alias("__vec")
    )
    for _ in range(refine_rounds):
        # NN-descent step: neighbors of my neighbors are candidate neighbors
        hop2 = (
            graph.alias("g1")
            .join(graph.alias("g2"), F.col("g1.dst") == F.col("g2.src"))
            .select(F.col("g1.src").alias("src"), F.col("g2.dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        cand = (
            graph.select("src", "dst")
            .unionByName(hop2)
            .dropDuplicates(["src", "dst"])
        )
        scored = (
            cand.join(vecs.withColumnRenamed("__vid", "src").withColumnRenamed("__vec", "__sv"), "src")
            .join(vecs.withColumnRenamed("__vid", "dst").withColumnRenamed("__vec", "__dv"), "dst")
            .withColumn("dist", l2_distance(F.col("__sv"), F.col("__dv")))
            .select("src", "dst", "dist")
        )
        graph = _top_per_src(scored, degree)
    return graph


def knn_graph_persist(graph: DataFrame, path: str) -> None:
    """Write the adjacency table. Kept as plain (src, dst, dist) parquet —
    at real scale write it bucketed by ``src`` (sources/bucketed.py) so a
    beam hop's ``src IN (beam)`` probe prunes files."""
    graph.select("src", "dst", F.col("dist").cast("double")).write.mode(
        "overwrite"
    ).parquet(path)


def graph_beam_search(
    points: DataFrame,
    graph: DataFrame,
    query_vector: list[float],
    k: int = 10,
    beam: int = 16,
    max_hops: int = 4,
    entry_points: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy beam search over the kNN graph — HNSW's search loop with the
    frontier as the only driver-side state.

    Start from ``entry_points`` seed nodes (smallest ids — deterministic;
    a production deployment would persist medoid entry points), then per
    hop: expand the beam's out-edges (broadcast ``isin`` on a list of at
    most beam×degree ids — a pruned probe of the adjacency table), score
    the new candidates exactly against the query, and keep the best
    ``beam`` visited nodes. Stops early when a hop discovers no closer
    node than the current worst beam member. Returns exact distances of
    the best ``k`` visited.

    Per hop this is: one filtered scan of the adjacency table + one
    filtered scan of the base table + a driver-side top-``beam`` over
    ≤ beam×degree scored rows — at 100 TB with a src-bucketed adjacency
    layout, both scans are file-pruned probes, and the corpus is never
    shuffled.
    """
    dist_to_q = lambda col: l2_distance_to(col, query_vector)  # noqa: E731

    seeds = (
        points.select(F.col(id_col).alias("id"),
                      dist_to_q(F.col(vec_col)).alias("dist"))
        .orderBy(F.col("id").asc())
        .limit(entry_points)
    )
    visited: dict[int, float] = {r["id"]: r["dist"] for r in seeds.collect()}
    beam_ids = sorted(visited, key=lambda i: (visited[i], i))[:beam]

    for _ in range(max_hops):
        frontier_edges = graph.filter(F.col("src").isin(list(beam_ids)))
        new_ids = [
            r["dst"]
            for r in frontier_edges.select("dst").distinct().collect()
            if r["dst"] not in visited
        ]
        if not new_ids:
            break
        scored = (
            points.filter(F.col(id_col).isin(new_ids))
            .select(F.col(id_col).alias("id"), dist_to_q(F.col(vec_col)).alias("dist"))
            .collect()
        )
        worst_beam = max(visited[i] for i in beam_ids)
        improved = False
        for r in scored:
            visited[r["id"]] = r["dist"]
            if r["dist"] < worst_beam:
                improved = True
        beam_ids = sorted(visited, key=lambda i: (visited[i], i))[:beam]
        if not improved:
            break

    best = sorted(visited.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    spark = points.sparkSession
    return spark.createDataFrame(
        [(int(i), float(d)) for i, d in best], f"{id_col} long, dist double"
    )
