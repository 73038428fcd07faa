"""Recall@k measurement for every ANN family, as a driver-visible artifact.

Recall gates have lived in tests since round 3 (tests/test_ann.py,
test_pq.py, test_graph_ann.py), but the per-round driver artifacts
(BENCH_r{N}.json) only recorded latency — an ANN change that got faster by
silently dropping recall would pass every gate the driver sees (VERDICT r5
item 6). ``ann_recall_report`` closes that hole: it measures recall@k
against exact brute force for each approximate family, averaged over
``n_queries`` fixture vectors, using the SAME index artifacts and
parameters the registry queries use (queries.py ``_lsh_model`` /
``_ivf_index`` / ``_pq_index``), so the number describes the exact
configuration being benchmarked.

Consumed by bench.py (emits a ``recall`` dict next to ``queries`` in the
one-line JSON), tools/recall_check.py (writes RECALL.md), and
tests/test_recall_report.py (asserts floors, so a recall regression fails
CI before it ever reaches a bench artifact).

Reference parity note: the reference delegates search quality entirely to
Qdrant's HNSW defaults (/root/reference/search.py:43) and never measures
recall; measuring it is part of owning the index families ourselves.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Registry-matching knobs (see queries.py ann_ivf_topk / pq_adc_topk):
IVF_K_CENTROIDS = 192  # r9: the real pruning geometry (VERDICT r8 #3) — k≈4√n on this near-uniform fixture (finer lists raise recall at a FIXED scan fraction: k=64→0.74, 128→0.79, 192→0.87 at 25% scanned, 32 queries, sf0.1)
IVF_NPROBE = 48  # k/4: 75% of partitions pruned at recall 0.872 — vs r8's k=8/nprobe=4, which hit 0.812 only by scanning HALF the index
GRAPH_DEGREE = 12  # r7: degree 8 -> 12 measured +0.14 recall at identical build time (denser graph = fewer dead-end hops)
GRAPH_BEAM = 48  # beam width is the recall dial: 32->0.75, 48->0.94 at sf0.1 with medoid entries (per-hop cost is scheduling, not rows)
GRAPH_MAX_HOPS = 4
GRAPH_ENTRIES = 16  # medoid entry points (graph_entry_points) — r7: +0.09 recall over smallest-id seeds at the same beam
BQ_OVERSAMPLE = 48  # 64-dim codes are coarse: rescore recall 16->0.73, 32->0.85, 48->0.94 at sf0.1 (Qdrant documents the same oversample-for-BQ practice)
PQ_RERANK_OVERSAMPLE = 4  # with M=16/K=256 codebooks: 0.988 at sf0.1


def ann_recall_report(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_queries: int = 8,
    graph=None,
    entry_ids: list[int] | None = None,
) -> dict[str, float]:
    """Average recall@``k`` vs exact for each ANN family.

    Query vectors are the first ``n_queries`` ``vec_id``s of the fixture
    embeddings table — deterministic, so round-over-round numbers are
    comparable. ``graph`` lets bench.py pass the adjacency DataFrame it
    already built; when None a graph is built here with the bench
    parameters.

    Returns ``{"lsh_knn": r, "ann_ivf_topk": r, "pq_adc_topk": r,
    "ann_graph_topk": r, "sq_adc_topk": r, "bq_hamming_rescore_topk": r,
    "pq_adc_rerank_topk": r}``
    with each r in [0, 1], rounded to 3 digits.
    """
    from vectordb_cloud_spark import queries as qmod
    from vectordb_cloud_spark.operators.ann import (
        brute_force_topk,
        ivf_search,
        lsh_knn,
        recall_at_k,
    )
    from vectordb_cloud_spark.operators.graph_ann import (
        graph_beam_search,
        graph_entry_points,
        knn_graph_build,
    )
    from vectordb_cloud_spark.operators.pq import pq_search, pq_search_rerank
    from vectordb_cloud_spark.operators.sq import (
        bq_encode,
        bq_search,
        bq_train,
        sq_encode,
        sq_search,
        sq_train,
    )

    emb = qmod._t(spark, sf_dir, "embeddings").cache()
    qrows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    queries = [[float(x) for x in r["embedding"]] for r in qrows]

    lsh_model = qmod._lsh_model(spark, sf_dir, qmod._LSH_BL,
                                qmod._LSH_G * qmod._LSH_TABLES)
    centers, ivf_path = qmod._ivf_index(spark, sf_dir,
                                        k_centroids=IVF_K_CENTROIDS)
    ivf_df = spark.read.parquet(ivf_path)  # list the layout ONCE
    codebooks, pq_path = qmod._pq_index(spark, sf_dir)
    encoded = spark.read.parquet(pq_path).cache()
    if graph is None:
        graph = knn_graph_build(emb, degree=GRAPH_DEGREE, refine_rounds=1)
    graph = graph.cache()
    if entry_ids is None:
        entry_ids = graph_entry_points(emb, n_entry=GRAPH_ENTRIES)
    # the sharded-build variant of the same family, with the shard term
    # FORCED on (max_cells=8 -> S>=2 at this fixture size; at defaults it
    # only engages past ~520k rows) — measures the r8 scale path's recall
    # on the real corpus, same beam parameters and medoid seeds
    from vectordb_cloud_spark.operators.graph_ann import knn_graph_build_sharded

    graph_sharded = knn_graph_build_sharded(
        emb, degree=GRAPH_DEGREE, refine_rounds=2, max_cells=8)
    mins, maxs = sq_train(emb)
    sq_codes = sq_encode(emb, mins, maxs).select("vec_id", "sq_code").cache()
    thresholds = bq_train(emb)
    bq_codes = bq_encode(emb, thresholds).select("vec_id", "bq_code").cache()

    sums = {"lsh_knn": 0.0, "ann_ivf_topk": 0.0, "pq_adc_topk": 0.0,
            "ann_graph_topk": 0.0, "ann_graph_sharded_build": 0.0,
            "sq_adc_topk": 0.0,
            "bq_hamming_rescore_topk": 0.0, "pq_adc_rerank_topk": 0.0}
    for qv in queries:
        exact = brute_force_topk(emb, qv, k=k)
        sums["lsh_knn"] += recall_at_k(
            lsh_knn(lsh_model, emb, qv, k=k), exact, "vec_id")
        sums["ann_ivf_topk"] += recall_at_k(
            ivf_search(ivf_df, centers, qv, k=k,
                       nprobe=IVF_NPROBE, tiebreak="vec_id"),
            exact, "vec_id")
        sums["pq_adc_topk"] += recall_at_k(
            pq_search(encoded, codebooks, qv, k=k, tiebreak="vec_id"),
            exact, "vec_id")
        sums["pq_adc_rerank_topk"] += recall_at_k(
            pq_search_rerank(encoded, codebooks, emb, qv, k=k,
                             oversample=PQ_RERANK_OVERSAMPLE),
            exact, "vec_id")
        sums["ann_graph_topk"] += recall_at_k(
            graph_beam_search(emb, graph, qv, k=k, beam=GRAPH_BEAM,
                              max_hops=GRAPH_MAX_HOPS, entry_ids=entry_ids),
            exact, "vec_id")
        sums["ann_graph_sharded_build"] += recall_at_k(
            graph_beam_search(emb, graph_sharded, qv, k=k, beam=GRAPH_BEAM,
                              max_hops=GRAPH_MAX_HOPS, entry_ids=entry_ids),
            exact, "vec_id")
        sums["sq_adc_topk"] += recall_at_k(
            sq_search(sq_codes, mins, maxs, qv, k=k, tiebreak="vec_id"),
            exact, "vec_id")
        sums["bq_hamming_rescore_topk"] += recall_at_k(
            bq_search(bq_codes, emb, thresholds, qv, k=k,
                      oversample=BQ_OVERSAMPLE, tiebreak="vec_id"),
            exact, "vec_id")
    emb.unpersist()
    encoded.unpersist()
    graph.unpersist()
    sq_codes.unpersist()
    bq_codes.unpersist()
    return {name: round(s / len(queries), 3) for name, s in sums.items()}
