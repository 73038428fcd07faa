"""kNN operator: numpy ground truth + the reference's property contracts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.knn import knn_batch, knn_search, search_response


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.select("vec_id", "embedding", "label").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    return ids, mat, labels


def _exact_topk(ids, mat, q, k, mask=None):
    d = np.linalg.norm(mat - np.array(q), axis=1)
    if mask is not None:
        d = np.where(mask, d, np.inf)
    order = np.lexsort((ids, d))
    return list(ids[order][:k])


def test_knn_matches_numpy(embeddings, emb_np):
    ids, mat, _ = emb_np
    q = [float(x) for x in mat[0]]
    got = knn_search(embeddings, q, k=10).select("vec_id").collect()
    want = _exact_topk(ids, mat, q, 10)
    assert [r["vec_id"] for r in got] == want


def test_knn_k_subset_property(embeddings, emb_np):
    """kNN(k) ⊆ kNN(k+5) — SURVEY.md §5 property test."""
    _, mat, _ = emb_np
    q = [float(x) for x in mat[3]]
    small = {r["vec_id"] for r in knn_search(embeddings, q, k=5).select("vec_id").collect()}
    big = {r["vec_id"] for r in knn_search(embeddings, q, k=10).select("vec_id").collect()}
    assert small <= big


def test_knn_filtered_respects_predicate(embeddings, emb_np):
    ids, mat, labels = emb_np
    q = [float(x) for x in mat[0]]
    got = knn_search(embeddings, q, k=5, filters=F.col("label") == 2).collect()
    assert all(r["label"] == 2 for r in got)
    want = _exact_topk(ids, mat, q, 5, mask=(labels == 2))
    assert [r["vec_id"] for r in got] == want


def test_tenant_isolation_empty(embeddings, emb_np):
    """The run_tests.py scenario (/root/reference/run_tests.py:21-28): a
    tenant with no points gets zero hits."""
    _, mat, _ = emb_np
    q = [float(x) for x in mat[0]]
    got = knn_search(embeddings, q, k=5, filters=F.col("label") == -999)
    assert got.count() == 0


def test_knn_batch_matches_per_query(embeddings, emb_np):
    ids, mat, _ = emb_np
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = knn_batch(embeddings.select("vec_id", "embedding"), queries, k=4)
    by_query = {}
    for r in got.collect():
        by_query.setdefault(r["query_id"], []).append(r["vec_id"])
    for qid in (0, 1, 2):
        q = [float(x) for x in mat[list(ids).index(qid)]]
        assert set(by_query[qid]) == set(_exact_topk(ids, mat, q, 4))


def test_search_response_shape(embeddings, emb_np):
    _, mat, _ = emb_np
    q = [float(x) for x in mat[0]]
    pts = embeddings.select(F.col("vec_id").alias("text_id"),
                            F.col("vec_id").cast("string").alias("text"), "embedding")
    hits = knn_search(pts, q, k=3)
    resp = search_response(hits)
    assert resp.columns == ["id", "string", "score"]
    rows = resp.collect()
    assert len(rows) == 3
    assert rows[0]["score"] <= rows[-1]["score"]


def test_facet_counts_one_pass_melt(spark, embeddings):
    """Counts match per-column groupBy truth; NULLs excluded; top-N by
    count with deterministic value tiebreak."""
    from vectordb_cloud_spark.operators.knn import facet_counts

    df = embeddings.withColumn(
        "parity", F.when(F.col("vec_id") % 2 == 0, "even").otherwise("odd")
    ).withColumn(
        "band",
        F.when(F.col("vec_id") < 100, F.lit(None).cast("string"))
        .otherwise((F.col("vec_id") % 3).cast("string")),
    )
    got = facet_counts(df, ["parity", "band"])
    rows = {(r["facet"], r["value"]): r["n"] for r in got.collect()}
    truth_parity = {r["parity"]: r["n"] for r in
                    df.groupBy("parity").agg(F.count("*").alias("n")).collect()}
    assert rows[("parity", "even")] == truth_parity["even"]
    assert rows[("parity", "odd")] == truth_parity["odd"]
    # NULL band rows (vec_id < 100) are excluded from the band facet
    assert sum(n for (f, v), n in rows.items() if f == "band") == \
        df.filter(F.col("band").isNotNull()).count()

    capped = facet_counts(df, ["band"], max_values_per_facet=2)
    assert capped.count() == 2


def test_search_with_facets_same_filter_scope(spark, embeddings):
    from vectordb_cloud_spark.operators.knn import search_with_facets

    qv = [float(x) for x in
          embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    hits, facets = search_with_facets(
        embeddings, qv, ["label"], k=5,
        filters=F.col("label").isin(1, 2), tiebreak="vec_id",
    )
    hrows = hits.collect()
    assert len(hrows) == 5 and all(r["label"] in (1, 2) for r in hrows)
    frows = facets.collect()
    assert {r["value"] for r in frows} == {"1", "2"}
    assert sum(r["n"] for r in frows) == \
        embeddings.filter(F.col("label").isin(1, 2)).count()


def test_recommend_average_vector_strategy(spark, embeddings):
    """Query = mean(pos) - mean(neg); examples excluded; parity with a
    hand-built numpy query vector."""
    import numpy as np

    from vectordb_cloud_spark.operators.knn import recommend

    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in embeddings.filter(F.col("vec_id") < 6).collect()}
    got = recommend(embeddings, positive_ids=[0, 1], negative_ids=[2],
                    k=5, tiebreak="vec_id").collect()
    ids = [r["vec_id"] for r in got]
    assert len(ids) == 5 and not {0, 1, 2} & set(ids)
    q = (vecs[0] + vecs[1]) / 2 - vecs[2]
    want = knn_search(
        embeddings, [float(x) for x in q], k=8, tiebreak="vec_id"
    ).filter(~F.col("vec_id").isin([0, 1, 2])).limit(5).collect()
    assert ids == [r["vec_id"] for r in want]


def test_recommend_validates_examples(spark, embeddings):
    from vectordb_cloud_spark.errors import PointNotFoundError
    from vectordb_cloud_spark.operators.knn import recommend

    with pytest.raises(ValueError, match="positive"):
        recommend(embeddings, positive_ids=[])
    with pytest.raises(ValueError, match="not found"):
        recommend(embeddings, positive_ids=[10_000_000]).collect()
    # missing examples carry the 404-mappable type (still a ValueError)
    with pytest.raises(PointNotFoundError):
        recommend(embeddings, positive_ids=[10_000_000]).collect()


def test_recommend_numpy_scalar_ids_are_ids(spark, embeddings):
    """A numpy integer id (np.int64 from a collected/numpy pipeline)
    exposes __array__ as a 0-d array — it must route to the ID branch,
    not crash the vector comprehension (ADVICE r12)."""
    import numpy as np

    from vectordb_cloud_spark.operators.knn import recommend

    got_py = recommend(embeddings, positive_ids=[0, 1], negative_ids=[2],
                       k=5, tiebreak="vec_id").collect()
    got_np = recommend(embeddings,
                       positive_ids=[np.int64(0), np.int64(1)],
                       negative_ids=[np.int64(2)],
                       k=5, tiebreak="vec_id").collect()
    assert [r["vec_id"] for r in got_np] == [r["vec_id"] for r in got_py]
    # 1-d numpy arrays still count as raw example vectors
    v = np.asarray(
        embeddings.filter(F.col("vec_id") == 0).first()["embedding"],
        dtype=np.float64)
    got_vec = recommend(embeddings, positive_ids=[v], k=3,
                        tiebreak="vec_id").collect()
    assert len(got_vec) == 3


def test_search_groups_dedups_flooding_group(spark, embeddings):
    """Groups ranked by their best hit; each contributes at most
    hits_per_group rows; plain top-k flooded by one label is spread."""
    from vectordb_cloud_spark.operators.knn import search_groups

    qv = [float(x) for x in
          embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = search_groups(embeddings, qv, group_by="label", k_groups=3,
                        hits_per_group=2, id_col="vec_id").collect()
    assert len(got) <= 6
    per_group = {}
    for r in got:
        per_group.setdefault(r["label"], []).append(r)
    assert len(per_group) == 3
    assert all(len(v) <= 2 for v in per_group.values())
    # group_rank 1 contains the global nearest hit (vec_id 0 itself)
    rank1 = [r for r in got if r["group_rank"] == 1]
    assert min(r["dist"] for r in rank1) < 1e-9
    # groups are ordered by their best distance
    best = {g: min(r["dist"] for r in rows) for g, rows in per_group.items()}
    ranks = {g: rows[0]["group_rank"] for g, rows in per_group.items()}
    ordered = sorted(best, key=lambda g: best[g])
    assert [ranks[g] for g in ordered] == [1, 2, 3]


def test_search_groups_with_lookup(spark, embeddings):
    """Qdrant group-by lookup: the group head's payload joins in from a
    second collection (prefixed lookup_), NULL where that collection has
    no point for the group value (VERDICT r8 missing #3)."""
    from vectordb_cloud_spark.operators.knn import search_groups

    qv = [float(x) for x in
          embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    base = search_groups(embeddings, qv, group_by="label", k_groups=3,
                         hits_per_group=2, id_col="vec_id").collect()
    labels = sorted({r["label"] for r in base})
    # lookup collection covers all but the last winning label
    lookup = spark.createDataFrame(
        [(int(l), f"name-{l}", l * 10) for l in labels[:-1]],
        "label long, name string, weight long",
    )
    got = search_groups(embeddings, qv, group_by="label", k_groups=3,
                        hits_per_group=2, id_col="vec_id",
                        with_lookup=lookup).collect()
    assert len(got) == len(base)
    assert {"lookup_name", "lookup_weight"} <= set(got[0].asDict())
    for r in got:
        if r["label"] in labels[:-1]:
            assert r["lookup_name"] == f"name-{r['label']}"
            assert r["lookup_weight"] == r["label"] * 10
        else:
            assert r["lookup_name"] is None and r["lookup_weight"] is None
    # explicit lookup_id_col with a differently-named id column
    lookup2 = lookup.withColumnRenamed("label", "pid")
    got2 = search_groups(embeddings, qv, group_by="label", k_groups=3,
                         hits_per_group=2, id_col="vec_id",
                         with_lookup=lookup2, lookup_id_col="pid").collect()
    assert [r["lookup_name"] for r in got2] == [r["lookup_name"] for r in got]


def test_distance_matrix_pairs_matches_numpy(spark, embeddings):
    import numpy as np

    from vectordb_cloud_spark.operators.knn import distance_matrix_pairs
    from vectordb_cloud_spark.sources.readers import random_sample

    got = distance_matrix_pairs(embeddings, sample_size=8, k=3, seed=7).collect()
    # ground truth over the SAME deterministic sample
    sample = random_sample(embeddings.select("vec_id", "embedding"), 8,
                           seed=7, id_col="vec_id").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in sample}
    want = {}
    for a, va in vecs.items():
        ds = sorted(
            (float(np.linalg.norm(va - vb)), b)
            for b, vb in vecs.items() if b != a
        )[:3]
        want[a] = [b for _, b in ds]
    by_a = {}
    for r in got:
        by_a.setdefault(r["id_a"], []).append((r["dist"], r["id_b"]))
    assert set(by_a) == set(want)
    for a, lst in by_a.items():
        assert [b for _, b in sorted(lst)] == want[a]
        for d, b in lst:
            assert d == pytest.approx(float(np.linalg.norm(vecs[a] - vecs[b])),
                                      rel=1e-9)


def test_distance_matrix_pairs_filters_and_guards(spark, embeddings):
    from pyspark.sql import functions as F

    from vectordb_cloud_spark.operators.knn import distance_matrix_pairs

    out = distance_matrix_pairs(embeddings, sample_size=6, k=2,
                                filters=F.col("label") == 3).collect()
    labels = {r["label"] for r in embeddings.filter(F.col("label") == 3).collect()}
    assert labels == {3}
    sampled = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    lbl = {r["vec_id"]: r["label"] for r in embeddings.collect()}
    assert all(lbl[i] == 3 for i in sampled)
    with pytest.raises(ValueError):
        distance_matrix_pairs(embeddings, sample_size=1)
    with pytest.raises(ValueError):
        distance_matrix_pairs(embeddings, metric="hamming")


def test_distance_matrix_offsets_is_the_pairs_twin(spark, embeddings):
    """Qdrant /points/search/matrix/offsets (r13): same computation as
    /matrix/pairs, CSR-style envelope — reconstructing triples from the
    offsets document must give exactly the pairs rows, row-major with
    nearest-first within a row."""
    from vectordb_cloud_spark.operators.knn import (distance_matrix_offsets,
                                                    distance_matrix_pairs)

    pairs = distance_matrix_pairs(embeddings, sample_size=8, k=3,
                                  seed=7).collect()
    off = distance_matrix_offsets(embeddings, sample_size=8, k=3, seed=7)
    assert set(off) == {"offsets_row", "offsets_col", "scores", "ids"}
    n = len(off["scores"])
    assert len(off["offsets_row"]) == len(off["offsets_col"]) == n
    assert off["ids"] == sorted(off["ids"])
    got = {(off["ids"][r], off["ids"][c], round(s, 9))
           for r, c, s in zip(off["offsets_row"], off["offsets_col"],
                              off["scores"])}
    want = {(p["id_a"], p["id_b"], round(p["dist"], 9)) for p in pairs}
    assert got == want
    # row-major, nearest-first within each row
    last = None
    for i in range(n):
        key = (off["offsets_row"][i], off["scores"][i],
               off["offsets_col"][i])
        if last is not None:
            assert key >= last
        last = key
    # cosine flips the within-row direction (similarity descending)
    offc = distance_matrix_offsets(embeddings, sample_size=6, k=2, seed=7,
                                   metric="cosine")
    rows = {}
    for i, r in enumerate(offc["offsets_row"]):
        rows.setdefault(r, []).append(offc["scores"][i])
    assert all(lst == sorted(lst, reverse=True) for lst in rows.values())


def test_knn_dot_and_manhattan_metrics(spark):
    """The remaining Qdrant Distance variants: DOT (similarity, descending)
    and MANHATTAN (L1, ascending) — numpy ground truth."""
    import numpy as np

    from vectordb_cloud_spark.operators.knn import knn_search

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 8)).astype("float32")
    q = rng.normal(size=8).astype("float32").tolist()
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    got_dot = [r["vec_id"] for r in
               knn_search(df, q, k=5, metric="dot", tiebreak="vec_id").collect()]
    want_dot = np.argsort(-(vecs.astype("float64") @ np.array(q, dtype="float64")))[:5]
    assert got_dot == list(want_dot)

    got_l1 = [r["vec_id"] for r in
              knn_search(df, q, k=5, metric="manhattan", tiebreak="vec_id").collect()]
    want_l1 = np.argsort(
        np.abs(vecs.astype("float64") - np.array(q, dtype="float64")).sum(1))[:5]
    assert got_l1 == list(want_l1)


def test_dot_metric_empty_and_nonfinite_query(spark):
    """An EMPTY query vector is rejected up front (every metric would
    otherwise emit NULL distances via zip_with null-padding, and the
    one-expr dot path crashed on withColumn(None) — r10 review); a
    non-finite component falls back to the Column builders and works."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    for metric in ("l2", "dot", "cosine", "manhattan"):
        with _pytest.raises(ValueError, match="non-empty"):
            knn_search(df, [], k=3, metric=metric)
    inf = knn_search(df, [float("inf"), 0.0], k=1, metric="dot",
                     tiebreak="vec_id").collect()
    assert len(inf) == 1


def test_restrict_to_ids_shared_primitive(spark):
    """The shared scan-restriction helper: IN pushdown for small integral
    sets (no Join node), semi join for strings, empty -> empty."""
    from pyspark.sql import functions as SF

    from vectordb_cloud_spark.operators.knn import restrict_to_ids

    pts = spark.range(100).select(SF.col("id"))
    cand = spark.createDataFrame([(3,), (7,)], "id long")
    out = restrict_to_ids(pts, cand)
    assert sorted(r["id"] for r in out.collect()) == [3, 7]
    assert "Join" not in out._jdf.queryExecution().executedPlan().toString()
    spts = spark.createDataFrame([("a",), ("b",)], "id string")
    scand = spark.createDataFrame([("b",)], "id string")
    out2 = restrict_to_ids(spts, scand)
    assert [r["id"] for r in out2.collect()] == ["b"]
    assert "Join" in out2._jdf.queryExecution().executedPlan().toString()
    assert restrict_to_ids(pts, cand.filter(SF.lit(False))).count() == 0


def test_recommend_best_score_strategy(spark):
    """Qdrant best_score: points nearer a negative than every positive rank
    below all clean points; clean points rank by nearest-positive distance."""
    import numpy as np

    from vectordb_cloud_spark.operators.knn import recommend

    pts = [
        (0, [0.0, 0.0]),   # positive example
        (1, [10.0, 10.0]), # negative example
        (2, [1.0, 0.0]),   # near positive
        (3, [2.0, 0.0]),   # further from positive, still clean
        (4, [9.0, 9.0]),   # near the negative -> pushed below all clean
        (5, [4.0, 4.0]),   # equidistant-ish but closer to positive
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts],
        "vec_id long, embedding array<float>",
    )
    got = [r["vec_id"] for r in
           recommend(df, [0], [1], k=4, strategy="best_score",
                     tiebreak="vec_id").collect()]
    assert got == [2, 3, 5, 4]  # 4 is last despite being "close" to examples
    # no negatives: plain nearest-to-best-positive
    got2 = [r["vec_id"] for r in
            recommend(df, [0, 1], k=3, strategy="best_score",
                      tiebreak="vec_id").collect()]
    assert got2 == [2, 4, 3]  # 4 is nearest to positive example 1 now
    with pytest.raises(ValueError, match="strategy"):
        recommend(df, [0], strategy="centroid")


def test_recommend_best_score_orders_multiple_contaminated(spark):
    """Regression (review finding): the contaminated-point ordering must
    hold for MULTIPLE contaminated points — a 1e18-offset float key would
    collapse their sub-ordering (ULP at 1e18 is ~128)."""
    from vectordb_cloud_spark.operators.knn import recommend

    pts = [
        (0, [0.0, 0.0]),    # positive
        (1, [100.0, 100.0]),  # negative
        (2, [1.0, 0.0]),    # clean
        (3, [99.0, 99.0]),  # very negative-like
        (4, [80.0, 80.0]),  # negative-like, less so
        (5, [60.0, 60.0]),  # closer to negative than positive, least so
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts],
        "vec_id long, embedding array<float>",
    )
    got = [r["vec_id"] for r in
           recommend(df, [0], [1], k=5, strategy="best_score",
                     tiebreak="vec_id").collect()]
    # clean first; contaminated ordered LEAST negative-like first
    assert got == [2, 5, 4, 3]
