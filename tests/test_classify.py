"""label_centroids (Summarizer vector mean) and nearest_centroid argmin.

The centroid aggregate is the one op where a naive shape (posexplode per
dim) silently multiplies pre-combine rows by the vector dim — these tests
pin the vectorized shape: exact means, no Generate/explode in the plan,
and the dim-1024 case that made the old shape dominate stage cost.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.classify import label_centroids, nearest_centroid


def test_label_centroids_match_numpy(spark, embeddings):
    cents = {r["label"]: r["centroid"] for r in
             label_centroids(embeddings, "label", "embedding").collect()}
    pdf = embeddings.select("label", "embedding").toPandas()
    for label, grp in pdf.groupby("label"):
        want = np.mean(
            np.stack([np.asarray(e, dtype="float64") for e in grp["embedding"]]), axis=0
        )
        got = np.asarray(cents[label])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_label_centroids_plan_has_no_explode(spark, embeddings):
    plan = label_centroids(embeddings)._jdf.queryExecution().executedPlan().toString()
    # the D x row-count blowup shape would show a Generate(posexplode) node
    assert "Generate" not in plan and "posexplode" not in plan.lower()


def test_label_centroids_dim_1024(spark):
    # 2k rows x 1024 dims, generated JVM-side: the case where the explode
    # shape produced 2M pre-combine rows; Summarizer keeps it at 2k
    pts = (
        spark.range(2000)
        .withColumn("label", (F.col("id") % 4).cast("int"))
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(1023)),
                lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0),
            ).cast("array<float>"),
        )
    )
    out = label_centroids(pts, "label", "embedding").collect()
    assert len(out) == 4
    assert all(len(r["centroid"]) == 1024 for r in out)
    # each dim is bounded by the value range; means must be strictly inside
    flat = [v for r in out for v in r["centroid"]]
    assert all(-1.0 < v < 1.0 for v in flat)


def test_nearest_centroid_assigns_own_label_on_separated_clusters(spark):
    # two well-separated clusters: every member classifies to its own label
    rows = [(i, 0, [10.0 + (i % 3) * 0.1, 0.0]) for i in range(6)] + [
        (10 + i, 1, [-10.0 - (i % 3) * 0.1, 1.0]) for i in range(6)
    ]
    pts = spark.createDataFrame(rows, "id long, label int, embedding array<double>")
    cents = label_centroids(pts, "label", "embedding")
    out = nearest_centroid(pts, cents, item_id="id", item_vec="embedding",
                           centroid_label="label", centroid_vec="centroid")
    got = {r["id"]: r["label"] for r in out.collect()}
    for i in range(6):
        assert got[i] == 0
        assert got[10 + i] == 1
