"""Vector column expressions vs numpy ground truth."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_distance_to,
    l2_norm,
)


@pytest.fixture(scope="module")
def pairs(spark):
    rng = np.random.default_rng(7)
    rows = [
        ([float(x) for x in rng.normal(size=8)], [float(x) for x in rng.normal(size=8)])
        for _ in range(20)
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    return rows, df


def test_l2_distance_matches_numpy(pairs):
    rows, df = pairs
    got = df.select(l2_distance("a", "b").alias("d")).collect()
    for (a, b), r in zip(rows, got):
        assert math.isclose(r["d"], float(np.linalg.norm(np.array(a) - np.array(b))), rel_tol=1e-12)


def test_dot_and_norm_match_numpy(pairs):
    rows, df = pairs
    got = df.select(dot_product("a", "b").alias("d"), l2_norm("a").alias("n")).collect()
    for (a, b), r in zip(rows, got):
        assert math.isclose(r["d"], float(np.dot(a, b)), rel_tol=1e-12)
        assert math.isclose(r["n"], float(np.linalg.norm(a)), rel_tol=1e-12)


def test_cosine_matches_numpy(pairs):
    rows, df = pairs
    got = df.select(cosine_similarity("a", "b").alias("c")).collect()
    for (a, b), r in zip(rows, got):
        a, b = np.array(a), np.array(b)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(r["c"], want, rel_tol=1e-12)


def test_l2_distance_to_literal(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "v array<double>")
    got = df.select(l2_distance_to(F.col("v"), [0.0, 0.0]).alias("d")).collect()[0]["d"]
    assert math.isclose(got, 5.0)
