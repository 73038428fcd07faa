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


def test_lit_double_array_exact_roundtrip(spark):
    """lit_double_array builds the literal via one SQL-parsed F.expr —
    every double must round-trip BIT-EXACTLY vs the element-wise F.lit
    path (oracle hashes depend on it). Tricky values: shortest-repr
    decimals, subnormals, huge/tiny exponents, negatives, ints."""
    import random

    from vectordb_cloud_spark.functions.vector import (lit_double_array,
                                                       lit_long_array)

    rng = random.Random(7)
    tricky = [0.1, -0.1, 1/3, 2/3, 1e-300, -1e300, 5e-324, 1.7976931348623157e308,
              0.0, -0.0, 1.0, -2.5e17, 3.141592653589793, 1e16 + 2,
              6.103515625e-05, -1.1754943508222875e-38]
    tricky += [rng.uniform(-1, 1) for _ in range(64)]
    df = spark.range(1)
    got = df.select(
        lit_double_array(tricky).alias("a"),
        F.array(*[F.lit(float(v)) for v in tricky]).alias("b"),
    ).collect()[0]
    import struct
    for x, y, want in zip(got["a"], got["b"], tricky):
        assert struct.pack("d", x) == struct.pack("d", y) == struct.pack("d", float(want))

    # non-finite falls back to the element-wise path, same values
    nf = [float("inf"), float("-inf"), 1.0]
    row = df.select(lit_double_array(nf).alias("a")).collect()[0]["a"]
    assert row == nf
    # nan compares unequal; check via isnan positionally
    row = df.select(lit_double_array([float("nan")]).alias("a")).collect()[0]["a"]
    assert math.isnan(row[0])

    longs = [0, 1, -1, 2**62, -(2**62), 42]
    row = df.select(lit_long_array(longs).alias("a")).collect()[0]["a"]
    assert row == longs
