"""Salted aggregation/join must equal their unsalted counterparts."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds 90% of rows — the hot-tenant shape
    rows = [(0, float(i)) for i in range(900)] + [(k, float(k)) for k in range(1, 101)]
    return spark.createDataFrame(rows, "k long, v double").cache()


def test_salted_agg_equals_plain(skewed):
    plain = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in skewed.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx")
        ).collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in salted_agg(
            skewed, ["k"], {"s": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")},
            n_salts=8,
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][1] == salted[k][1] and plain[k][2] == salted[k][2]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame([(k, f"name{k}") for k in range(0, 101)], "k long, name string")
    plain = sorted((r["k"], r["v"], r["name"]) for r in skewed.join(dim, "k").collect())
    salted = sorted((r["k"], r["v"], r["name"]) for r in salted_join(skewed, dim, "k", n_salts=8).collect())
    assert plain == salted
