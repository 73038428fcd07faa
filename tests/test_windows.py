"""Window-function surface beyond row_number: rank semantics under ties,
ntile bucketing, cumulative distribution, lead/lag frames — verified against
hand computation on a fixed micro-frame."""

import pytest
from pyspark.sql import Window, functions as F


@pytest.fixture(scope="module")
def scores(spark):
    rows = [("a", 10), ("a", 20), ("a", 20), ("a", 40), ("b", 5), ("b", 5)]
    return spark.createDataFrame(rows, "grp string, v int")


def test_rank_vs_dense_rank_under_ties(scores):
    w = Window.partitionBy("grp").orderBy("v")
    got = scores.select(
        "grp", "v",
        F.rank().over(w).alias("r"),
        F.dense_rank().over(w).alias("dr"),
    ).collect()
    a = sorted([(r["v"], r["r"], r["dr"]) for r in got if r["grp"] == "a"])
    assert a == [(10, 1, 1), (20, 2, 2), (20, 2, 2), (40, 4, 3)]  # gap vs no-gap
    b = sorted([(r["v"], r["r"], r["dr"]) for r in got if r["grp"] == "b"])
    assert b == [(5, 1, 1), (5, 1, 1)]


def test_ntile_and_cume_dist(scores):
    w = Window.partitionBy("grp").orderBy("v")
    got = [
        (r["v"], r["nt"], r["cd"])
        for r in scores.filter(F.col("grp") == "a")
        .select("v", F.ntile(2).over(w).alias("nt"), F.cume_dist().over(w).alias("cd"))
        .collect()
    ]
    got.sort()
    assert [g[1] for g in got] == [1, 1, 2, 2]  # 4 rows into 2 tiles
    assert got[0][2] == 0.25 and got[1][2] == 0.75 and got[2][2] == 0.75 and got[3][2] == 1.0


def test_lead_lag_and_running_frames(scores):
    w = Window.partitionBy("grp").orderBy("v", "grp")
    run = Window.partitionBy("grp").orderBy("v", "grp").rowsBetween(
        Window.unboundedPreceding, 0
    )
    got = [
        (r["v"], r["prev"], r["nxt"], r["running"])
        for r in scores.filter(F.col("grp") == "a")
        .select(
            "v",
            F.lag("v").over(w).alias("prev"),
            F.lead("v").over(w).alias("nxt"),
            F.sum("v").over(run).alias("running"),
        )
        .collect()
    ]
    got.sort(key=lambda t: (t[0], t[3]))
    assert got == [
        (10, None, 20, 10),
        (20, 10, 20, 30),
        (20, 20, 40, 50),
        (40, 20, None, 90),
    ]
