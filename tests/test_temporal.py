"""As-of and range joins vs straightforward ground truth."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    trades = spark.createDataFrame(
        [(1, "A", s(10)), (2, "A", s(20)), (3, "B", s(15)), (4, "B", s(5))],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", s(8), 100.0), ("A", s(15), 101.0), ("A", s(20), 102.0), ("B", s(12), 50.0)],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_inclusive(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts",
                    right_cols=["px"])
    got = {r["trade_id"]: r["px_right"] for r in out.collect()}
    # trade1@10 -> quote@8 (100); trade2@20 -> quote@20 inclusive (102);
    # trade3@15 -> quote@12 (50); trade4@5 -> no earlier quote
    assert got == {1: 100.0, 2: 102.0, 3: 50.0, 4: None}


def test_asof_preserves_left_rows(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts",
                    right_cols=["px"])
    assert out.count() == trades.count()


def test_range_join_matches_theta(spark):
    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 200, 7)], "id long, v double"
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 50.0, 120.0), ("c", 119.0, 200.0)],
        "name string, lo double, hi double",
    )
    got = range_join(pts, ranges, "v", "lo", "hi", bucket_width=13.0)
    want = pts.join(ranges, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
    g = sorted((r["id"], r["name"]) for r in got.collect())
    w = sorted((r["id"], r["name"]) for r in want.collect())
    assert g == w and len(g) > 0
    # overlapping ranges produce both matches
    assert (119, "b") in g and (119, "c") in g
