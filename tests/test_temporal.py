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


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------

@pytest.fixture()
def changelog(spark):
    rows = [
        # key, ts, tier, license
        (1, 10, "low", "mit"),
        (1, 20, "low", "mit"),      # no change -> collapses
        (1, 30, "high", "mit"),     # tier change
        (1, 40, "high", "apache"),  # license change
        (2, 15, "mid", None),       # null attr
        (2, 25, "mid", "bsd"),      # null -> value IS a change
        (3, 5, "low", "mit"),       # single-version key
    ]
    return spark.createDataFrame(
        rows, "source_id long, ts long, tier string, license string"
    )


def test_scd2_snapshot_versions_and_intervals(changelog):
    from vectordb_cloud_spark.operators.temporal import scd2_snapshot

    dim = scd2_snapshot(changelog, "source_id", "ts", ["tier", "license"])
    rows = {(r["source_id"], r["valid_from"]): r for r in dim.collect()}
    assert len(rows) == 6  # 3 + 2 + 1 versions, the no-op row collapsed
    assert rows[(1, 10)]["valid_to"] == 30 and not rows[(1, 10)]["is_current"]
    assert rows[(1, 30)]["valid_to"] == 40
    assert rows[(1, 40)]["valid_to"] is None and rows[(1, 40)]["is_current"]
    # null -> value transition is a real version boundary
    assert rows[(2, 15)]["valid_to"] == 25
    assert rows[(3, 5)]["is_current"]


def test_scd2_apply_changes_rebuilds_touched_keys_only(spark, changelog):
    from vectordb_cloud_spark.operators.temporal import (
        scd2_apply_changes,
        scd2_snapshot,
    )

    dim = scd2_snapshot(changelog, "source_id", "ts", ["tier", "license"])
    batch = spark.createDataFrame(
        [
            (1, 50, "high", "gpl"),   # append-style change
            (2, 18, "mid", "bsd"),    # LATE change inside key-2 history
            (4, 60, "new", "mit"),    # brand-new key
        ],
        "source_id long, ts long, tier string, license string",
    )
    out = scd2_apply_changes(dim, batch, "source_id", "ts", ["tier", "license"])
    # equivalent to rebuilding from the full merged changelog
    truth = scd2_snapshot(
        changelog.unionByName(batch), "source_id", "ts", ["tier", "license"]
    )
    from collections import Counter

    got = Counter(map(tuple, out.collect()))
    assert got == Counter(map(tuple, truth.collect()))
    # untouched key 3 survived verbatim
    assert any(r[0] == 3 for r in got)


def test_scd2_apply_identical_change_is_noop(spark, changelog):
    from vectordb_cloud_spark.operators.temporal import (
        scd2_apply_changes,
        scd2_snapshot,
    )

    dim = scd2_snapshot(changelog, "source_id", "ts", ["tier", "license"])
    batch = spark.createDataFrame(
        [(1, 45, "high", "apache")],  # same attrs as current version of key 1
        "source_id long, ts long, tier string, license string",
    )
    out = scd2_apply_changes(dim, batch, "source_id", "ts", ["tier", "license"])
    from collections import Counter

    assert Counter(map(tuple, out.collect())) == Counter(map(tuple, dim.collect()))
