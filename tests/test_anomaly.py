"""Outlier detection: planted anomalies must flag; clean data must not;
the robust estimator must survive contamination that breaks the z-score."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.anomaly import robust_outliers, zscore_outliers


@pytest.fixture(scope="module")
def readings(spark):
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 9, 10, 11, 500]]
    rows += [("b", float(v)) for v in [5, 5, 5, 5, 5]]  # zero variance
    return spark.createDataFrame(rows, "grp string, value double")


def test_zscore_flags_planted_outlier(readings):
    out = zscore_outliers(readings, ["grp"], threshold=3.0)
    flagged = [(r["grp"], r["value"]) for r in out.filter("is_outlier").collect()]
    assert flagged == [("a", 500.0)]
    # zero-variance group produces no flags and finite scores
    b = out.filter(F.col("grp") == "b").collect()
    assert all(not r["is_outlier"] and r["zscore"] == 0.0 for r in b)


def test_robust_survives_heavy_contamination(spark):
    """30% contamination: the z-score mean/std get dragged (misses some
    planted outliers), median/MAD still separates them cleanly."""
    base = [10.0 + (i % 5) * 0.5 for i in range(20)]
    outliers = [400.0, 450.0, 500.0, 550.0, 600.0, 650.0, 700.0, 750.0]
    df = spark.createDataFrame(
        [("g", v) for v in base + outliers], "grp string, value double"
    )
    robust = robust_outliers(df, ["grp"], threshold=3.5)
    r_flagged = {r["value"] for r in robust.filter("is_outlier").collect()}
    assert r_flagged == set(outliers)  # all planted, nothing clean

    z = zscore_outliers(df, ["grp"], threshold=3.0)
    z_flagged = {r["value"] for r in z.filter("is_outlier").collect()}
    assert z_flagged < set(outliers)  # contamination inflates std -> misses


def test_outliers_on_events_fixture(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "value")
    out = robust_outliers(ev, ["event_type"])
    assert out.count() == ev.count()  # annotation, not filtering
    assert out.filter("is_outlier").count() < ev.count() * 0.1
