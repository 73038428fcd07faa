"""HLL sketch rollups: daily sketches must re-aggregate to the all-time
distinct count within HLL error bounds — without touching raw events."""

from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.sketches import (
    merged_distinct_estimate,
    user_count_sketches,
)


def _events(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def test_daily_sketches_merge_to_alltime_distinct(spark, sf_dir):
    ev = _events(spark, sf_dir)
    exact = ev.select("user_id").distinct().count()
    daily = user_count_sketches(ev, "day").cache()
    assert daily.count() > 1  # genuinely multiple buckets being merged
    est = merged_distinct_estimate(daily).first()["approx_distinct"]
    assert abs(est - exact) / exact < 0.05  # lgk=12 ≈ 1.6% typical error
    # event counts re-aggregate exactly
    assert merged_distinct_estimate(daily).first()["n_events"] == ev.count()


def test_grouped_sketch_rollup_matches_exact_per_group(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = user_count_sketches(ev, "day", group_cols=["event_type"])
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in merged_distinct_estimate(daily, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n")
        ).collect()
    }
    assert merged.keys() == exact.keys()
    for k, v in exact.items():
        assert abs(merged[k] - v) / v < 0.05
