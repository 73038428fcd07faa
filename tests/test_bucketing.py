"""Bucketed co-located joins: two tables bucketed on the join key must
sort-merge join with ZERO exchanges (the write-once/join-many layout that
removes the per-query shuffle at 100 TB)."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.plans.inspect import count_exchanges, explain_str
from vectordb_cloud_spark.sources.bucketed import colocated_join, write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed_table(
        orders.withColumn("custkey", F.col("o_custkey")),
        "b_orders", str(tmp_path / "b_orders"), "custkey", n_buckets=8,
    )
    write_bucketed_table(
        customer.withColumn("custkey", F.col("c_custkey")),
        "b_customer", str(tmp_path / "b_customer"), "custkey", n_buckets=8,
    )
    yield orders, customer
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_colocated_join_has_zero_exchanges(spark, bucketed_pair):
    joined = colocated_join(spark, "b_orders", "b_customer", on="custkey")
    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    assert count_exchanges(joined) == 0, plan
    assert "Exchange" not in plan


def test_colocated_join_matches_plain_join(spark, bucketed_pair):
    orders, customer = bucketed_pair
    got = colocated_join(spark, "b_orders", "b_customer", on="custkey").count()
    expected = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    assert got == expected > 0


def test_unbucketed_same_join_does_exchange(spark, bucketed_pair):
    """Control: the identical join over raw parquet (broadcast disabled via
    the merge hint on non-bucketed inputs) needs exchanges — proving the
    zero-exchange plan above comes from the bucket layout, not the hint."""
    orders, customer = bucketed_pair
    left = orders.withColumn("custkey", F.col("o_custkey")).hint("merge")
    right = customer.withColumn("custkey", F.col("c_custkey"))
    joined = left.join(right, on="custkey")
    assert count_exchanges(joined) >= 2
