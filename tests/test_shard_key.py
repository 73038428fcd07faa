"""Custom shard keys (Qdrant shard_key_selector): the __bucket partitioning
hashes a configurable payload column; read_for_shard derives the bucket
predicate driver-side so the scan prunes partition dirs."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.collections import CollectionCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return CollectionCatalog(spark, str(tmp_path / "collections"))


def _rows(spark, n=200):
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.array(F.lit(1.0), F.lit(2.0)).cast("array<float>").alias("embedding"),
            F.concat(F.lit("doc "), F.col("id")).alias("text"),
            (F.col("id") % 3).alias("user_id"),
            F.concat(F.lit("site"), F.col("id") % 7).alias("site"),
        )
    )


def test_string_shard_key_prunes_and_reads(catalog, spark):
    catalog.create("c", dim=2, shard_key="site", n_buckets=8)
    catalog.upsert("c", _rows(spark))
    got = catalog.read_for_shard("c", "site3")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan  # derived partition predicate present
    assert got.count() == _rows(spark).filter(F.col("site") == "site3").count()
    assert all(r["site"] == "site3" for r in got.collect())
    assert catalog.collection_info("c")["config"]["params"]["shard_key"] == "site"


def test_custom_shard_upsert_lww_and_moving_key(catalog, spark):
    catalog.create("c", dim=2, shard_key="site", n_buckets=8)
    catalog.upsert("c", _rows(spark, n=50))
    # replace id 10 with a DIFFERENT shard key value: the old row (in
    # another bucket) must still be evicted
    patch = _rows(spark, n=50).filter(F.col("id") == 10).withColumn(
        "site", F.lit("siteZ")).withColumn("text", F.lit("moved"))
    catalog.upsert("c", patch)
    rows = catalog.read("c").filter(F.col("id") == 10).collect()
    assert len(rows) == 1 and rows[0]["site"] == "siteZ"
    assert rows[0]["text"] == "moved"
    assert catalog.read("c").count() == 50
    # shard-pruned read finds it under the new key
    assert [r["id"] for r in catalog.read_for_shard("c", "siteZ").collect()] == [10]


def test_default_shard_key_unchanged(catalog, spark):
    catalog.create("c", dim=2)
    catalog.upsert("c", _rows(spark, n=30))
    assert catalog.meta("c").shard_key == "user_id"
    got = catalog.read_for_user("c", 1)
    assert got.count() == 10
    with pytest.raises(ValueError, match="reserved"):
        catalog.create("bad", dim=2, shard_key="embedding")
