"""Collection lifecycle: create/list/drop/copy-init, dim check, upsert LWW,
predicate deletes (SURVEY.md §2.7 U1-U4, D1-D4)."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.collections import CollectionCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return CollectionCatalog(spark, str(tmp_path / "collections"))


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "id long, embedding array<float>, text string, user_id long"
    )


def test_create_list_drop(catalog):
    catalog.create("a", dim=4)
    catalog.create("b", dim=8)
    assert catalog.list_collections() == ["a", "b"]
    # idempotent create-if-absent (/root/reference/insert.py:68-73)
    catalog.create("a", dim=4)
    assert catalog.meta("a").dim == 4
    assert catalog.drop("a") is True
    assert catalog.drop("a") is False
    assert catalog.list_collections() == ["b"]


def test_dim_validation(catalog, spark):
    catalog.create("c", dim=4)
    bad = _rows(spark, [(1, [1.0, 2.0], "x", 1)])
    with pytest.raises(ValueError, match="dim"):
        catalog.upsert("c", bad)


def test_upsert_last_write_wins(catalog, spark):
    catalog.create("c", dim=2)
    catalog.upsert("c", _rows(spark, [(1, [1.0, 1.0], "one", 7), (2, [2.0, 2.0], "two", 7)]))
    catalog.upsert("c", _rows(spark, [(1, [9.0, 9.0], "one-v2", 7)]))
    got = {r["id"]: r["text"] for r in catalog.read("c").collect()}
    assert got == {1: "one-v2", 2: "two"}


def test_upsert_lww_within_batch(catalog, spark):
    catalog.create("c", dim=2)
    catalog.upsert("c", _rows(spark, [(1, [1.0, 1.0], "v1", 7), (1, [2.0, 2.0], "v2", 7)]))
    got = catalog.read("c").collect()
    assert len(got) == 1 and got[0]["text"] == "v2"


def test_copy_init_then_grow(catalog, spark):
    """The ever-growing pattern (/root/reference/test_qdrant.py:128-133)."""
    catalog.create("base", dim=2)
    catalog.upsert("base", _rows(spark, [(1, [1.0, 1.0], "a", 1)]))
    catalog.create_from("grown", "base")
    catalog.upsert("grown", _rows(spark, [(2, [2.0, 2.0], "b", 1)]))
    assert catalog.read("grown").count() == 2
    assert catalog.read("base").count() == 1  # source untouched


def test_delete_where_and_by_ids(catalog, spark):
    catalog.create("c", dim=2)
    catalog.upsert("c", _rows(spark, [
        (1, [1.0, 1.0], "spark rocks", 1),
        (2, [2.0, 2.0], "plain text", 1),
        (3, [3.0, 3.0], "spark again", 2),
    ]))
    # delete-by-word within tenant (intended D2 semantics)
    n = catalog.delete_where("c", (F.col("user_id") == 1) & F.col("text").contains("spark"))
    assert n == 1
    assert {r["id"] for r in catalog.read("c").collect()} == {2, 3}
    n = catalog.delete_by_ids("c", [2, 3])
    assert n == 2
    assert catalog.read("c").count() == 0


def test_tenant_bucket_partitioning(catalog, spark, tmp_path):
    catalog.create("c", dim=2, n_buckets=4)
    catalog.upsert("c", _rows(spark, [(i, [1.0, 1.0], "t", i % 10) for i in range(40)]))
    df = catalog.read("c")
    assert "__bucket" in df.columns  # partition column present for pruning
    assert df.count() == 40
