"""Points batch operations (Qdrant POST /collections/{c}/points/batch) and
vector-level updates (PUT /points/vectors, POST /points/vectors/delete).
The whole batch composes into one DataFrame lineage and commits as ONE MVCC
version: ordering (later ops see earlier ops' effects) and atomicity (a bad
op leaves the collection untouched) are both asserted."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.collections import CollectionCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return CollectionCatalog(spark, str(tmp_path / "collections"))


def _seed(catalog, spark, vectors=None):
    catalog.create("c", dim=2, vectors=vectors)
    rows = [
        {"id": i, "embedding": [float(i), 0.0], "text": f"doc {i}",
         "user_id": i % 2, "site": "s", "lang": "en", "text_id": i}
        for i in range(6)
    ]
    catalog.update_batch("c", [{"upsert": {"points": rows}}])
    return rows


def test_batch_ordered_ops_single_commit(catalog, spark):
    _seed(catalog, spark)
    v0 = catalog.meta("c").version
    res = catalog.update_batch("c", [
        {"upsert": {"points": [
            {"id": 10, "embedding": [9.0, 9.0], "text": "new", "user_id": 1,
             "site": "s", "lang": "en", "text_id": 10}]}},
        {"set_payload": {"payload": {"lang": "de"}, "points": [10, 3]}},
        {"delete": {"points": [0]}},
        # later op sees the earlier set_payload: delete by the NEW value
        {"delete": {"filter": {"must": [{"key": "lang", "match": {"value": "de"}},
                                        {"key": "id", "match": {"value": 3}}]}}},
    ])
    assert res["result"] == {"operations": 4, "status": "completed"}
    assert catalog.meta("c").version == v0 + 1  # ONE commit for 4 ops
    got = {r["id"]: r for r in catalog.read("c").collect()}
    assert sorted(got) == [1, 2, 4, 5, 10]
    assert got[10]["lang"] == "de" and got[10]["text"] == "new"


def test_batch_upsert_lww_and_dict_row_coercion(catalog, spark):
    _seed(catalog, spark)
    catalog.update_batch("c", [{"upsert": {"points": [
        {"id": 1, "embedding": [5.0, 5.0], "text": "first", "user_id": 1,
         "site": "s", "lang": "en", "text_id": 1},
        {"id": 1, "embedding": [7.0, 7.0], "text": "last", "user_id": 1,
         "site": "s", "lang": "en", "text_id": 1},
    ]}}])
    row = catalog.read("c").filter(F.col("id") == 1).first()
    assert row["text"] == "last"
    assert [round(x) for x in row["embedding"]] == [7, 7]  # cast to array<float>


def test_batch_atomic_on_failure(catalog, spark):
    _seed(catalog, spark)
    v0 = catalog.meta("c").version
    n0 = catalog.read("c").count()
    with pytest.raises(ValueError, match="dim mismatch"):
        catalog.update_batch("c", [
            {"delete": {"points": [0, 1, 2]}},
            {"upsert": {"points": [
                {"id": 99, "embedding": [1.0, 2.0, 3.0], "text": "bad",
                 "user_id": 0, "site": "s", "lang": "en", "text_id": 99}]}},
        ])
    # nothing committed: the valid eager delete didn't land either
    assert catalog.meta("c").version == v0
    assert catalog.read("c").count() == n0
    with pytest.raises(ValueError, match="unknown batch operation"):
        catalog.update_batch("c", [{"replace_all": {}}])
    with pytest.raises(ValueError, match="reserved"):
        catalog.update_batch("c", [
            {"set_payload": {"payload": {"embedding": None}, "points": [1]}}])


def test_delete_payload_nulls_only_selected(catalog, spark):
    _seed(catalog, spark)
    catalog.update_batch("c", [
        {"delete_payload": {"keys": ["site", "lang"], "points": [2, 4]}}])
    rows = {r["id"]: r for r in catalog.read("c").collect()}
    assert rows[2]["site"] is None and rows[2]["lang"] is None
    assert rows[3]["site"] == "s" and rows[3]["lang"] == "en"


def test_update_vectors_patches_only_vectors(catalog, spark):
    _seed(catalog, spark)
    res = catalog.update_vectors("c", [
        {"id": 2, "embedding": [8.5, 8.5]},
        {"id": 77, "embedding": [1.0, 1.0]},  # absent id: ignored
    ])
    assert res["result"]["status"] == "completed"
    rows = {r["id"]: r for r in catalog.read("c").collect()}
    assert [round(x, 1) for x in rows[2]["embedding"]] == [8.5, 8.5]
    assert rows[2]["text"] == "doc 2"  # payload untouched
    assert [round(x) for x in rows[3]["embedding"]] == [3, 0]  # others untouched
    assert 77 not in rows
    with pytest.raises(ValueError, match="no vector column"):
        catalog.update_vectors("c", [{"id": 2, "text": "nope"}])


def test_named_vector_update_and_delete(catalog, spark):
    catalog.create("c", dim=2, vectors={"title": 3})
    catalog.update_batch("c", [{"upsert": {"points": [
        {"id": 1, "embedding": [1.0, 1.0], "vec_title": [1.0, 2.0, 3.0],
         "text": "a", "user_id": 0, "site": "s", "lang": "en", "text_id": 1},
        {"id": 2, "embedding": [2.0, 2.0], "vec_title": [4.0, 5.0, 6.0],
         "text": "b", "user_id": 0, "site": "s", "lang": "en", "text_id": 2},
    ]}}])
    # patch only the named vector of point 1
    catalog.update_vectors("c", [{"id": 1, "vec_title": [9.0, 9.0, 9.0]}])
    rows = {r["id"]: r for r in catalog.read("c").collect()}
    assert [round(x) for x in rows[1]["vec_title"]] == [9, 9, 9]
    assert [round(x) for x in rows[1]["embedding"]] == [1, 1]  # default untouched
    # delete the default vector of point 2, named one stays
    catalog.delete_vectors("c", [""], points=[2])
    rows = {r["id"]: r for r in catalog.read("c").collect()}
    assert rows[2]["embedding"] is None
    assert [round(x) for x in rows[2]["vec_title"]] == [4, 5, 6]
    # dim check applies to named patches too
    with pytest.raises(ValueError, match="dim mismatch"):
        catalog.update_vectors("c", [{"id": 1, "vec_title": [1.0]}])


def test_delete_vectors_by_filter(catalog, spark):
    _seed(catalog, spark)
    catalog.delete_vectors(
        "c", ["embedding"],
        query_filter={"must": [{"key": "user_id", "match": {"value": 1}}]})
    rows = catalog.read("c").collect()
    for r in rows:
        if r["user_id"] == 1:
            assert r["embedding"] is None
        else:
            assert r["embedding"] is not None


def test_retrieve_points_by_ids(catalog, spark):
    _seed(catalog, spark)
    got = {r["id"]: r for r in catalog.retrieve("c", [1, 3, 99]).collect()}
    assert sorted(got) == [1, 3]
    assert "embedding" not in got[1].asDict()   # vectors pruned by default
    assert got[3]["text"] == "doc 3"
    withv = catalog.retrieve("c", [3], with_vectors=True).first()
    assert [round(x) for x in withv["embedding"]] == [3, 0]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_op = st.one_of(
    st.tuples(st.just("upsert"), st.integers(0, 9), st.text("ab", min_size=1, max_size=4)),
    st.tuples(st.just("delete"), st.integers(0, 9), st.just("")),
    st.tuples(st.just("set_payload"), st.integers(0, 9), st.text("cd", min_size=1, max_size=4)),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op, min_size=1, max_size=6))
def test_update_batch_matches_sequential_model(spark, tmp_path_factory, ops):
    """Model-based property: an arbitrary ordered op sequence applied by
    update_batch (ONE commit) must equal the same ops applied one at a time
    to a Python dict model."""
    catalog = CollectionCatalog(
        spark, str(tmp_path_factory.mktemp("cat") / "c"))
    catalog.create("c", dim=2)
    base = [
        {"id": i, "embedding": [float(i), 0.0], "text": f"doc {i}",
         "user_id": i % 2, "site": "s", "lang": "en", "text_id": i}
        for i in range(5)
    ]
    catalog.update_batch("c", [{"upsert": {"points": base}}])
    model = {r["id"]: dict(r) for r in base}

    batch = []
    for kind, pid, val in ops:
        if kind == "upsert":
            row = {"id": pid, "embedding": [float(pid), 1.0], "text": val,
                   "user_id": pid % 2, "site": "s", "lang": "en", "text_id": pid}
            batch.append({"upsert": {"points": [row]}})
            model[pid] = dict(row)
        elif kind == "delete":
            batch.append({"delete": {"points": [pid]}})
            model.pop(pid, None)
        else:
            batch.append({"set_payload": {"payload": {"site": val},
                                          "points": [pid]}})
            if pid in model:
                model[pid]["site"] = val
    catalog.update_batch("c", batch)
    got = {r["id"]: r for r in catalog.read("c").collect()}
    assert sorted(got) == sorted(model)
    for i, m in model.items():
        assert got[i]["text"] == m["text"]
        assert got[i]["site"] == m["site"]


def test_batch_upsert_after_new_payload_column(catalog, spark):
    """Regression (review finding): an upsert AFTER a set_payload that
    introduced a NEW column must compose against the in-flight schema."""
    _seed(catalog, spark)
    catalog.update_batch("c", [
        {"set_payload": {"payload": {"tag": "x"}, "filter": {}}},
        {"upsert": {"points": [
            {"id": 10, "embedding": [9.0, 9.0], "text": "new", "user_id": 1,
             "site": "s", "lang": "en", "text_id": 10}]}},
    ])
    rows = {r["id"]: r for r in catalog.read("c").collect()}
    assert rows[2]["tag"] == "x"
    assert rows[10]["tag"] is None and rows[10]["text"] == "new"


def test_delete_vectors_sparse_and_unknown_names(catalog, spark):
    catalog.create("c", dim=2, sparse_vectors={"bm25": {}})
    catalog.update_batch("c", [{"upsert": {"points": [
        {"id": 1, "embedding": [1.0, 1.0], "text": "a", "user_id": 0,
         "site": "s", "lang": "en", "text_id": 1,
         "sparse_bm25_indices": [2, 7], "sparse_bm25_values": [1.0, 2.0]},
    ]}}])
    catalog.delete_vectors("c", ["bm25"], points=[1])
    row = catalog.read("c").first()
    assert row["sparse_bm25_indices"] is None
    assert row["sparse_bm25_values"] is None
    assert row["embedding"] is not None
    with pytest.raises(ValueError, match="unknown vector name"):
        catalog.delete_vectors("c", ["bm52"], points=[1])
