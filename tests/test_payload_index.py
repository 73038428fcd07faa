"""Payload field indexes (Qdrant PUT /collections/{c}/index) as clustered
file layout: declaring an index re-clusters each __bucket's files into
disjoint ranges of the field, so filters on it skip files via parquet
min/max footer stats. Tests measure the skipping property directly from
per-file stats (the information the scan planner uses), assert results are
unchanged, and that later writes MAINTAIN the clustering."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.collections import CollectionCatalog
from vectordb_cloud_spark.sources.layout import file_stats


@pytest.fixture()
def catalog(spark, tmp_path):
    return CollectionCatalog(spark, str(tmp_path / "collections"))


def _corpus(spark, n=4000, n_users=4):
    # payload field `site` cycles through 20 distinct values, uncorrelated
    # with id order, so the unclustered layout has ~every site in ~every file
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.array(F.lit(0.5), F.lit(1.5)).cast("array<float>").alias("embedding"),
            F.concat(F.lit("doc "), F.col("id")).alias("text"),
            (F.col("id") % n_users).alias("user_id"),
            F.concat(F.lit("site"), F.format_string("%02d", (F.col("id") * 7) % 20)).alias("site"),
            (F.col("id") % 100).cast("double").alias("score"),
        )
    )


def _site_skip_fraction(catalog, name, value):
    """Fraction of data files whose [min(site), max(site)] admits `value` —
    what a stats-pruning scan must open."""
    df = catalog.read(name)
    stats = file_stats(df, ["site"]).collect()
    assert stats, "no files"
    hit = sum(1 for r in stats if r["min_site"] <= value <= r["max_site"])
    return hit / len(stats), len(stats)


def test_index_clusters_files_and_preserves_results(catalog, spark):
    catalog.create("c", dim=2, n_buckets=4)
    catalog.upsert("c", _corpus(spark))

    before = catalog.count_where("c", F.col("site") == "site07")
    frac_before, _ = _site_skip_fraction(catalog, "c", "site07")
    # unclustered: essentially every file admits every site value
    assert frac_before > 0.9

    meta = catalog.create_payload_index("c", "site", "keyword")
    assert meta.payload_indexes == {"site": "keyword"}

    frac_after, n_files = _site_skip_fraction(catalog, "c", "site07")
    assert n_files >= 8  # INDEX_FILES_PER_BUCKET fans each bucket out
    assert frac_after <= 0.5, (frac_after, n_files)

    # results are layout-independent
    assert catalog.count_where("c", F.col("site") == "site07") == before
    assert catalog.read("c").count() == 4000


def test_index_maintained_across_upsert_and_delete(catalog, spark):
    catalog.create("c", dim=2, n_buckets=4)
    catalog.upsert("c", _corpus(spark))
    catalog.create_payload_index("c", "site", "keyword")

    # bucket-scoped rewrite paths must re-cluster what they touch
    batch = _corpus(spark, n=500).withColumn(
        "text", F.concat(F.lit("v2 "), F.col("text")))
    catalog.upsert("c", batch)
    frac, _ = _site_skip_fraction(catalog, "c", "site07")
    assert frac <= 0.5, frac
    got = {r["id"]: r["text"] for r in
           catalog.read("c").filter(F.col("id") < 3).collect()}
    assert got[1].startswith("v2 ")

    n = catalog.delete_where("c", F.col("site") == "site13")
    assert n == 200
    frac, _ = _site_skip_fraction(catalog, "c", "site07")
    assert frac <= 0.5, frac
    assert catalog.count_where("c", F.col("site") == "site13") == 0


def test_numeric_index_range_predicate(catalog, spark):
    catalog.create("c", dim=2, n_buckets=4)
    catalog.upsert("c", _corpus(spark))
    catalog.create_payload_index("c", "score", "float")
    df = catalog.read("c")
    stats = file_stats(df, ["score"]).collect()
    lo, hi = 10.0, 19.0
    hit = sum(1 for r in stats if r["max_score"] >= lo and r["min_score"] <= hi)
    assert hit / len(stats) <= 0.5, (hit, len(stats))
    assert df.filter(F.col("score").between(lo, hi)).count() == 400


def test_index_guards_and_drop(catalog, spark):
    catalog.create("c", dim=2)
    with pytest.raises(ValueError, match="field_schema"):
        catalog.create_payload_index("c", "site", "btree")
    for bad in ("id", "embedding", "__bucket", "vec_text"):
        with pytest.raises(ValueError, match="reserved"):
            catalog.create_payload_index("c", bad)
    # indexing before any data exists is allowed (as in Qdrant): the first
    # write that carries the field lands clustered
    catalog.create_payload_index("c", "site")
    catalog.upsert("c", _corpus(spark, n=1000))
    frac, _ = _site_skip_fraction(catalog, "c", "site07")
    assert frac <= 0.6, frac
    meta = catalog.drop_payload_index("c", "site")
    assert not meta.payload_indexes


def test_index_survives_copy_init_and_snapshot_restore(catalog, spark, tmp_path):
    catalog.create("c", dim=2, n_buckets=2)
    catalog.upsert("c", _corpus(spark, n=1000))
    catalog.create_payload_index("c", "site", "keyword")

    catalog.create_from("c2", "c")
    assert catalog.meta("c2").payload_indexes == {"site": "keyword"}
    frac, _ = _site_skip_fraction(catalog, "c2", "site07")
    assert frac <= 0.6, frac

    snap = catalog.snapshot("c", str(tmp_path / "snaps"))
    catalog.restore("c3", snap)
    assert catalog.meta("c3").payload_indexes == {"site": "keyword"}
    assert catalog.read("c3").count() == 1000


def test_collection_info_shape(catalog, spark):
    catalog.create("c", dim=2, metric="cosine", n_buckets=4)
    catalog.upsert("c", _corpus(spark, n=1000))
    catalog.create_payload_index("c", "site", "keyword")
    catalog.create_payload_index("c", "missing_field", "integer")  # declared, no data yet
    info = catalog.collection_info("c")
    assert info["status"] == "green"
    assert info["points_count"] == 1000
    assert info["segments_count"] >= 4
    assert info["config"]["params"]["vectors"] == {"size": 2, "distance": "Cosine"}
    assert info["payload_schema"]["site"] == {"data_type": "keyword", "points": 1000}
    assert info["payload_schema"]["missing_field"] == {"data_type": "integer", "points": 0}

    catalog.create("named", dim=2, vectors={"text": 3, "image": 4})
    vecs = catalog.collection_info("named")["config"]["params"]["vectors"]
    assert vecs == {"image": {"size": 4, "distance": "Euclid"},
                    "text": {"size": 3, "distance": "Euclid"}}


def test_text_index_postings_match_and_staleness(spark, tmp_path):
    """Full-text payload index (Qdrant field_schema='text'): the postings
    sidecar's whole-token AND equals an explicit scan predicate; a write
    bumps the version and the sidecar lazily rebuilds to include new
    rows."""
    from pyspark.sql import functions as F

    from vectordb_cloud_spark.collections import CollectionCatalog
    from vectordb_cloud_spark.functions.text import words

    cat = CollectionCatalog(spark, str(tmp_path / "cat"))
    cat.create("c", dim=2, n_buckets=4)
    cat.create_payload_index("c", "text", "text")
    rows = [
        (1, [0.0, 0.0], "Spark joins shuffle data", 1),
        (2, [1.0, 0.0], "spark DATA pipelines", 1),
        (3, [0.0, 1.0], "database joins only", 2),   # 'data' is a substring
        (4, [1.0, 1.0], "nothing relevant here", 2),
        (5, [2.0, 0.0], None, 1),
    ]
    cat.upsert("c", spark.createDataFrame(
        rows, "id long, embedding array<float>, text string, user_id long"))

    got = sorted(r["id"] for r in
                 cat.text_match_ids("c", "text", "DATA spark").collect())
    # whole-token semantics: doc 3's 'database' does NOT match token 'data'
    def scan_truth(query):
        toks = {w.lower() for w in query.split()}
        df = cat.read("c").filter(F.col("text").isNotNull())
        out = df.select("id", F.transform(words("text"),
                                          lambda w: F.lower(w)).alias("__w"))
        for t in sorted(toks):
            out = out.filter(F.array_contains("__w", t))
        return sorted(r["id"] for r in out.collect())

    assert got == scan_truth("DATA spark") == [1, 2]

    hits = cat.search_text_filtered("c", [0.2, 0.0], "text", "spark data",
                                    k=5).collect()
    assert [r["id"] for r in hits] == [1, 2]  # nearest-first among matches

    # staleness: a new doc with the tokens appears after one more upsert
    cat.upsert("c", spark.createDataFrame(
        [(6, [3.0, 0.0], "more spark data", 2)],
        "id long, embedding array<float>, text string, user_id long"))
    got2 = sorted(r["id"] for r in
                  cat.text_match_ids("c", "text", "spark data").collect())
    assert got2 == [1, 2, 6]
    # exactly one sidecar version remains (stale pruned)
    import os
    vers = [d for d in os.listdir(tmp_path / "cat" / "c")
            if d.startswith("textidx.v")]
    assert len(vers) == 1

    # guards
    import pytest as _pytest
    with _pytest.raises(ValueError, match="text"):
        cat.text_match_ids("c", "lang", "x")  # no text index on lang
    with _pytest.raises(ValueError, match="token"):
        cat.text_match_ids("c", "text", "   ")
