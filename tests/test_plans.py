"""Plan-shape contracts: the properties that make operators scale are
asserted on the physical plan, not just the output."""

from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.knn import knn_search
from vectordb_cloud_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
)


def test_knn_is_shuffle_free_take_ordered(spark, sf_dir):
    """Exact kNN must compile to TakeOrderedAndProject over the scan — a
    single map pass + bounded per-partition heap, zero shuffles."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = knn_search(emb, [0.0] * 64, k=5, filters=F.col("label") == 3)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert count_exchanges(df) == 0


def test_knn_filter_pushed_to_scan(spark, sf_dir):
    # drop cached plans: the cache manager would otherwise substitute an
    # InMemoryTableScan for this path and hide the parquet PushedFilters
    spark.catalog.clearCache()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = knn_search(emb, [0.0] * 64, k=5, filters=F.col("label") == 3)
    assert has_pushed_filters(df, "label")


def test_column_pruning_reaches_scan(spark, sf_dir):
    """P7 (with_vectors=False analog): a 2-column projection must read only
    those columns from parquet."""
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.filter(F.col("doc_id") % 100 == 7).select("doc_id", "lang")
    cols = read_schema_columns(df)
    assert set(cols) <= {"doc_id", "lang"}


def test_small_dim_join_broadcasts(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
    assert uses_broadcast_join(j)


def test_contains_and_rlike_evaluate_in_scan_stage(spark, sf_dir):
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    """The reference scrolled all rows then filtered in Python
    (/root/reference/app.py:108-110); here the predicate runs inside the
    scan stage — no extra pass, no shuffle."""
    df = documents.filter(F.col("text").contains("spark")).select("doc_id")
    assert count_exchanges(df) == 0
    df2 = documents.filter(F.col("text").rlike("vector (join|sort)")).select("doc_id")
    assert count_exchanges(df2) == 0


def test_registry_queries_have_no_python_eval_nodes(spark, sf_dir):
    """The 'UDFs are the slow path' contract, enforced: every registry query
    plan must stay JVM-side — no BatchEvalPython / ArrowEvalPython /
    MapInPandas nodes — except the two deliberate Python boundaries (the
    mock embedder and the multimodal decode). Also smoke-builds every
    query's plan against the small fixture."""
    from vectordb_cloud_spark import queries as qmod
    from vectordb_cloud_spark.plans.inspect import explain_str

    allowed_python = {"classify_titles_mock_embed", "multimodal_image_features"}
    skip = {"streaming_hourly_counts"}  # building it RUNS a stream, not a plan
    offenders = {}
    for name, fn in qmod.registry().items():
        if name in skip:
            continue
        df = fn(spark, str(sf_dir))
        plan = explain_str(df, mode="simple")
        has_python = any(tok in plan for tok in
                         ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                          "FlatMapGroupsInPandas"))
        if has_python and name not in allowed_python:
            offenders[name] = plan[:300]
    assert not offenders, f"Python nodes leaked into: {list(offenders)}"
