"""uuid3 content-id parity with the reference's uuid.uuid3(NAMESPACE_DNS, t)
(/root/reference/test_qdrant.py:55), computed JVM-side."""

import uuid

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.ids import uuid3_dns


def _expected(t):
    return str(uuid.uuid3(uuid.NAMESPACE_DNS, t or ""))


def test_uuid3_known_values(spark):
    texts = ["hello world", "", "vector join sort", "Ünïcödé ⚡ text", None, "a" * 5000]
    rows = (
        spark.createDataFrame([(t,) for t in texts], "text string")
        .select("text", uuid3_dns("text").alias("u"))
        .collect()
    )
    for r in rows:
        assert r["u"] == _expected(r["text"])


def test_uuid3_version_and_variant_bits(spark):
    rows = (
        spark.range(50)
        .select(uuid3_dns(F.concat(F.lit("doc-"), F.col("id").cast("string"))).alias("u"))
        .collect()
    )
    for r in rows:
        u = uuid.UUID(r["u"])
        assert u.version == 3
        assert u.variant == uuid.RFC_4122


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=200), min_size=1, max_size=8))
def test_uuid3_hypothesis_parity(spark, texts):
    rows = (
        spark.createDataFrame([(t,) for t in texts], "text string")
        .select("text", uuid3_dns("text").alias("u"))
        .collect()
    )
    for r in rows:
        assert r["u"] == _expected(r["text"])
