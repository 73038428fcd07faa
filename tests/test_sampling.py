"""Sampling/mixture ops: determinism, ratio targets, and stable sharding."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.sampling import (
    hash_shard,
    stratified_sample,
    weighted_mixture,
)


def test_stratified_sample_deterministic_and_allowlisted(spark, documents):
    out1 = stratified_sample(documents, "lang", {"en": 1.0, "de": 0.5})
    out2 = stratified_sample(documents, "lang", {"en": 1.0, "de": 0.5})
    assert sorted(r["doc_id"] for r in out1.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )
    langs = {r["lang"] for r in out1.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # unlisted strata dropped
    n_en_all = documents.filter(F.col("lang") == "en").count()
    assert out1.filter(F.col("lang") == "en").count() == n_en_all  # fraction 1.0 keeps all


def test_stratified_sample_rejects_bad_fraction(documents):
    with pytest.raises(ValueError, match="fractions"):
        stratified_sample(documents, "lang", {"en": 1.5})


def test_stratified_sample_default_fraction_covers_unlisted(documents):
    out = stratified_sample(documents, "lang", {"en": 1.0}, default_fraction=1.0)
    # every stratum kept whole: allowlist + default covers the corpus
    assert out.count() == documents.count()


def test_stratified_sample_guards_high_cardinality_strata(documents):
    # doc_id is effectively unique per row — the driver-side distinct
    # collect must refuse, not haul the whole keyspace
    with pytest.raises(ValueError, match="max_strata"):
        stratified_sample(
            documents, "doc_id", {}, default_fraction=0.5, max_strata=10
        )
    # raising the cap explicitly restores the behavior
    n = documents.count()
    out = stratified_sample(
        documents, "doc_id", {}, default_fraction=1.0, max_strata=n
    )
    assert out.count() == n


def test_weighted_mixture_ratios_and_provenance(spark, documents):
    a = documents.filter(F.col("doc_id") % 2 == 0)
    b = documents.filter(F.col("doc_id") % 2 == 1)
    mix = weighted_mixture({"a": a, "b": b}, {"a": 3.0, "b": 1.0}, seed=7)
    counts = {r["__source"]: r["n"] for r in
              mix.groupBy("__source").agg(F.count("*").alias("n")).collect()}
    # source a (weight 3) is kept whole; b downsamples to ~1/3 of a
    assert counts["a"] == a.count()
    ratio = counts["a"] / max(counts["b"], 1)
    assert 1.8 <= ratio <= 5.0  # Bernoulli noise on a small fixture
    # subset property: nothing oversampled
    assert mix.count() <= a.count() + b.count()


def test_weighted_mixture_validates_inputs(spark, documents):
    with pytest.raises(ValueError, match="unknown"):
        weighted_mixture({"a": documents}, {"a": 1.0, "ghost": 1.0})
    empty = documents.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        weighted_mixture({"a": documents, "e": empty}, {"a": 1.0, "e": 1.0})


def test_hash_shard_stable_and_complete(spark, documents):
    sharded = hash_shard(documents, n_shards=8)
    again = hash_shard(documents.repartition(13), n_shards=8)
    m1 = {r["doc_id"]: r["shard"] for r in sharded.collect()}
    m2 = {r["doc_id"]: r["shard"] for r in again.collect()}
    assert m1 == m2  # partitioning/order never changes shard assignment
    assert set(m1.values()) <= set(range(8))
    # roughly balanced (hash uniformity on the fixture)
    from collections import Counter

    c = Counter(m1.values())
    assert max(c.values()) <= 3 * max(1, min(c.values()))
