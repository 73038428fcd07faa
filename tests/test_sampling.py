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


def test_token_share_fractions_hit_targets(spark):
    from vectordb_cloud_spark.operators.sampling import token_share_fractions

    # en docs are 10x longer than fr docs: row-weighted sampling would
    # miss token targets badly; token-share planning must correct for it
    rows = [(i, "en", "w " * 100) for i in range(100)] + [
        (1000 + i, "fr", "w " * 10) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    fracs = token_share_fractions(docs, {"en": 0.5, "fr": 0.5}, "lang")
    # fr is token-constrained -> kept whole; en downsampled to match fr tokens
    assert fracs["fr"] == 1.0
    assert fracs["en"] == pytest.approx(11 / 101, rel=1e-6)  # 11 fr tokens per 101-token en doc ("w "*N splits to N+1)


def test_mixture_by_token_share_is_seeded_subset(spark, documents):
    from vectordb_cloud_spark.operators.sampling import mixture_by_token_share

    langs = [r["lang"] for r in documents.select("lang").distinct().collect()]
    shares = {lang: 1.0 for lang in langs[:2]}
    out1 = mixture_by_token_share(documents, shares, "lang", seed=7)
    out2 = mixture_by_token_share(documents, shares, "lang", seed=7)
    assert sorted(r["doc_id"] for r in out1.collect()) == \
        sorted(r["doc_id"] for r in out2.collect())
    assert set(r["lang"] for r in out1.select("lang").distinct().collect()) \
        <= set(shares)
    # a true subset of the corpus
    assert out1.join(documents, "doc_id", "left_anti").count() == 0


def test_token_share_fractions_validates(spark, documents):
    import pytest as _pytest

    from vectordb_cloud_spark.operators.sampling import token_share_fractions

    with _pytest.raises(ValueError, match="zero"):
        token_share_fractions(documents, {"en": 0.0})
    with _pytest.raises(ValueError, match="no tokens"):
        token_share_fractions(documents, {"klingon": 1.0})


def test_temperature_shares_upweights_low_resource(spark):
    """alpha < 1 moves share from the dominant domain to the rare one;
    alpha=1 reproduces the natural token distribution."""
    from vectordb_cloud_spark.operators.sampling import temperature_shares

    docs = spark.createDataFrame(
        [(i, "en", "word " * 100) for i in range(90)]
        + [(1000 + i, "sw", "neno " * 100) for i in range(10)],
        "doc_id long, lang string, text string",
    )
    natural = temperature_shares(docs, alpha=1.0)
    cooled = temperature_shares(docs, alpha=0.3)
    assert abs(natural["en"] - 0.9) < 0.01 and abs(natural["sw"] - 0.1) < 0.01
    assert cooled["sw"] > natural["sw"]
    assert cooled["en"] < natural["en"]
    assert abs(sum(cooled.values()) - 1.0) < 1e-9
    # composes with the token-share mixer: fractions in (0, 1], rare domain
    # kept whole (it is the most token-constrained after upweighting)
    from vectordb_cloud_spark.operators.sampling import token_share_fractions

    fr = token_share_fractions(docs, cooled, domain_col="lang")
    assert fr["sw"] == 1.0 and 0.0 < fr["en"] < 1.0


def test_temperature_shares_validates_alpha(spark):
    from vectordb_cloud_spark.operators.sampling import temperature_shares

    docs = spark.createDataFrame([(1, "en", "x")], "doc_id long, lang string, text string")
    with pytest.raises(ValueError):
        temperature_shares(docs, alpha=0.0)
    with pytest.raises(ValueError):
        temperature_shares(docs, alpha=1.5)
