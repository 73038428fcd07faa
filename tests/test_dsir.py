"""DSIR importance resampling (operators/dsir.py): hashed-ngram importance
weights select raw docs resembling a target corpus; Gumbel-top-k sampling
is deterministic per seed and proportional-ish to the softmax."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_scores,
    dsir_select,
    hashed_ngram_features,
    importance_sample,
)


def _corpus(spark):
    # two dialects: "science" docs vs "sports" docs, disjoint vocabularies
    sci = ["quantum field theory describes particle interactions",
           "the experiment measured particle decay rates precisely",
           "quantum computers factor integers with shor algorithm",
           "field equations govern gravitational wave propagation"]
    spo = ["the striker scored a late winning goal",
           "the referee booked three players after the tackle",
           "midfield pressing won the championship final",
           "a penalty shootout decided the cup match"]
    rows = []
    for i in range(40):
        base = sci[i % 4] if i % 2 == 0 else spo[i % 4]
        rows.append((i, base + f" filler{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_scores_separate_dialects(spark):
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") % 2 == 0).limit(4)  # science only
    ratios = dsir_log_ratios(
        hashed_ngram_features(target), hashed_ngram_features(raw))
    scored = dsir_scores(raw, ratios)
    rows = {r["doc_id"]: r["dsir_score"] for r in scored.collect()}
    sci_scores = [v for k, v in rows.items() if k % 2 == 0]
    spo_scores = [v for k, v in rows.items() if k % 2 == 1]
    # every science doc outscores every sports doc
    assert min(sci_scores) > max(spo_scores)


def test_dsir_select_enriches_target_like_docs(spark):
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") % 2 == 0).limit(4)
    picked = dsir_select(raw, target, n=10, temperature=0.05, seed=7)
    ids = [r["doc_id"] for r in picked.collect()]
    assert len(ids) == 10
    frac_sci = sum(1 for i in ids if i % 2 == 0) / len(ids)
    assert frac_sci >= 0.9  # raw corpus is 50/50; selection is ~all science


def test_importance_sample_deterministic_and_temperature(spark):
    raw = _corpus(spark)
    scored = raw.withColumn(
        "dsir_score", F.when(F.col("doc_id") % 2 == 0, 5.0).otherwise(0.0))
    a = [r["doc_id"] for r in importance_sample(scored, 8, seed=3).collect()]
    b = [r["doc_id"] for r in importance_sample(scored, 8, seed=3).collect()]
    assert a == b  # deterministic per seed
    c = [r["doc_id"] for r in importance_sample(scored, 8, seed=4).collect()]
    assert a != c  # seed actually matters
    # huge temperature -> ~uniform: both classes appear
    hot = [r["doc_id"] for r in
           importance_sample(scored, 20, seed=3, temperature=1e6).collect()]
    assert any(i % 2 for i in hot) and any(not i % 2 for i in hot)
    with pytest.raises(ValueError, match="temperature"):
        importance_sample(scored, 5, temperature=0)


def test_dsir_plan_stays_jvm(spark):
    """The scoring pass must be pure column algebra — no Python eval nodes."""
    raw = _corpus(spark)
    target = raw.limit(4)
    ratios = dsir_log_ratios(
        hashed_ngram_features(target), hashed_ngram_features(raw))
    scored = dsir_scores(raw, ratios)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_hashed_ngram_features_exact_counts(spark):
    """Regression (review finding): ['a','b','c'] must yield exactly
    {a, b, c, 'a b', 'b c'} — zip_with null-padding used to double-count
    the final token as a spurious unigram."""
    df = spark.createDataFrame([(1, "a b c"), (2, "solo")],
                               "doc_id long, text string")
    feats = hashed_ngram_features(df, n_buckets=1_000_003)
    counts = {r["doc_id"]: r["n"] for r in
              feats.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 5, 2: 1}  # 3 unigrams + 2 bigrams; single token -> 1
