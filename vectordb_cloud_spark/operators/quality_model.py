"""Model-based document quality scoring: a trained classifier over the
heuristic text features.

The heuristic ``quality_score`` (functions/text.py) is a fixed formula; at
corpus scale the standard upgrade is a LEARNED filter — train a small linear
model on a labeled sample (curated vs junk), then score the whole corpus
with it (the fastText-classifier pattern from the LLM-data literature,
expressed on Spark).

Spark shape: featurization is pure JVM column algebra (the same
length/punct/stopword/token statistics the heuristic uses), training runs
MLlib ``LogisticRegression`` on the labeled sample (small — driver-bounded
iterations over a cached DataFrame), and scoring is ``model.transform`` —
a narrow map with the coefficient vector shipped in the plan. No Python
boundary anywhere, so the scoring pass pipelines into the curation chain at
full scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.text import (
    mean_word_length,
    punct_ratio,
    stopword_ratio,
    token_count,
)

FEATURE_COLS = (
    "f_n_tokens", "f_mean_word_len", "f_stopword_ratio",
    "f_punct_ratio", "f_upper_ratio", "f_digit_ratio", "f_uniq_ratio",
)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the classifier's feature columns — all JVM expressions."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.greatest(F.length(t), F.lit(1))
    toks = F.split(F.trim(t), r"\s+")

    def _safe(col):
        # VectorAssembler rejects NULL/NaN: NULL-text features (size(NULL),
        # 0/0 ratios) must land as 0.0, not propagate
        return F.nanvl(F.coalesce(col.cast("double"), F.lit(0.0)), F.lit(0.0))

    return (
        docs.withColumn("f_n_tokens", _safe(token_count(text_col)))
        .withColumn("f_mean_word_len", _safe(mean_word_length(text_col)))
        .withColumn("f_stopword_ratio", _safe(stopword_ratio(text_col)))
        .withColumn("f_punct_ratio", _safe(punct_ratio(text_col)))
        .withColumn(
            "f_upper_ratio",
            _safe(F.length(F.regexp_replace(t, r"[^A-Z]", "")) / n_chars),
        )
        .withColumn(
            "f_digit_ratio",
            _safe(F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars),
        )
        .withColumn(
            "f_uniq_ratio",
            _safe(F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))),
        )
    )


def train_quality_model(labeled: DataFrame, label_col: str = "label",
                        text_col: str = "text", max_iter: int = 50):
    """Fit the quality classifier on a labeled sample (label 1 = keep,
    0 = junk). The sample is the small side — thousands of rows labeled by
    heuristics, an LLM judge, or humans — so the MLlib fit is cheap; the
    payoff is the full-corpus scoring pass staying one narrow stage."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(labeled, text_col)
    asm = VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="__fvec")
    lr = LogisticRegression(
        featuresCol="__fvec", labelCol=label_col, maxIter=max_iter, regParam=0.01,
    )
    model = lr.fit(asm.transform(feats))
    return model


def score_quality(model, docs: DataFrame, text_col: str = "text",
                  score_col: str = "model_quality") -> DataFrame:
    """Score every document with P(keep). One narrow map stage: the
    coefficient vector rides in the plan, features are column algebra."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(docs, text_col)
    asm = VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="__fvec")
    scored = model.transform(asm.transform(feats))
    keep_p = vector_to_array(F.col(model.getProbabilityCol()))[1]
    return (
        scored.withColumn(score_col, keep_p)
        .drop("__fvec", model.getRawPredictionCol(),
              model.getProbabilityCol(), model.getPredictionCol(),
              *FEATURE_COLS)
    )


def filter_by_model_quality(model, docs: DataFrame, threshold: float = 0.5,
                            text_col: str = "text") -> DataFrame:
    """The curation-stage form: keep documents the model scores above
    ``threshold``. Composes with pipeline.curate_corpus as a drop-in extra
    stage (score is a column, so Catalyst can reorder cheap predicates
    around it)."""
    return (
        score_quality(model, docs, text_col)
        .filter(F.col("model_quality") >= threshold)
    )
