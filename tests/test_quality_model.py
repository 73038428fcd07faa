"""Learned quality filter (operators/quality_model.py): a linear model
trained on planted clean-vs-junk labels must separate held-out docs, and
scoring must stay a JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.quality_model import (
    filter_by_model_quality,
    quality_features,
    score_quality,
    train_quality_model,
)

CLEAN = [
    "the quick brown fox jumps over the lazy dog and then rests in the shade",
    "a study of distributed systems shows that careful partitioning improves throughput",
    "we measured the latency of the query engine under a sustained mixed workload",
    "the committee will review the proposal and publish its findings next month",
    "students should read the first three chapters before attending the seminar",
    "this recipe combines fresh basil with ripe tomatoes and good olive oil",
    "the museum opened a new exhibit about the history of mechanical computing",
    "her novel explores the quiet tension between memory and forgiveness",
]
JUNK = [
    "BUY NOW!!! $$$ 100% FREE CLICK CLICK CLICK http://x.zz 4U 4U 4U",
    "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa",
    "!!!! ???? #### @@@@ %%%% ^^^^ &&&& **** ((((",
    "W1N B1G M0N3Y 2DAY 2DAY 2DAY WWW.SPAM.XX !!!",
    "x",
    "0101010101 0101010101 0101010101 0101010101",
    "FREE FREE FREE FREE FREE FREE FREE FREE FREE",
    "zzzzzzzzzzzzzzzzzzzz zzzzzzzzzzzzzzzzzzzz",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, t, 1.0) for i, t in enumerate(CLEAN)] + [
        (100 + i, t, 0.0) for i, t in enumerate(JUNK)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_model_separates_clean_from_junk(spark, labeled):
    model = train_quality_model(labeled)
    held_out = spark.createDataFrame(
        [
            (1, "the library catalog lists every journal acquired since the merger", 1),
            (2, "GET RICH FAST $$$ $$$ $$$ CLICK HERE NOW FREE FREE", 0),
            (3, "engineers reviewed the design and suggested a simpler caching layer", 1),
            (4, "###### !!!!! ###### !!!!! ###### !!!!! 99999", 0),
        ],
        "doc_id long, text string, expected int",
    )
    scored = {r["doc_id"]: r["model_quality"]
              for r in score_quality(model, held_out).collect()}
    assert min(scored[1], scored[3]) > max(scored[2], scored[4])
    kept = {r["doc_id"] for r in filter_by_model_quality(model, held_out, 0.5).collect()}
    assert kept == {1, 3}


def test_score_preserves_columns_and_bounds(spark, labeled):
    model = train_quality_model(labeled)
    out = score_quality(model, labeled)
    assert set(out.columns) == {"doc_id", "text", "label", "model_quality"}
    rows = out.collect()
    assert all(0.0 <= r["model_quality"] <= 1.0 for r in rows)


def test_scoring_plan_is_jvm_only(spark, labeled, documents):
    """The full-corpus scoring pass must stay whole-stage JVM: no Python
    eval nodes, no shuffle (it's a per-row map)."""
    model = train_quality_model(labeled)
    out = score_quality(model, documents.select("doc_id", "text"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_null_and_empty_text_score_without_error(spark, labeled):
    model = train_quality_model(labeled)
    df = spark.createDataFrame([(1, None), (2, ""), (3, "   ")], "doc_id long, text string")
    rows = score_quality(model, df).collect()
    assert len(rows) == 3
    assert all(r["model_quality"] is not None for r in rows)


def test_features_are_finite(spark, labeled):
    feats = quality_features(labeled)
    from vectordb_cloud_spark.operators.quality_model import FEATURE_COLS

    for r in feats.collect():
        for c in FEATURE_COLS:
            assert r[c] is not None and r[c] == r[c], (c, r)  # not NULL/NaN
