"""Formula-based score boosting: compile-to-column semantics vs Python math."""

import math

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.formula import compile_formula, rescore_with_formula


@pytest.fixture(scope="module")
def cands(spark):
    rows = [
        # id, score, popularity, days_old, tag
        (1, 0.90, 10.0, 2.0, "news"),
        (2, 0.80, 500.0, 40.0, "blog"),
        (3, 0.70, 50.0, 1.0, "news"),
        (4, 0.60, 1000.0, 400.0, "docs"),
    ]
    return spark.createDataFrame(
        rows, "id long, score double, popularity double, days_old double, tag string"
    )


def vals(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_arithmetic_and_variables(cands):
    formula = {"sum": ["$score", {"mult": [0.1, {"log10": "popularity"}]}]}
    got = vals(cands.withColumn("f", compile_formula(formula)), "f")
    for r in cands.collect():
        want = r["score"] + 0.1 * math.log10(r["popularity"])
        assert got[r["id"]] == pytest.approx(want, rel=1e-12)


def test_div_pow_neg_abs_sqrt_exp_ln(cands):
    formula = {"sum": [
        {"div": {"left": 1.0, "right": "popularity"}},
        {"pow": {"base": "$score", "exponent": 2.0}},
        {"neg": {"abs": {"neg": 3.0}}},
        {"sqrt": "days_old"},
        {"exp": 0.0},
        {"ln": {"exp": 1.0}},
    ]}
    got = vals(cands.withColumn("f", compile_formula(formula)), "f")
    for r in cands.collect():
        want = (1.0 / r["popularity"] + r["score"] ** 2 - 3.0
                + math.sqrt(r["days_old"]) + 1.0 + 1.0)
        assert got[r["id"]] == pytest.approx(want, rel=1e-12)


def test_div_by_zero_default(spark):
    df = spark.createDataFrame([(1, 0.0)], "id long, d double")
    f = {"div": {"left": 1.0, "right": "d", "by_zero_default": 7.0}}
    assert df.withColumn("f", compile_formula(f)).first()["f"] == 7.0


@pytest.mark.parametrize("kind", ["lin_decay", "exp_decay", "gauss_decay"])
def test_decay_peak_and_midpoint(cands, kind):
    # peak 1.0 at target; value == midpoint at |x-target| == scale
    formula = {kind: {"x": "days_old", "target": 2.0, "scale": 38.0,
                      "midpoint": 0.5}}
    got = vals(cands.withColumn("f", compile_formula(formula)), "f")
    assert got[1] == pytest.approx(1.0)          # days_old == target
    assert got[2] == pytest.approx(0.5)          # |40-2| == scale
    assert 0.0 <= got[4] <= 0.5                  # far out decays below


def test_lin_decay_clamps_to_zero(spark):
    df = spark.createDataFrame([(1, 1000.0)], "id long, x double")
    f = {"lin_decay": {"x": "x", "target": 0.0, "scale": 10.0}}
    assert df.withColumn("f", compile_formula(f)).first()["f"] == 0.0


def test_condition_indicator(cands):
    formula = {"sum": ["$score", {"mult": [
        0.5, {"condition": {"must": [{"key": "tag", "match": {"value": "news"}}]}}
    ]}]}
    got = vals(cands.withColumn("f", compile_formula(formula)), "f")
    assert got[1] == pytest.approx(1.4)
    assert got[2] == pytest.approx(0.8)   # non-news: no boost


def test_rescore_reorders_and_limits(cands):
    # popularity-dominated formula flips the pure-score order
    formula = {"sum": [{"mult": [0.001, "popularity"]}, "$score"]}
    out = rescore_with_formula(cands, formula, k=2)
    assert [r["id"] for r in out.collect()] == [4, 2]
    plan = rescore_with_formula(cands, formula, k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_errors(cands):
    with pytest.raises(ValueError):
        compile_formula({"bogus": 1})
    with pytest.raises(ValueError):
        compile_formula({"sum": []})
    with pytest.raises(ValueError):
        compile_formula({"sum": [1], "mult": [2]})
    with pytest.raises(ValueError):
        compile_formula({"gauss_decay": {"x": "d", "midpoint": 1.5}})
    with pytest.raises(ValueError):
        compile_formula({"gauss_decay": {"x": "d", "scale": 0.0}})
    with pytest.raises(ValueError):
        compile_formula([1, 2])
