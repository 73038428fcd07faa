"""Property-based tests (hypothesis) for the operator contracts from
SURVEY.md §5: kNN monotonicity, upsert idempotence/LWW, distance metric
axioms on the native column expressions."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.embedding import mock_vector
from vectordb_cloud_spark.operators.knn import knn_search

_vec = st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
    min_size=4, max_size=4,
)


@settings(max_examples=20, deadline=None)
@given(a=_vec, b=_vec)
def test_l2_symmetry_and_nonneg(spark_global, a, b):
    from vectordb_cloud_spark.functions.vector import l2_distance

    df = spark_global.createDataFrame([(a, b)], "a array<double>, b array<double>")
    r = df.select(
        l2_distance("a", "b").alias("ab"), l2_distance("b", "a").alias("ba")
    ).collect()[0]
    assert r["ab"] == r["ba"]
    assert r["ab"] >= 0.0
    want = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert math.isclose(r["ab"], want, rel_tol=1e-9, abs_tol=1e-12)


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_knn_monotone_in_k(spark_global, seed):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(40, 8))
    df = spark_global.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "id long, embedding array<float>",
    )
    q = [float(x) for x in rng.normal(size=8)]
    k3 = {r["id"] for r in knn_search(df, q, k=3).collect()}
    k7 = {r["id"] for r in knn_search(df, q, k=7).collect()}
    assert k3 <= k7 and len(k3) == 3 and len(k7) == 7


@settings(max_examples=10, deadline=None)
@given(text=st.text(min_size=0, max_size=200))
def test_mock_embedder_total_and_stable(text):
    v1 = mock_vector(text, 16)
    v2 = mock_vector(text, 16)
    assert v1 == v2 and len(v1) == 16
    assert all(-1.0 <= x < 1.0 for x in v1)


# hypothesis can't use function-scoped fixtures; module-level session handle
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=25, deadline=None)
@given(t=_text)
def test_pii_redaction_idempotent(spark_global, t):
    """redact(redact(x)) == redact(x): the token itself must never match a
    PII pattern, so scrubbing is safe to re-run (pipeline re-entry)."""
    from vectordb_cloud_spark.functions.pii import redact_pii

    df = spark_global.createDataFrame([(t,)], "text string")
    once, twice = df.select(
        redact_pii("text").alias("a")
    ).select("a", redact_pii("a").alias("b")).collect()[0]
    assert once == twice


@settings(max_examples=30, deadline=None)
@given(digits=st.text(alphabet="0123456789", min_size=13, max_size=19))
def test_luhn_expression_matches_python(spark_global, digits):
    from vectordb_cloud_spark.functions.pii import luhn_valid

    def py_luhn(ds):
        total = 0
        for i, ch in enumerate(reversed(ds)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    df = spark_global.createDataFrame([(digits,)], "d string")
    got = df.select(luhn_valid(F.col("d")).alias("v")).collect()[0]["v"]
    assert got == py_luhn(digits)
