"""Decontamination: planted verbatim eval spans must be found; clean docs
must survive; short accidental overlaps below n must not trigger."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.decontaminate import (
    decontaminate,
    find_contaminated,
)

EVAL_SENtENCE = "the capital of france is paris and the capital of italy is rome exactly"


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame(
        [
            (1, "completely unrelated text about spark shuffle partitions and joins today"),
            (2, f"some prefix text then {EVAL_SENtENCE} then a suffix continues on"),
            (3, "the capital of france is a lovely place to visit in spring months"),  # < n overlap
            (4, f"another leak: {EVAL_SENtENCE.upper()}"),  # case-insensitive match
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, EVAL_SENtENCE), (101, "benchmark question about nothing in train")],
        "doc_id long, text string",
    )
    return train, eval_set


def test_find_contaminated_names_the_benchmark(corpora):
    train, eval_set = corpora
    hits = {r["doc_id"]: r for r in find_contaminated(train, eval_set, n=13).collect()}
    assert set(hits) == {2, 4}
    assert all(list(h["eval_ids"]) == [100] for h in hits.values())
    assert all(h["n_hits"] >= 1 for h in hits.values())


def test_decontaminate_removes_only_leaked_docs(corpora):
    train, eval_set = corpora
    clean = decontaminate(train, eval_set, n=13)
    assert {r["doc_id"] for r in clean.collect()} == {1, 3}


def test_no_false_positives_on_fixture(spark, documents):
    eval_set = spark.createDataFrame(
        [(1, "a benchmark sentence that certainly never appears in the corpus fixture")],
        "doc_id long, text string",
    )
    assert find_contaminated(documents, eval_set, n=13).count() == 0
    assert decontaminate(documents, eval_set, n=13).count() == documents.count()
