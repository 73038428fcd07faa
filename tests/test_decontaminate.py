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


@pytest.fixture(scope="module")
def fuzzy_corpora(spark):
    # eval doc, and a PARAPHRASED leak: every ~6th word changed, so no
    # 13-gram survives verbatim but shingle-level Jaccard stays high
    eval_text = ("which planet in the solar system has the most moons "
                 "answer saturn with one hundred forty six confirmed moons "
                 "as of the latest count in recent astronomical surveys done")
    paraphrased = ("which planet in the solar system holds the most moons "
                   "answer saturn with one hundred forty six verified moons "
                   "as of the newest count in recent astronomical surveys made")
    train = spark.createDataFrame(
        [
            (1, "unrelated text about parquet row groups and shuffle sizes"),
            (2, paraphrased),
            (3, eval_text),  # verbatim leak too
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(200, eval_text)], "doc_id long, text string"
    )
    return train, eval_set


def test_exact_ngram_misses_paraphrase(fuzzy_corpora):
    train, eval_set = fuzzy_corpora
    exact = {r["doc_id"] for r in
             find_contaminated(train, eval_set, n=13).collect()}
    assert 3 in exact      # verbatim found
    assert 2 not in exact  # paraphrase slips through the verbatim check


def test_fuzzy_catches_paraphrase(fuzzy_corpora):
    from vectordb_cloud_spark.operators.decontaminate import (
        find_contaminated_fuzzy,
    )

    train, eval_set = fuzzy_corpora
    hits = find_contaminated_fuzzy(train, eval_set, jaccard_threshold=0.4,
                                   bands=16).collect()
    got = {(r["doc_id"], r["eval_id"]) for r in hits}
    assert (2, 200) in got and (3, 200) in got
    assert all(r["doc_id"] != 1 for r in hits)
    # verbatim pair has jaccard 1.0; paraphrase strictly between
    by_doc = {r["doc_id"]: r["jaccard"] for r in hits}
    assert by_doc[3] == 1.0
    assert 0.4 <= by_doc[2] < 1.0


def test_decontaminate_fuzzy_removes_both_kinds(fuzzy_corpora):
    from vectordb_cloud_spark.operators.decontaminate import (
        decontaminate_fuzzy,
    )

    train, eval_set = fuzzy_corpora
    clean = decontaminate_fuzzy(train, eval_set, jaccard_threshold=0.4,
                                bands=16)
    assert [r["doc_id"] for r in clean.collect()] == [1]
