"""PII scrub (functions/pii.py): detection counts, redaction, Luhn gating,
and the no-UDF plan contract."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.pii import (
    luhn_valid,
    pii_counts,
    redact_pii,
    scrub_corpus,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk for details"),
        (2, "server at 192.168.1.7 timed out, retry 10.0.0.255"),
        (3, "SSN 123-45-6789 on file"),
        # 4242... is Luhn-valid (the classic test card); 1234567890123456 is
        # NOT (and an unbroken 16-digit run is too long for the phone shape)
        (4, "pay with 4242 4242 4242 4242 not 1234567890123456"),
        # Luhn-INVALID but card-SHAPED (4-4-4-4 with spaces): must survive
        # redaction entirely — the phone stage excludes uniform 4-groups
        (8, "invoice id 1234 5678 9012 3456 stays"),
        # a valid card embedded as a substring of a longer digit run: the
        # longer run is not a validated candidate, so it must not be mangled
        (9, "ref 94242424242424242 and card 4242424242424242"),
        (5, "call +1 (415) 555-0132 or 020-7946-0958"),
        (6, "clean text with plain numbers like 2026 and 31337"),
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts(corpus):
    got = {r["doc_id"]: r["c"] for r in corpus.select("doc_id", pii_counts("text").alias("c")).collect()}
    assert got[1]["email"] == 1
    assert got[2]["ipv4"] == 2
    assert got[3]["ssn"] == 1
    assert got[4]["card"] == 1  # only the Luhn-valid one
    assert got[5]["phone"] >= 2
    assert all(v == 0 for v in got[6].asDict().values())
    # null text -> null counts (regex functions propagate null, no masking)
    assert all(v is None for v in got[7].asDict().values())


def test_redaction_replaces_and_preserves(corpus):
    red = {r["doc_id"]: r["t"] for r in corpus.select(
        "doc_id", redact_pii("text").alias("t")).collect()}
    assert red[1] == "contact me at [PII] for details"
    assert "192.168.1.7" not in red[2] and red[2].count("[PII]") == 2
    assert red[3] == "SSN [PII] on file"
    assert "4242" not in red[4]
    assert "1234567890123456" in red[4]  # Luhn-invalid run survives
    assert "clean text with plain numbers" in red[6]
    assert red[7] is None
    # card-shaped Luhn-invalid run survives whole (no phone half-redaction)
    assert red[8] == "invoice id 1234 5678 9012 3456 stays"
    # substring-guarded literal replace: the 17-digit ref keeps its bytes,
    # the standalone valid card is redacted
    assert red[9] == "ref 94242424242424242 and card [PII]"


def test_luhn_expression(spark):
    df = spark.createDataFrame(
        [("4242424242424242", True), ("4242424242424241", False),
         ("1234567890123456", False), ("79927398713", False)],  # <13 digits
        "digits string, expect boolean",
    )
    rows = df.select("expect", luhn_valid(F.col("digits")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expect"]


def test_scrub_corpus_transform_no_python_nodes(corpus):
    out = scrub_corpus(corpus)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["text"].count("[PII]") == 1
    assert rows[1]["__pii"]["email"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan  # scan-stage column algebra only
