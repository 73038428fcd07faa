"""Source connectors: typed readers + scroll pagination semantics."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.sources.readers import (
    read_csv_corpus,
    read_excel_fixture,
    read_insert_requests,
    read_jsonl_corpus,
    scroll,
)


def test_insert_requests_typed(spark):
    df = read_insert_requests(spark, [
        {"id": 1, "user_id": 7, "text": "hello", "site": "s1", "lang": "en"},
        {"id": 2, "user_id": 8, "text": "world"},
    ])
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["site"] == "s1"
    assert rows[2]["site"] == "" and rows[2]["text_id"] == 2
    assert dict(df.dtypes)["user_id"] == "bigint"


def test_excel_fixture_gated(spark, tmp_path):
    """openpyxl is not in this image — the reader must fail loudly with the
    parquet-fixture fallback message, not crash obscurely."""
    with pytest.raises(NotImplementedError, match="parquet"):
        read_excel_fixture(spark, str(tmp_path / "fixture.xlsx"))


def test_csv_and_jsonl_roundtrip(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("id,str\n1,alpha\n2,beta\n")
    df = read_csv_corpus(spark, str(p))
    assert {r["str"] for r in df.collect()} == {"alpha", "beta"}

    j = tmp_path / "c.jsonl"
    j.write_text('{"id": 1, "text_id": 1, "text": "t", "user_id": 3, "site": "s", "lang": "en"}\n')
    jdf = read_jsonl_corpus(spark, str(j))
    assert jdf.collect()[0]["user_id"] == 3


@pytest.fixture()
def points(spark):
    return spark.createDataFrame(
        [(i, i % 3, [float(i)] * 2, f"t{i}") for i in range(30)],
        "id long, user_id long, embedding array<float>, text string",
    )


def test_scroll_full_scan_no_cap(points):
    """The reference silently truncated at 100k (/root/reference/app.py:104);
    scroll returns everything for the tenant."""
    got = scroll(points, user_id=1)
    assert got.count() == 10
    assert "embedding" not in got.columns  # with_vectors=False prunes


def test_scroll_keyset_pagination(points):
    page1 = scroll(points, user_id=1, page_size=4).collect()
    assert [r["id"] for r in page1] == [1, 4, 7, 10]
    page2 = scroll(points, user_id=1, page_size=4, after_id=page1[-1]["id"]).collect()
    assert [r["id"] for r in page2] == [13, 16, 19, 22]


def test_scroll_with_vectors(points):
    got = scroll(points, user_id=0, with_vectors=True)
    assert "embedding" in got.columns
