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


def _write_min_xlsx(path):
    """Hand-assemble a spec-minimal xlsx (zip of XML parts) mirroring the
    reference fixture's shape: input_1 + Queries_for_input_1 sheets of
    (id, str) — shared strings, an inline string, a skipped (sparse) cell,
    and a float. No openpyxl anywhere."""
    import zipfile

    m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    workbook = (
        f'<workbook xmlns="{m}" xmlns:r="{r}"><sheets>'
        '<sheet name="input_1" sheetId="1" r:id="rId1"/>'
        '<sheet name="Queries_for_input_1" sheetId="2" r:id="rId2"/>'
        "</sheets></workbook>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="x" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    shared = (
        f'<sst xmlns="{m}" count="4" uniqueCount="4">'
        "<si><t>id</t></si><si><t>str</t></si>"
        "<si><t>hello world</t></si><si><t>vector search</t></si></sst>"
    )
    sheet1 = (
        f'<worksheet xmlns="{m}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>2</v></c></row>'
        '<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="inlineStr"><is><t>inline text</t></is></c></row>'
        '<row r="4"><c r="B4" t="s"><v>3</v></c></row>'  # sparse: A4 missing
        "</sheetData></worksheet>"
    )
    sheet2 = (
        f'<worksheet xmlns="{m}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>1.5</v></c><c r="B2" t="str"><v>formula cached</v></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_excel_fixture_stdlib_reader(spark, tmp_path):
    """S3 without openpyxl: the stdlib zip+XML parser must read the
    reference-shaped multi-sheet fixture with typed columns."""
    p = tmp_path / "fixture.xlsx"
    _write_min_xlsx(str(p))
    sheets = read_excel_fixture(spark, str(p))
    assert set(sheets) == {"input_1", "Queries_for_input_1"}
    s1 = sheets["input_1"]
    assert s1.columns == ["id", "str"]
    assert dict(s1.dtypes)["id"] == "bigint"  # all-int column -> long
    rows = {r["str"]: r["id"] for r in s1.collect()}
    assert rows == {"hello world": 1, "inline text": 2, "vector search": None}
    s2 = sheets["Queries_for_input_1"]
    assert dict(s2.dtypes)["id"] == "double"  # 1.5 -> double
    assert s2.collect()[0]["str"] == "formula cached"


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


def test_scroll_order_by_keyset_pagination(spark):
    """Qdrant scroll order_by: (key, id) keyset pages cover every row
    exactly once even when many rows share the order key."""
    from vectordb_cloud_spark.sources.readers import scroll

    rows = [(i, 1, f"t{i}", int(i % 3)) for i in range(23)]
    df = spark.createDataFrame(rows, "id long, user_id long, text string, rank long")

    seen = []
    after_key = after_id = None
    while True:
        page = scroll(df, 1, page_size=5, order_by="rank",
                      after_key=after_key, after_id=after_id).collect()
        if not page:
            break
        seen.extend((r["rank"], r["id"]) for r in page)
        after_key, after_id = page[-1]["rank"], page[-1]["id"]
    assert seen == sorted(seen)  # lexicographic (rank, id) walk
    assert sorted(i for _, i in seen) == list(range(23))  # no gaps, no dups


def test_random_sample_deterministic_and_seed_sensitive(spark):
    from vectordb_cloud_spark.sources.readers import random_sample

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    s1 = [r["doc_id"] for r in random_sample(df, 20, seed=1, id_col="doc_id").collect()]
    s1b = [r["doc_id"] for r in random_sample(df, 20, seed=1, id_col="doc_id").collect()]
    s2 = [r["doc_id"] for r in random_sample(df, 20, seed=2, id_col="doc_id").collect()]
    assert s1 == s1b                      # same seed replays exactly
    assert len(set(s1)) == 20
    assert set(s1) != set(s2)             # different seed re-deals
    assert s1 != sorted(s1) or s2 != sorted(s2)  # not just a prefix of ids
    # plan: top-n heap, not a global sort
    plan = random_sample(df, 20, seed=1, id_col="doc_id")._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_random_sample_bounds(spark):
    import pytest as _pytest

    from vectordb_cloud_spark.sources.readers import random_sample

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    assert random_sample(df, 100, id_col="doc_id").count() == 5
    assert random_sample(df, 0, id_col="doc_id").count() == 0
    with _pytest.raises(ValueError):
        random_sample(df, -1, id_col="doc_id")
