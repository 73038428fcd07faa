"""Filter DSL compiler: Qdrant JSON grammar → Spark Column.

Ground truth is computed with plain Python over collected rows, so every
assertion is engine-independent; plan tests assert the compiled predicate
stays JVM-side (no Python eval nodes) and reaches the scan.
"""

import math

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.filters import (
    EARTH_RADIUS_M,
    compile_filter,
    geo_distance_meters_to,
    haversine_meters,
)


@pytest.fixture(scope="module")
def docs(documents):
    return documents.select("doc_id", "text", "lang", "source", "n_chars")


def ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_match_value_and_range(docs):
    spec = {"must": [
        {"key": "lang", "match": {"value": "en"}},
        {"key": "n_chars", "range": {"gte": 100, "lt": 400}},
    ]}
    got = ids(docs.filter(compile_filter(spec)))
    want = sorted(
        r["doc_id"] for r in docs.collect()
        if r["lang"] == "en" and 100 <= r["n_chars"] < 400
    )
    assert got == want and got


def test_match_any_and_except(docs):
    rows = docs.collect()
    spec = {"must": [{"key": "source", "match": {"any": ["web", "wiki"]}}]}
    assert ids(docs.filter(compile_filter(spec))) == sorted(
        r["doc_id"] for r in rows if r["source"] in ("web", "wiki")
    )
    spec = {"must": [{"key": "source", "match": {"except": ["web", "wiki"]}}]}
    assert ids(docs.filter(compile_filter(spec))) == sorted(
        r["doc_id"] for r in rows
        if r["source"] is not None and r["source"] not in ("web", "wiki")
    )


def test_match_text_all_tokens_case_insensitive(docs):
    spec = {"must": [{"key": "text", "match": {"text": "THE data"}}]}
    got = ids(docs.filter(compile_filter(spec)))
    want = sorted(
        r["doc_id"] for r in docs.collect()
        if "the" in r["text"].lower() and "data" in r["text"].lower()
    )
    assert got == want


def test_match_regex_extension(docs):
    spec = {"must": [{"key": "text", "match": {"regex": "[0-9]{3}"}}]}
    import re
    got = ids(docs.filter(compile_filter(spec)))
    want = sorted(r["doc_id"] for r in docs.collect()
                  if re.search(r"[0-9]{3}", r["text"]))
    assert got == want


def test_should_or_and_must_not(docs):
    rows = docs.collect()
    spec = {
        "should": [
            {"key": "lang", "match": {"value": "de"}},
            {"key": "n_chars", "range": {"gt": 900}},
        ],
        "must_not": [{"key": "source", "match": {"value": "web"}}],
    }
    got = ids(docs.filter(compile_filter(spec)))
    want = sorted(
        r["doc_id"] for r in rows
        if (r["lang"] == "de" or r["n_chars"] > 900) and r["source"] != "web"
    )
    assert got == want


def test_min_should(docs):
    rows = docs.collect()
    spec = {"min_should": {"conditions": [
        {"key": "lang", "match": {"value": "en"}},
        {"key": "source", "match": {"value": "web"}},
        {"key": "n_chars", "range": {"gte": 200}},
    ], "min_count": 2}}
    got = ids(docs.filter(compile_filter(spec)))
    want = sorted(
        r["doc_id"] for r in rows
        if sum([r["lang"] == "en", r["source"] == "web",
                r["n_chars"] >= 200]) >= 2
    )
    assert got == want


def test_has_id_and_single_dict_clause(docs):
    spec = {"must": {"has_id": [1, 3, 5]}}
    assert ids(docs.filter(compile_filter(spec, id_col="doc_id"))) == [1, 3, 5]
    assert compile_filter(None) is None
    assert compile_filter({}) is None


def test_nested_boolean_clause(docs):
    rows = docs.collect()
    spec = {"must": [
        {"key": "n_chars", "range": {"gte": 50}},
        {"should": [
            {"key": "lang", "match": {"value": "en"}},
            {"key": "lang", "match": {"value": "de"}},
        ]},
    ]}
    got = ids(docs.filter(compile_filter(spec)))
    want = sorted(
        r["doc_id"] for r in rows
        if r["n_chars"] >= 50 and r["lang"] in ("en", "de")
    )
    assert got == want


def test_is_null_is_empty_values_count(spark):
    df = spark.createDataFrame(
        [(1, None, ["a"]), (2, "x", []), (3, "", ["a", "b", "c"])],
        "id long, s string, arr array<string>",
    )
    assert [r["id"] for r in
            df.filter(compile_filter({"must": [{"is_null": {"key": "s"}}]}))
            .collect()] == [1]
    got = sorted(r["id"] for r in
                 df.filter(compile_filter({"must": [{"is_empty": "s"}]}))
                 .collect())
    assert got == [1, 3]  # null or empty string
    got = sorted(r["id"] for r in df.filter(compile_filter(
        {"must": [{"key": "arr", "values_count": {"gte": 2}}]})).collect())
    assert got == [3]


def test_is_empty_matches_empty_array(spark):
    """Qdrant IsEmpty matches null, empty string, AND empty array — the
    string-cast probe renders an empty array as '[]' (ADVICE r8)."""
    df = spark.createDataFrame(
        [(1, ["a"]), (2, []), (3, None)],
        "id long, arr array<string>",
    )
    got = sorted(r["id"] for r in
                 df.filter(compile_filter({"must": [{"is_empty": "arr"}]}))
                 .collect())
    assert got == [2, 3]


def test_must_not_passes_points_missing_the_field(spark):
    """Qdrant semantics: a condition on a missing/null payload field does
    not MATCH, so must_not must PASS such points instead of null-dropping
    them (ADVICE r8). min_should likewise counts a null condition as 0."""
    df = spark.createDataFrame(
        [(1, True, "en"), (2, False, "de"), (3, None, None)],
        "id long, deleted boolean, lang string",
    )
    spec = {"must_not": [{"key": "deleted", "match": {"value": True}}]}
    got = sorted(r["id"] for r in df.filter(compile_filter(spec)).collect())
    assert got == [2, 3]  # 3 lacks the field -> passes
    # must_not over several conditions: null legs must not poison the OR
    spec = {"must_not": [
        {"key": "deleted", "match": {"value": True}},
        {"key": "lang", "match": {"value": "fr"}},
    ]}
    got = sorted(r["id"] for r in df.filter(compile_filter(spec)).collect())
    assert got == [2, 3]
    # min_should: the null condition counts as not-matched, not NULL-sum
    spec = {"min_should": {"conditions": [
        {"key": "deleted", "match": {"value": False}},
        {"key": "lang", "match": {"value": "de"}},
    ], "min_count": 1}}
    got = sorted(r["id"] for r in df.filter(compile_filter(spec)).collect())
    assert got == [2]


def test_nested_array_of_struct_exists(spark):
    df = spark.createDataFrame(
        [(1, [{"site": "a", "n": 5}, {"site": "b", "n": 1}]),
         (2, [{"site": "b", "n": 9}])],
        "id long, visits array<struct<site:string,n:long>>",
    )
    spec = {"must": [{"nested": {"key": "visits", "filter": {"must": [
        {"key": "site", "match": {"value": "b"}},
        {"key": "n", "range": {"gt": 3}},
    ]}}}]}
    assert [r["id"] for r in df.filter(compile_filter(spec)).collect()] == [2]


def test_dotted_key_struct_field(spark):
    df = spark.createDataFrame(
        [(1, {"meta": {"site": "a"}}), (2, {"meta": {"site": "b"}})],
        "id long, payload struct<meta:struct<site:string>>",
    )
    spec = {"must": [{"key": "payload.meta.site", "match": {"value": "b"}}]}
    assert [r["id"] for r in df.filter(compile_filter(spec)).collect()] == [2]


def test_geo_radius_and_bbox(spark):
    pts = [
        (1, 48.8566, 2.3522),    # Paris
        (2, 48.8049, 2.1204),    # Versailles (~20 km)
        (3, 51.5074, -0.1278),   # London (~344 km)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double") \
        .withColumn("loc", F.struct("lat", "lon"))
    spec = {"must": [{"key": "loc", "geo_radius": {
        "center": {"lat": 48.8566, "lon": 2.3522}, "radius": 50_000}}]}
    assert sorted(r["id"] for r in
                  df.filter(compile_filter(spec)).collect()) == [1, 2]
    spec = {"must": [{"key": "loc", "geo_bounding_box": {
        "top_left": {"lat": 52.0, "lon": -1.0},
        "bottom_right": {"lat": 51.0, "lon": 1.0}}}]}
    assert [r["id"] for r in df.filter(compile_filter(spec)).collect()] == [3]
    # distance column matches the reference haversine formula
    got = df.filter(F.col("id") == 3).select(
        geo_distance_meters_to(F.col("loc"), 48.8566, 2.3522).alias("d")
    ).first()["d"]

    def hav(lat1, lon1, lat2, lon2):
        p = math.pi / 180
        a = (math.sin((lat2 - lat1) * p / 2) ** 2
             + math.cos(lat1 * p) * math.cos(lat2 * p)
             * math.sin((lon2 - lon1) * p / 2) ** 2)
        return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))

    assert got == pytest.approx(hav(51.5074, -0.1278, 48.8566, 2.3522),
                                rel=1e-9)


def test_compiled_filter_is_jvm_only_and_pushed(docs):
    spec = {"must": [
        {"key": "lang", "match": {"value": "en"}},
        {"key": "n_chars", "range": {"gte": 100}},
    ]}
    plan = docs.filter(compile_filter(spec))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # simple conjuncts reach the parquet scan as pushed filters
    scan = docs.filter(compile_filter(spec))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters" in scan or "Filter" in scan


def test_errors():
    with pytest.raises(ValueError):
        compile_filter({"unknown_clause": []})
    with pytest.raises(ValueError):
        compile_filter({"must": [{"key": "x"}]})
    with pytest.raises(ValueError):
        compile_filter({"must": [{"key": "x", "range": {}}]})
    with pytest.raises(ValueError):
        compile_filter({"must": [{"key": "x", "match": {"bogus": 1}}]})


def test_haversine_known_distance(spark):
    # Paris -> London great-circle ≈ 343.5 km
    d = spark.range(1).select(haversine_meters(
        F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
    ).alias("d")).first()["d"]
    assert 340_000 < d < 348_000


def test_match_text_pure_punctuation_substring_fallback(spark):
    """A query the word tokenizer reduces to ZERO tokens ('!!!') must fall
    back to one raw substring match, not lit(True) — under must_not,
    match-all would exclude EVERY row (r11 review). A genuinely empty
    query stays vacuously true (zero tokens to require), matching the
    match.tokens branch."""
    df = spark.createDataFrame(
        [(1, "wow !!! loud"), (2, "quiet text")], "doc_id long, text string")
    spec = {"must": [{"key": "text", "match": {"text": "!!!"}}]}
    assert ids(df.filter(compile_filter(spec))) == [1]
    spec_not = {"must_not": [{"key": "text", "match": {"text": "!!!"}}]}
    assert ids(df.filter(compile_filter(spec_not))) == [2]
    spec_empty = {"must": [{"key": "text", "match": {"text": "   "}}]}
    assert df.filter(compile_filter(spec_empty)).count() == 2
