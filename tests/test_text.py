"""Text-analysis expressions: deterministic values on known inputs."""

from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.embedding import mock_embed, mock_vector
from vectordb_cloud_spark.functions.text import (
    bpe_token_estimate,
    doc_fingerprint,
    lang_id_expr,
    ngram_shingles,
    quality_score,
    token_count,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count("text")) == 3
    assert _one(spark, "   ", token_count("text")) == 0
    assert _one(spark, "one", token_count("text")) == 1


def test_fingerprint_normalizes(spark):
    a = _one(spark, "Hello  World", doc_fingerprint("text"))
    b = _one(spark, "hello world", doc_fingerprint("text"))
    c = _one(spark, "hello worlds", doc_fingerprint("text"))
    assert a == b and a != c


def test_ngram_shingles(spark):
    got = _one(spark, "a b c d", ngram_shingles("text", 3))
    assert got == ["a b c", "b c d"]
    got = _one(spark, "a b", ngram_shingles("text", 3))
    assert got == ["a b"]


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog is here", lang_id_expr("text")) == "en"
    assert _one(spark, "der Hund und die Katze ist da", lang_id_expr("text")) == "de"
    assert _one(spark, "xyz qqq zzz", lang_id_expr("text")) == "und"


def test_quality_score_bounds(spark, documents):
    stats = documents.select(quality_score("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_bpe_estimate_monotonic_in_length(spark):
    short = _one(spark, "hi there", bpe_token_estimate("text"))
    long = _one(spark, "hi there " * 50, bpe_token_estimate("text"))
    assert long > short > 0


def test_mock_embedder_deterministic(spark):
    df = spark.createDataFrame([("hello world",), ("hello world",), ("other",)], "text string")
    vecs = df.select(mock_embed("text", 16).alias("v")).collect()
    assert vecs[0]["v"] == vecs[1]["v"]
    assert vecs[0]["v"] != vecs[2]["v"]
    assert len(vecs[0]["v"]) == 16
    # driver-side helper agrees with the distributed UDF
    assert vecs[0]["v"] == [float(x) for x in mock_vector("hello world", 16)]


def test_mock_embedder_truncates_at_128_tokens(spark):
    """Reference truncation contract (/root/reference/insert.py:21)."""
    base = " ".join(f"w{i}" for i in range(128))
    extended = base + " extra tokens beyond the cap"
    a = mock_vector(base, 8)
    b = mock_vector(extended, 8)
    assert a == b


class TestGopherQualityFlags:
    """Each Gopher rule trips on a crafted violator and passes on healthy
    prose; `passes` is the AND of all."""

    def _flags(self, spark, text, **kw):
        from vectordb_cloud_spark.functions.text import gopher_quality_flags

        df = spark.createDataFrame([(text,)], "text string")
        return df.select(gopher_quality_flags("text", **kw).alias("g")).first()["g"]

    def _healthy(self):
        base = ("the quick brown fox jumps over a lazy dog and then runs to "
                "the forest with great speed so that every animal can have "
                "some peace of mind during the long warm afternoon hours ")
        return base * 3  # ~100 words, prose-shaped

    def test_healthy_prose_passes_all(self, spark):
        g = self._flags(spark, self._healthy())
        assert all(g[k] for k in g.asDict())

    def test_too_short_fails_word_count_only_that_rule(self, spark):
        g = self._flags(spark, "the cat sat with that hat of mine and left")
        assert not g["word_count_ok"] and not g["passes"]
        assert g["stopwords_ok"]

    def test_symbol_soup_fails_symbol_ratio(self, spark):
        g = self._flags(spark, self._healthy() + " #tag " * 30)
        assert not g["symbol_ratio_ok"] and not g["passes"]

    def test_bullet_wall_fails_bullet_fraction(self, spark):
        doc = "\n".join("- item number " + str(i) for i in range(40))
        g = self._flags(spark, doc, min_words=10)
        assert not g["bullet_lines_ok"] and not g["passes"]

    def test_ellipsis_teasers_fail_ellipsis_fraction(self, spark):
        doc = "\n".join(
            ("the story continues with more of that..." if i % 2 == 0 else
             "a normal line of prose that have an end with the word")
            for i in range(20)
        )
        g = self._flags(spark, doc, min_words=10)
        assert not g["ellipsis_lines_ok"] and not g["passes"]

    def test_numeric_noise_fails_alpha_fraction(self, spark):
        g = self._flags(spark, self._healthy() + " 12345 " * 120)
        assert not g["alpha_words_ok"] and not g["passes"]

    def test_no_english_stopwords_fails_stopword_rule(self, spark):
        doc = " ".join(f"zanzibar{i} kilimanjaro{i}" for i in range(40))
        g = self._flags(spark, doc)
        assert not g["stopwords_ok"] and not g["passes"]

    def test_plan_is_jvm_only(self, spark):
        from vectordb_cloud_spark.functions.text import gopher_quality_flags
        from vectordb_cloud_spark.plans.inspect import explain_str

        df = spark.createDataFrame([("some text",)], "text string")
        plan = explain_str(
            df.select(gopher_quality_flags("text").alias("g")), mode="simple")
        assert not any(tok in plan for tok in
                       ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))
