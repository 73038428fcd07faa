"""Composed curation pipeline: filters + exact dedup + near-dup dedup over
a corpus with planted junk and duplicates."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.pipeline import corpus_report, curate_corpus


@pytest.fixture(scope="module")
def messy_corpus(spark, documents):
    base = documents.select("doc_id", "text")
    # exact duplicates (re-keyed copies) + junk rows that must be filtered
    dups = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    junk = spark.createDataFrame(
        [(900001, "x"), (900002, "!!! ??? ..."), (900003, "a b")],
        "doc_id long, text string",
    )
    return base.unionByName(dups).unionByName(junk).cache()


def test_curate_removes_junk_and_exact_dups(messy_corpus):
    curated = curate_corpus(messy_corpus, near_dup=False, min_quality=0.2, min_tokens=5)
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    # junk rows fail the token/quality floors
    assert not ids & {900001, 900002, 900003}
    # every re-keyed duplicate loses to its lower-id original
    assert not {i + 500000 for i in range(10)} & ids
    assert {0, 1, 2}.issubset(ids)
    # audit columns attached
    assert {"quality", "n_tokens", "lang_pred", "fingerprint"}.issubset(set(curated.columns))


def test_curate_scrub_pii_redacts_before_fingerprint(spark):
    """scrub_pii=True must redact secrets in the surviving text AND make
    redaction-identical docs exact-dedup together (fingerprint runs on the
    scrubbed text)."""
    rows = [
        (1, "reach me at alice@example.com about the large distributed query engine"),
        (2, "reach me at bob@elsewhere.org about the large distributed query engine"),
        (3, "a completely unrelated document describing shuffle partitioning basics"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate_corpus(docs, near_dup=False, min_quality=None, min_tokens=3,
                            scrub_pii=True)
    got = {r["doc_id"]: r["text"] for r in curated.select("doc_id", "text").collect()}
    assert all("@" not in t for t in got.values())
    # docs 1 and 2 become identical after redaction -> lower id survives
    assert set(got) == {1, 3}
    assert "[PII]" in got[1]
    # audit struct attached
    assert "__pii" in curated.columns


def test_curate_near_dup_stage_drops_paraphrases(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then runs far away home"),
        (2, "the quick brown fox jumps over the lazy dog and then runs far away house"),  # near-dup of 1
        (3, "completely different text about distributed query engines and shuffles today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate_corpus(docs, min_quality=None, min_tokens=None,
                            near_dup=True, jaccard_threshold=0.5)
    ids = {r["doc_id"] for r in curated.collect()}
    assert ids == {1, 3}  # canonical kept, paraphrase dropped, unrelated kept


def test_pipeline_column_pruning_reaches_scan(spark, sf_dir):
    """The composed plan must read only the columns the pipeline uses from
    parquet — pruning survives the full filter+dedup composition."""
    from vectordb_cloud_spark.plans.inspect import read_schema_columns

    spark.catalog.clearCache()  # cached fixture scans would hide the ReadSchema
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    narrow = curate_corpus(docs, near_dup=False).select("doc_id", "n_tokens")
    cols = read_schema_columns(narrow)
    # only the id + the text that derives every filter/annotation are read;
    # unused payload columns (lang, source, n_chars) never leave parquet
    assert cols and set(cols).issubset({"doc_id", "text"})


def test_corpus_report_one_row(messy_corpus):
    rep = corpus_report(messy_corpus).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_docs"] == messy_corpus.count()
    assert r["total_tokens"] > 0 and 0.0 <= r["mean_quality"] <= 1.0
    assert sum(r["lang_mix"].values()) == r["n_docs"]
    assert r["pii_docs"] >= 0


def test_corpus_report_pii_counter_and_scrub_roundtrip(spark):
    rows = [
        (1, "mail me at leak@example.com today"),
        (2, "nothing sensitive in this document at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert corpus_report(docs).collect()[0]["pii_docs"] == 1
    scrubbed = curate_corpus(docs, near_dup=False, min_quality=None,
                             min_tokens=1, scrub_pii=True)
    assert corpus_report(scrubbed).collect()[0]["pii_docs"] == 0


def test_build_training_set_end_to_end(spark, documents):
    """Recipe capstone: curate -> sample -> shard -> pack, deterministic,
    with every pack honoring the budget and every packed doc in a shard."""
    from vectordb_cloud_spark.pipeline import build_training_set

    sharded, packs = build_training_set(
        documents,
        lang_fractions={"en": 1.0, "de": 1.0, "fr": 1.0, "es": 1.0, "und": 1.0},
        n_shards=4,
        max_tokens=400,
    )
    sharded = sharded.cache()
    assert set(r["shard"] for r in sharded.select("shard").distinct().collect()) <= set(range(4))
    pack_rows = packs.collect()
    assert pack_rows and all(r["total_tokens"] <= 400 for r in pack_rows)
    packed_ids = {i for r in pack_rows for i in r["doc_ids"]}
    shard_ids = {r["doc_id"] for r in sharded.collect()}
    assert packed_ids <= shard_ids
    # reproducibility: same recipe -> same shards and packs
    sharded2, packs2 = build_training_set(
        documents,
        lang_fractions={"en": 1.0, "de": 1.0, "fr": 1.0, "es": 1.0, "und": 1.0},
        n_shards=4,
        max_tokens=400,
    )
    assert sorted((r["doc_id"], r["shard"]) for r in sharded2.collect()) == sorted(
        (r["doc_id"], r["shard"]) for r in sharded.collect()
    )
    assert sorted(tuple(r["doc_ids"]) for r in packs2.collect()) == sorted(
        tuple(r["doc_ids"]) for r in pack_rows
    )


def test_curate_with_repetition_and_decontamination_stages(spark):
    """The full filter stack in one call: loopy doc dropped by the
    repetition stage, leaked doc dropped by decontamination, clean doc
    survives both."""
    leak = "the secret benchmark answer is forty two exactly as the eval set says here"
    docs = spark.createDataFrame(
        [
            (1, "a clean and varied document about distributed joins and their many shuffles"),
            (2, " ".join(["buy now click here"] * 12)),
            (3, f"prefix text and then {leak} plus a trailing suffix of words"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame([(9, leak)], "doc_id long, text string")
    curated = curate_corpus(
        docs, min_quality=None, min_tokens=None, near_dup=False,
        max_dup_gram_fraction=0.3, eval_set=eval_set,
    )
    assert {r["doc_id"] for r in curated.collect()} == {1}


def test_curate_corpus_gopher_rules_drop_violators(spark):
    """gopher_rules=True removes rule-battery violators the base quality
    score alone passes (a bullet wall has fine stopword/punct stats)."""
    from vectordb_cloud_spark.pipeline import curate_corpus

    healthy = ("the quick brown fox jumps over a lazy dog and then runs to "
               "the forest with great speed so that every animal can have "
               "some peace of mind during the long warm afternoon hours ") * 3
    bullets = "\n".join(
        "- the item of that list with more of the same and have it" for _ in range(40)
    )
    docs = spark.createDataFrame(
        [(1, healthy), (2, bullets)], "doc_id long, text string")
    base = curate_corpus(docs, min_quality=None, min_tokens=None,
                         near_dup=False)
    assert {r["doc_id"] for r in base.collect()} == {1, 2}
    strict = curate_corpus(docs, min_quality=None, min_tokens=None,
                           gopher_rules=True, near_dup=False)
    assert {r["doc_id"] for r in strict.collect()} == {1}


def test_curate_corpus_line_dedup_stage(spark):
    from vectordb_cloud_spark.pipeline import curate_corpus

    banner = "subscribe to our newsletter for the latest updates today"
    docs = spark.createDataFrame(
        [(i, f"{banner}\nthe quick brown fox runs over document number {i} "
             "with plenty of ordinary english words to pass the quality bar")
         for i in range(6)],
        "doc_id long, text string",
    )
    out = curate_corpus(docs, near_dup=False, eval_set=None,
                        line_dedup_min_repeats=3)
    texts = [r["text"] for r in out.collect()]
    assert texts and all(banner not in t for t in texts)
    assert all("quick brown fox" in t for t in texts)


def test_curate_corpus_span_dedup_stage(spark):
    from vectordb_cloud_spark.pipeline import curate_corpus

    passage = " ".join(
        "every large corpus repeats this exact passage of ordinary english "
        "words across many documents and span dedup must cut it".split()
        * 3
    )  # 63 tokens, > window
    docs = spark.createDataFrame(
        [(i, passage + " " +
             " ".join(f"tail{i}word{j}" for j in range(12)))
         for i in range(4)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in
           curate_corpus(docs, near_dup=False, eval_set=None,
                         min_quality=None, min_tokens=None,
                         span_dedup_window=40).collect()}
    assert "every large corpus" in out[0]          # canonical keeps it
    for d in (1, 2, 3):
        assert "every large corpus" not in out[d]  # repeats cut
        assert f"tail{d}word0" in out[d]           # tails survive
