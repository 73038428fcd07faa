"""Corpus curation pipeline: the training-data flow composed end to end.

The north-star ops (dedup, quality, lang-ID, token accounting) exist as
independent operators; a real 100 TB pre-training pipeline chains them in a
fixed order — cheap row-local filters first (quality/lang prune rows before
any shuffle), exact dedup next (one fingerprint shuffle), near-dup last
(banded LSH join over the already-shrunk corpus, pairs resolved to groups
via connected components). Every stage is declarative DataFrame ops, so the
whole chain is ONE Catalyst plan per materialization: the quality/lang
predicates are derived-column filters (they run inside the scan stage's
codegen, not as parquet PushedFilters), and column pruning reaches the scan
through the whole composition — the parquet read touches only the columns
the pipeline actually uses (asserted in tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.text import (
    doc_fingerprint,
    lang_id_expr,
    quality_score,
    token_count,
)
from vectordb_cloud_spark.operators.dedup import (
    dedup_keep_canonical,
    dedup_keep_first,
    minhash_lsh_pairs,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float | None = 0.3,
    min_tokens: int | None = 5,
    gopher_rules: bool = False,
    langs: list[str] | None = None,
    max_dup_gram_fraction: float | None = None,
    eval_set: DataFrame | None = None,
    decontaminate_n: int = 13,
    decontaminate_fuzzy_threshold: float | None = None,
    near_dup: bool = True,
    jaccard_threshold: float = 0.8,
    scrub_pii: bool = False,
    line_dedup_min_repeats: int | None = None,
    span_dedup_window: int | None = None,
    span_dedup_stride: int = 1,
) -> DataFrame:
    """Filter + dedup a document corpus for training.

    Stage order is the cost order: row-local predicates (quality, token
    floor, language) run in the scan stage and shrink everything downstream;
    the repetition filter is doc-local (one doc-keyed shuffle);
    decontamination joins only against the (broadcast-sized) eval set's gram
    hashes; exact dedup costs one fingerprint shuffle; MinHash near-dup (the
    only corpus-vs-corpus join) runs last over the surviving rows. Returns
    the curated corpus with ``quality``, ``n_tokens``, ``lang_pred`` and
    ``fingerprint`` columns attached for auditability.

    ``scrub_pii=True`` redacts emails/phones/IPs/SSNs/Luhn-valid card
    numbers (functions/pii.py) BEFORE fingerprinting, so secrets never reach
    shards and redaction-identical docs dedup together; still scan-stage
    column algebra, no extra pass.
    """
    if scrub_pii:
        from vectordb_cloud_spark.functions.pii import scrub_corpus

        docs = scrub_corpus(docs, text_col=text_col)
    if line_dedup_min_repeats is not None:
        # cross-doc boilerplate lines go FIRST: they would otherwise
        # inflate quality/token stats and glue unrelated docs together in
        # the n-gram near-dup stage (shared banners = shared shingles)
        from vectordb_cloud_spark.operators.dedup import line_dedup_corpus

        cleaned = line_dedup_corpus(
            docs, min_repeats=line_dedup_min_repeats,
            id_col=id_col, text_col=text_col,
        )
        docs = docs.drop(text_col).join(cleaned, id_col)
    if span_dedup_window is not None:
        # exact-substring dedup after line boilerplate (spans shared only
        # through boilerplate are already gone) and before the stats, so
        # token counts describe the text that actually ships
        from vectordb_cloud_spark.operators.dedup import span_dedup_corpus

        docs = span_dedup_corpus(
            docs, window=span_dedup_window, stride=span_dedup_stride,
            id_col=id_col, text_col=text_col,
        )
    annotated = docs.withColumn("quality", quality_score(text_col)).withColumn(
        "n_tokens", token_count(text_col)
    ).withColumn("lang_pred", lang_id_expr(text_col))
    kept = annotated
    if min_quality is not None:
        kept = kept.filter(F.col("quality") >= min_quality)
    if gopher_rules:
        # the published Gopher SA1.1 battery, still scan-stage (the struct
        # is computed and consumed inside the same filter expression)
        from vectordb_cloud_spark.functions.text import gopher_quality_flags

        kept = kept.filter(gopher_quality_flags(text_col)["passes"])
    if min_tokens is not None:
        kept = kept.filter(F.col("n_tokens") >= min_tokens)
    if langs:
        kept = kept.filter(F.col("lang_pred").isin(list(langs)))
    if max_dup_gram_fraction is not None:
        from vectordb_cloud_spark.operators.repetition import filter_repetitive

        kept = filter_repetitive(
            kept, max_dup_gram_fraction, id_col=id_col, text_col=text_col
        )
    if eval_set is not None:
        if decontaminate_fuzzy_threshold is not None:
            # belt and braces: verbatim n-gram check + MinHash paraphrase
            # check (find_contaminated_fuzzy) in one anti-join pass
            from vectordb_cloud_spark.operators.decontaminate import (
                decontaminate_fuzzy,
            )

            kept = decontaminate_fuzzy(
                kept, eval_set, decontaminate_fuzzy_threshold,
                n=decontaminate_n, train_id=id_col, train_text=text_col,
            )
        else:
            from vectordb_cloud_spark.operators.decontaminate import (
                decontaminate,
            )

            kept = decontaminate(
                kept, eval_set, n=decontaminate_n,
                train_id=id_col, train_text=text_col,
            )
    kept = dedup_keep_first(kept, id_col=id_col, text_col=text_col)
    if near_dup:
        pairs = minhash_lsh_pairs(
            kept, jaccard_threshold=jaccard_threshold,
            id_col=id_col, text_col=text_col,
        )
        kept = dedup_keep_canonical(kept, pairs, id_col=id_col)
    return kept.withColumn("fingerprint", doc_fingerprint(text_col))


def build_training_set(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float | None = 0.3,
    min_tokens: int | None = 5,
    gopher_rules: bool = False,
    lang_fractions: dict | None = None,
    n_shards: int = 16,
    max_tokens: int | None = None,
    seed: int = 42,
):
    """The full data recipe: curate → (optional) per-language sampling →
    stable sharding → (optional) sequence packing.

    Returns ``(sharded_docs, packs_or_None)``. Every stage is seeded and
    deterministic — identical inputs produce identical shards and packs,
    which is what makes a training corpus reproducible. Write
    ``sharded_docs`` with ``partitionBy("shard")`` for one directory per
    shard.
    """
    from vectordb_cloud_spark.operators.packing import pack_sequences
    from vectordb_cloud_spark.operators.sampling import hash_shard, stratified_sample

    curated = curate_corpus(
        docs, id_col=id_col, text_col=text_col,
        min_quality=min_quality, min_tokens=min_tokens,
        gopher_rules=gopher_rules,
    )
    if lang_fractions:
        curated = stratified_sample(curated, "lang_pred", lang_fractions, seed=seed)
    sharded = hash_shard(curated, n_shards, id_col=id_col)
    packs = None
    if max_tokens:
        packs = pack_sequences(
            sharded, max_tokens, id_col=id_col, text_col=text_col,
            tokens_col="n_tokens", drop_oversize=True,
        )
    return sharded, packs


def corpus_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary (docs, tokens, mean quality, language mix,
    PII leakage) — the acceptance artifact for a curation run. One grouped
    pass builds the language mix; the totals re-aggregate from the
    per-language partials instead of rescanning the corpus. ``pii_docs``
    counts documents still containing any detectable PII — 0 is the
    expected value after a ``scrub_pii=True`` curation."""
    from vectordb_cloud_spark.functions.pii import PII_PATTERNS, pii_counts

    pii = pii_counts(text_col)
    # iterate the pattern registry (not a hardcoded list) so a new PII kind
    # is counted here automatically
    any_pii = sum(
        (F.coalesce(pii[k], F.lit(0)) for k in PII_PATTERNS),
        F.lit(0),
    ) > 0
    per_lang = docs.groupBy(lang_id_expr(text_col).alias("lang_pred")).agg(
        F.count("*").alias("n"),
        F.sum(token_count(text_col)).alias("toks"),
        F.sum(quality_score(text_col)).alias("q_sum"),
        F.sum(any_pii.cast("long")).alias("pii_n"),
    )
    return per_lang.agg(
        F.sum("n").alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
        F.round(F.sum("q_sum") / F.sum("n"), 4).alias("mean_quality"),
        F.sum("pii_n").alias("pii_docs"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("lang_pred", "n")))
        ).alias("lang_mix"),
    )
