"""Text-analysis column expressions for large-scale corpus pipelines.

These are north-star extensions (BASELINE.json: "text analysis at scale"),
not reference ports — the reference's only text ops are substring/regex
predicates (/root/reference/app.py:108-110,134-136). Everything here is a
built-in-function composition (JVM-side, whole-stage codegen'd); no UDFs, so
the expressions survive a 100-TB scan at full scan speed and are exactly
reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the heuristic language ID.
# Deliberately small + deterministic (this is an n-gram/stopword heuristic,
# not a model): each hit votes for its language.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}

_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empty array for blank text)."""
    t = F.trim(_c(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def word_tokens(col: Column | str) -> Column:
    """Qdrant's default ``word`` tokenizer: lowercase, split on every
    non-alphanumeric character (Unicode letters + digits are the word
    chars), empties dropped. This is what an INDEXED MatchText field
    tokenizes with — ``"hello, world!"`` -> ``["hello", "world"]`` — so a
    query token matches through trailing punctuation. Driver-side twin:
    :func:`vectordb_cloud_spark.functions.hashing.word_tokens_py`
    (parity-tested)."""
    return F.array_remove(
        F.split(F.lower(_c(col)), r"[^\p{L}\p{N}]+"), "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the cheap proxy; see ``bpe_token_estimate``
    for the BPE-ish variant)."""
    return F.size(words(col)).cast("long")


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token estimate: count regex word-pieces (runs of letters,
    digits, or single punctuation), then add ceil(chars/4) weighting for long
    words — a deterministic stand-in for a real tokenizer's subword count.
    """
    t = _c(col)
    pieces = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    long_chars = F.length(F.regexp_replace(t, r"\b\w{1,4}\b|\s", ""))
    return (pieces + F.floor(long_chars / F.lit(4))).cast("long")


def stopword_ratio(col: Column | str) -> Column:
    w = words(col)
    stop = F.filter(w, lambda x: F.lower(x).isin(_STOPWORDS))
    n = F.size(w)
    return F.when(n == 0, F.lit(0.0)).otherwise(F.size(stop) / n.cast("double"))


def punct_ratio(col: Column | str) -> Column:
    t = _c(col)
    n = F.length(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n.cast("double"))


def mean_word_length(col: Column | str) -> Column:
    w = words(col)
    n = F.size(w)
    total = F.aggregate(F.transform(w, F.length), F.lit(0), lambda a, b: a + b)
    return F.when(n == 0, F.lit(0.0)).otherwise(total / n.cast("double"))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality score in [0, 1]: rewards mid-length docs,
    healthy stopword presence, and low punctuation density. Deterministic
    arithmetic only — reproducible in ANSI SQL for the oracle.
    """
    n_tokens = token_count(col).cast("double")
    length_term = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * F.lit(4.0))
    return F.round((length_term + stop_term + punct_term) / F.lit(3.0), 6)


def lang_id_expr(col: Column | str) -> Column:
    """Heuristic language ID: count stopword-marker hits per language, pick
    the argmax (ties broken by language code order), 'und' when no marker
    hits. A CASE/greatest composition — no UDF.
    """
    w = F.transform(words(col), F.lower)

    def _hit_count(markers):
        # factory keeps the predicate unary (a 2-arg lambda means (elem, idx))
        return F.size(F.filter(w, lambda x: x.isin(markers)))

    scores = {lang: _hit_count(markers) for lang, markers in _LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # Reverse order so earlier language codes win ties.
    for lang in sorted(scores, reverse=True):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    Content-addressed identity — the Spark analog of the reference's
    uuid3(NAMESPACE_DNS, text) ids (/root/reference/test_qdrant.py:55)."""
    normalized = F.concat_ws(" ", words(F.lower(_c(col))))
    return F.md5(normalized)


def ngram_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array (for MinHash / Jaccard dedup)."""
    w = words(col)
    k = F.size(w)
    return F.when(k < n, F.array(F.concat_ws(" ", w))).otherwise(
        F.transform(
            F.sequence(F.lit(1), k - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-grams of the normalized text."""
    t = F.concat_ws(" ", words(F.lower(_c(col))))
    k = F.length(t)
    return F.when(k < n, F.array(t)).otherwise(
        F.transform(F.sequence(F.lit(1), k - F.lit(n - 1)), lambda i: F.substring(t, i, n))
    )


# ---------------------------------------------------------------------------
# Gopher document-quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1 — the published
# rule battery most large-corpus pipelines start from). Each rule is a
# boolean column; everything is fused scan-stage column algebra.
# ---------------------------------------------------------------------------

_GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
) -> Column:
    """Struct of the Gopher quality-rule booleans plus the combined verdict.

    Fields: ``word_count_ok`` (50..100k words), ``mean_word_len_ok``
    (3..10 chars), ``symbol_ratio_ok`` (hash/ellipsis per word < 0.1),
    ``bullet_lines_ok`` (< 90% of lines bullet-led), ``ellipsis_lines_ok``
    (< 30% of lines ellipsis-ended), ``alpha_words_ok`` (≥ 80% of words
    contain a letter), ``stopwords_ok`` (≥ 2 of the/be/to/of/and/that/
    have/with), and ``passes`` = AND of all. The repetition side of
    Gopher's battery (duplicate line/paragraph/n-gram fractions) lives in
    ``operators.repetition`` — combine both for the full filter.
    """
    t = _c(col)
    w = words(col)
    n_words = F.size(w)
    nz = F.greatest(n_words, F.lit(1)).cast("double")

    word_count_ok = (n_words >= min_words) & (n_words <= max_words)
    mwl = mean_word_length(col)
    mean_word_len_ok = (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
    n_symbols = (F.regexp_count(t, F.lit(r"#"))
                 + F.regexp_count(t, F.lit(r"\.\.\.|…")))
    symbol_ratio_ok = (n_symbols / nz) < max_symbol_word_ratio
    lines = F.split(t, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"^([•‣◦\-\*] )")
    ))
    bullet_lines_ok = (bullet_lines / n_lines) < max_bullet_line_frac
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")
    ))
    ellipsis_lines_ok = (ellipsis_lines / n_lines) < max_ellipsis_line_frac
    alpha_words = F.size(F.filter(w, lambda x: x.rlike(r"[A-Za-z]")))
    alpha_words_ok = (alpha_words / nz) >= min_alpha_word_frac
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in _GOPHER_REQUIRED_STOPWORDS]),
        lambda s: F.array_contains(F.transform(w, F.lower), s),
    ))
    stopwords_ok = stop_hits >= min_required_stopwords

    passes = (word_count_ok & mean_word_len_ok & symbol_ratio_ok
              & bullet_lines_ok & ellipsis_lines_ok & alpha_words_ok
              & stopwords_ok)
    return F.struct(
        word_count_ok.alias("word_count_ok"),
        mean_word_len_ok.alias("mean_word_len_ok"),
        symbol_ratio_ok.alias("symbol_ratio_ok"),
        bullet_lines_ok.alias("bullet_lines_ok"),
        ellipsis_lines_ok.alias("ellipsis_lines_ok"),
        alpha_words_ok.alias("alpha_words_ok"),
        stopwords_ok.alias("stopwords_ok"),
        passes.alias("passes"),
    )
