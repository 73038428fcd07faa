"""Corpus sampling for training-data preparation.

Pre-training pipelines don't just filter and dedup — they compose MIXTURES:
sample each source/language/quality stratum at a target rate, possibly
upsampling high-value slices across epochs. These are thin, deterministic
wrappers over Spark's native Bernoulli sampling (`sampleBy` — per-stratum
map-side coin flips, no shuffle) so mixtures stay scan-speed at 100 TB.

All sampling is seeded: the same call on the same data yields the same
corpus — reproducible data recipes, which is the property training runs
actually require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
    default_fraction: float = 0.0,
    max_strata: int = 10_000,
) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. keep 100% of 'en', 30% of 'de').

    Strata absent from ``fractions`` get ``default_fraction`` (0 = drop —
    the allowlist behavior a data recipe usually wants). Map-side only: each
    row flips one seeded coin, no shuffle, the filter composes with scan
    pruning.

    ``default_fraction > 0`` needs the distinct strata keys driver-side
    (``sampleBy`` takes an explicit per-key map), which is only sane for
    bounded-cardinality strata (language, source, quality bucket). The
    collect is guarded by ``max_strata``: above it, the call fails fast with
    guidance instead of silently hauling millions of keys to the driver at
    100 TB. A UNIFORM default rate over unbounded strata doesn't need
    per-key coins — use ``docs.sample(default_fraction)`` plus this
    function's allowlist for the named strata instead.
    """
    if default_fraction > 0:
        # limit+1 bounds the driver transfer regardless of true cardinality
        keys = [
            r[0]
            for r in docs.select(strata_col).distinct().limit(max_strata + 1).collect()
        ]
        if len(keys) > max_strata:
            raise ValueError(
                f"stratified_sample with default_fraction>0 collects distinct "
                f"'{strata_col}' keys to the driver, but there are more than "
                f"max_strata={max_strata}. Use a bounded strata column, raise "
                f"max_strata explicitly, or sample unlisted strata uniformly "
                f"with docs.sample({default_fraction}) instead."
            )
        fractions = {**{k: default_fraction for k in keys}, **fractions}
    bad = {k: v for k, v in fractions.items() if not 0.0 <= v <= 1.0}
    if bad:
        raise ValueError(f"fractions must be in [0,1]: {bad}")
    return docs.sampleBy(strata_col, fractions, seed=seed)


def weighted_mixture(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Compose a training mixture from named sources with relative weights.

    Each source is downsampled so realized row counts match the weight
    ratios (the largest weight-to-size ratio keeps 100% and the others
    scale down — no source is oversampled, so the result stays a true
    subset). Adds a ``__source`` column for provenance. Sizes come from one
    count per source; the sampling itself is map-side.
    """
    missing = set(weights) - set(sources)
    if missing:
        raise ValueError(f"weights reference unknown sources: {sorted(missing)}")
    active = {k: w for k, w in weights.items() if w > 0}
    if not active:
        raise ValueError("all weights are zero — nothing to mix")
    # zero-weight sources contribute nothing: skip their count jobs entirely
    sizes = {name: sources[name].count() for name in active}
    if any(n == 0 for n in sizes.values()):
        empty = [k for k, n in sizes.items() if n == 0]
        raise ValueError(f"empty sources cannot be weighted: {empty}")
    # scale so the most-constrained source is kept whole
    scale = min(sizes[k] / active[k] for k in active)
    parts = []
    for name, w in active.items():
        frac = min(1.0, (w * scale) / sizes[name])
        df = sources[name].withColumn("__source", F.lit(name))
        parts.append(df.sample(fraction=frac, seed=seed) if frac < 1.0 else df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hash_shard(docs: DataFrame, n_shards: int, id_col: str = "doc_id",
               shard_col: str = "shard") -> DataFrame:
    """Stable hash sharding: the same id always lands in the same shard
    regardless of partitioning or row order — the property that makes
    training-data shards reproducible and resumable. Write with
    ``partitionBy(shard_col)`` for one directory per shard."""
    return docs.withColumn(
        shard_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )


def token_share_fractions(
    docs: DataFrame,
    target_shares: dict[str, float],
    domain_col: str = "lang",
    token_expr=None,
) -> dict[str, float]:
    """Per-domain keep-fractions that realize a target TOKEN distribution.

    Training mixtures are specified in token share ("30% code, 20%
    multilingual"), but sampling operates on rows — and domains have very
    different tokens-per-doc, so row-weighted mixing (``weighted_mixture``)
    does not hit token targets. This computes, from one aggregate over the
    corpus, the Bernoulli fraction per domain such that expected sampled
    tokens match ``target_shares`` (normalized), scaled so the most
    token-constrained domain is kept whole and nothing is oversampled.

    Driver-side state is one row per domain (mixtures name a handful of
    domains, never high-cardinality — same bound as ``weighted_mixture``).
    Domains absent from ``target_shares`` get fraction 0.0 (dropped).
    """
    if token_expr is None:
        token_expr = F.size(F.split(F.col("text"), r"\s+"))
    shares = {k: v for k, v in target_shares.items() if v > 0}
    if not shares:
        raise ValueError("all target shares are zero — nothing to mix")
    total_share = sum(shares.values())
    shares = {k: v / total_share for k, v in shares.items()}
    tokens = {
        r["__d"]: r["__t"]
        for r in docs.filter(F.col(domain_col).isin(list(shares)))
        .groupBy(F.col(domain_col).alias("__d"))
        .agg(F.sum(token_expr).alias("__t"))
        .collect()
    }
    missing = set(shares) - set(tokens)
    if missing:
        raise ValueError(f"domains with no tokens in corpus: {sorted(missing)}")
    # largest feasible total token budget: the domain with the smallest
    # tokens-per-share ratio caps the mixture (kept at fraction 1.0)
    budget = min(tokens[d] / shares[d] for d in shares)
    return {d: min(1.0, (shares[d] * budget) / tokens[d]) for d in shares}


def mixture_by_token_share(
    docs: DataFrame,
    target_shares: dict[str, float],
    domain_col: str = "lang",
    token_expr=None,
    seed: int = 42,
) -> DataFrame:
    """Sample ``docs`` so expected token mass per domain matches
    ``target_shares``: plan fractions with ``token_share_fractions``, then
    one map-side seeded ``sampleBy`` — no shuffle, reproducible."""
    fracs = token_share_fractions(docs, target_shares, domain_col, token_expr)
    return docs.sampleBy(domain_col, fracs, seed=seed)


def temperature_shares(
    docs: DataFrame,
    alpha: float = 0.3,
    domain_col: str = "lang",
    token_expr=None,
) -> dict[str, float]:
    """Temperature-scaled target shares: share(d) ∝ tokens(d)^alpha — the
    multilingual-LM sampling convention (alpha=1 keeps the natural
    distribution, alpha→0 approaches uniform; 0.3 is the published
    mBERT/XLM-R style upweighting of low-resource domains).

    Computes natural token counts in one aggregate (one driver-side row per
    domain, the same bounded-cardinality contract as the other mixture
    helpers) and returns normalized shares to feed
    ``token_share_fractions`` / ``mixture_by_token_share``:

        shares = temperature_shares(docs, alpha=0.3)
        mixed = mixture_by_token_share(docs, shares)
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if token_expr is None:
        token_expr = F.size(F.split(F.col("text"), r"\s+"))
    tokens = {
        r["__d"]: r["__t"]
        for r in docs.filter(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).alias("__d"))
        .agg(F.sum(token_expr).alias("__t"))
        .collect()
    }
    if not tokens:
        raise ValueError(f"no non-null {domain_col!r} values in corpus")
    powered = {d: float(t) ** alpha for d, t in tokens.items()}
    z = sum(powered.values())
    return {d: p / z for d, p in powered.items()}
