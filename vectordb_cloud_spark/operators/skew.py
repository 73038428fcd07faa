"""Skew mitigation: salting for hot keys.

The reference's data model concentrates rows per tenant ("1000 users,
ever-growing texts", /root/reference/README.md:22) — at 100 TB a handful of
hot tenants would stall a shuffle on user_id. AQE's skew-join splitting
(enabled in session.py) handles joins at runtime; these helpers cover the
cases AQE doesn't: skewed *aggregations* and broadcast-averse skewed joins.

- salted_agg: two-phase aggregate — key+salt partial, then key final. The
  hot key's rows spread over ``n_salts`` reducers in phase one; phase two
  combines n_salts tiny partials. Works for any algebraic aggregate list.
- salted_join: replicate the small side n_salts times, salt the big side
  uniformly — every (key, salt) shard balances.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform random-ish salt derived from a stable row expression (spark
    partition id + monotonic id), deterministic within a run."""
    return df.withColumn(salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (kind, input_col) with kind in
    {"sum", "count", "min", "max"} (algebraic aggregates that re-combine).

    phase 1 groups by (key, salt): the hot key's traffic splits n_salts ways;
    phase 2 groups by key over n_salts partial rows per key — negligible.
    """
    salted = with_salt(df, n_salts)
    partial_exprs, final_exprs = [], []
    for out, (kind, col) in aggs.items():
        p = f"__p_{out}"
        if kind == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif kind == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate kind {kind!r}")
    phase1 = salted.groupBy(*key_cols, "__salt").agg(*partial_exprs)
    return phase1.groupBy(*key_cols).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side once
    per salt value, join on (key, salt). Shuffle volume for the small side
    grows n_salts×, but the hot key's shard size shrinks n_salts× — the
    trade that unblocks a stalled straggler."""
    bs = with_salt(big, n_salts)
    ss = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "__salt", F.col("__salt").cast("long")
    )
    out = bs.join(ss, [on, "__salt"], how)
    return out.drop("__salt")
