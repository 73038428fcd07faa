"""Mergeable sketch aggregates: pre-aggregate once, re-aggregate forever.

COUNT(DISTINCT) does not decompose — you cannot add yesterday's distinct
count to today's. HyperLogLog sketches do: persist one small binary sketch
per (time bucket, group), then answer any coarser rollup (weekly, monthly,
all-time, cross-group) by UNIONING sketches — no rescan of the raw events.
At 100 TB this converts every "unique users over window X" query from a
full-table shuffle into a scan of a few thousand kilobyte-sized sketches
(the standard warehouse sketch-rollup design; Spark ships Apache DataSketches
HLL as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

Relative error is ~1.04/sqrt(2^lgk): lgConfigK=12 (default) ≈ 1.6%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_count_sketches(
    events: DataFrame,
    time_bucket: str = "day",
    user_col: str = "user_id",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per (time bucket [, group...]) — the persisted rollup
    row. Map-side partial sketches merge in the shuffle, so the exchange
    carries sketch bytes, not user ids."""
    groups = [F.date_trunc(time_bucket, ts_col).alias("bucket")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return events.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(user_col), F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_events"),
    )


def merged_distinct_estimate(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Re-aggregate persisted sketches to any coarser grain: union the
    sketches, then estimate. No raw-data access."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_events").alias("n_events"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)
