"""Grouped anomaly detection over event streams/tables.

Data-quality screening for ingest pipelines: flag values that sit far from
their group's typical range. Two estimators, both single-shuffle:

- ``zscore_outliers``: classic (x − mean)/std per group — cheap, but mean
  and std are themselves dragged by the outliers they should expose.
- ``robust_outliers``: median/MAD — the 50th percentile and the median of
  absolute deviations are insensitive to contamination, the standard robust
  choice. Exact percentiles here (matches the oracle-friendly exact
  semantics used elsewhere); swap in ``approx_percentile`` at cluster scale
  the same way the percentile query documents.

Both return the input rows with a score and a boolean flag; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Flag rows with |z| > threshold within their group. One grouped
    aggregate broadcast back onto the rows (groups are few); zero-variance
    groups flag nothing."""
    stats = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("__mean"),
        F.stddev_samp(value_col).alias("__std"),
    )
    joined = df.join(F.broadcast(stats), on=group_cols)
    z = (F.col(value_col) - F.col("__mean")) / F.col("__std")
    return (
        joined.withColumn("zscore", F.when(F.col("__std") > 0, z).otherwise(F.lit(0.0)))
        .withColumn("is_outlier", F.abs(F.col("zscore")) > threshold)
        .drop("__mean", "__std")
    )


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Median/MAD variant: score = 0.6745·(x − median)/MAD (the 0.6745
    factor rescales MAD to σ under normality, making the threshold
    comparable to a z-score). MAD == 0 (constant-majority groups) flags
    nothing rather than everything."""
    med = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    with_med = df.join(F.broadcast(med), on=group_cols)
    mad = (
        with_med.withColumn("__ad", F.abs(F.col(value_col) - F.col("__med")))
        .groupBy(*group_cols)
        .agg(F.percentile("__ad", F.lit(0.5)).alias("__mad"))
    )
    joined = with_med.join(F.broadcast(mad), on=group_cols)
    score = F.lit(0.6745) * (F.col(value_col) - F.col("__med")) / F.col("__mad")
    return (
        joined.withColumn(
            "robust_score", F.when(F.col("__mad") > 0, score).otherwise(F.lit(0.0))
        )
        .withColumn("is_outlier", F.abs(F.col("robust_score")) > threshold)
        .drop("__med", "__mad", "__ad")
    )
