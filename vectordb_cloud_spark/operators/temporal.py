"""Temporal joins Spark lacks natively: as-of join and range join.

Not reference ops (the reference has no joins at all, SURVEY.md §2.3) —
these are the standard time-series/OLAP additions, built per the classic
distributed formulations:

- **as-of join**: union both sides, one window pass per key carries the
  latest right-side payload forward (rows-between running ``last``). One
  shuffle on the key — same cost as a plain equi-join, no per-row probing.
- **range join**: bucketize the range dimension; each range row explodes to
  the buckets it covers, point rows map to one bucket, equi-join on bucket
  then exact BETWEEN filter. Turns an O(|L|·|R|) theta join into an
  equi-join whose fan-out is range_width/bucket_width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of LEFT join: for each left row, the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key.

    The right payload travels as ONE struct so all carried columns come from
    the same matched row. At equal timestamps the right row sorts first
    (inclusive <=). If the right side can hold duplicate (key, ts) rows,
    dedupe it first for deterministic payloads.
    """
    rpay = F.struct(*[F.col(c) for c in right_cols])
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        rpay.alias("__rpay"),
        F.lit(0).alias("__is_left"),
    )
    l2 = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    unioned = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__carry", F.last("__rpay", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1).drop("__ts", "__is_left", "__rpay")
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__carry").getField(c))
    return out.drop("__carry")


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join points to [lo, hi) ranges via bucketization.

    ``ranges`` explodes to one row per covered bucket; points compute a
    single bucket; the equi-join on bucket co-partitions the candidates and
    the exact half-open BETWEEN filter finishes. For a small ranges table
    Spark will broadcast the exploded side automatically.
    """
    rb = ranges.withColumn(
        "__rbucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-12) / bucket_width).cast("long"),
            )
        ),
    )
    pb = points.withColumn("__pbucket", F.floor(F.col(value_col) / bucket_width).cast("long"))
    joined = pb.join(
        rb,
        (F.col("__pbucket") == F.col("__rbucket"))
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col)),
        how,
    )
    return joined.drop("__pbucket", "__rbucket")
