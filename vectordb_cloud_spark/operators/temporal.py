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


def scd2_snapshot(
    changelog: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change log.

    Input: one row per observed (key, ts, attrs) state. Output: one row per
    VERSION — consecutive identical attribute states collapse into one
    validity interval — with ``valid_from`` / ``valid_to`` (null = open) and
    ``is_current``. This is the standard CDC -> dimension-table shape a
    training-data pipeline needs for point-in-time-correct metadata joins
    (what was this source's license/quality tier when the doc was crawled?).

    Plan: two window passes over one shuffle on ``key`` (change detection
    via ``lag``, interval close via ``lead``) — no self-join, no Python.
    Ties on (key, ts) are broken by the attribute struct so the result is
    deterministic on any input.
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), attrs.asc())
    changed = (
        changelog
        .withColumn("__prev", F.lag(attrs).over(w))
        # first row per key or any attribute change starts a new version
        .withColumn(
            "__new_version",
            # eqNullSafe: a null attribute field must still compare (a
            # change from NULL to a value is a real change, not a no-op)
            ~attrs.eqNullSafe(F.col("__prev")),
        )
        .filter(F.col("__new_version"))
        .drop("__prev", "__new_version")
    )
    w2 = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), attrs.asc())
    return (
        changed
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(ts_col)
    )


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Apply a new change batch to an existing SCD2 dimension.

    Rebuilds affected keys only: every version row of a touched key is
    turned back into a change event (``valid_from`` + attrs), unioned with
    the incoming batch, and re-versioned through ``scd2_snapshot`` — so a
    change identical to the adjacent state is a no-op and out-of-order /
    late-arriving changes slot into the correct interval, including before
    the current version. Untouched keys pass through with no shuffle — the
    common case when a batch touches a tiny fraction of a 100 TB dimension
    (semi/anti joins on the broadcast-able touched-key set).

    Information note: the dimension is the system of record, not the
    original change log — a log event that RE-ASSERTED the then-current
    attrs was collapsed by ``scd2_snapshot`` and is not retained, so a
    late change landing inside such a collapsed interval treats the
    interval's state as constant (it will not re-split at the collapsed
    event's timestamp). Equivalent to rebuilding from the dimension's own
    change events plus the batch; property-tested in test_properties.py.
    """
    touched = changes.select(key).distinct()
    untouched = dim.join(touched, key, "left_anti")
    hist_as_changes = (
        dim.join(touched, key, "left_semi")
        .select(key, F.col("valid_from").alias(ts_col), *attr_cols)
    )
    rebuilt = scd2_snapshot(
        hist_as_changes.unionByName(changes.select(key, ts_col, *attr_cols)),
        key, ts_col, attr_cols,
    )
    return untouched.unionByName(rebuilt)
