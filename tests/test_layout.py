"""Z-order layout (sources/layout.py): the multi-column skipping property —
a box predicate on BOTH columns must intersect fewer files' min/max ranges
under z-order than under a single-column linear sort."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.sources.layout import (
    file_stats,
    files_matching_box,
    write_zordered,
    zorder_value,
)


@pytest.fixture(scope="module")
def grid(spark):
    # a 200x200 uniform grid: the worst case for linear sort, the showcase
    # for z-order
    return (
        spark.range(40_000)
        .withColumn("x", (F.col("id") % 200).cast("double"))
        .withColumn("y", (F.col("id") / 200).cast("long").cast("double"))
        .withColumn("payload", F.col("id") * 2)
    )


def test_zorder_beats_linear_sort_on_box_predicates(spark, grid, tmp_path):
    n_files = 64  # locality shows once files are smaller than full stripes
    linear_path = str(tmp_path / "linear")
    z_path = str(tmp_path / "zorder")
    (
        grid.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite").parquet(linear_path)
    )
    write_zordered(grid, z_path, ["x", "y"], bits=6, n_files=n_files)

    lin_stats = file_stats(spark.read.parquet(linear_path), ["x", "y"]).cache()
    z_stats = file_stats(spark.read.parquet(z_path), ["x", "y"]).cache()
    assert lin_stats.count() >= n_files - 1 and z_stats.count() >= n_files - 1

    # small boxes on (x, y): x-sorted layout prunes on x only; z-order
    # prunes on both -> strictly fewer candidate files summed over probes
    boxes = [
        {"x": (10.0, 30.0), "y": (10.0, 30.0)},
        {"x": (150.0, 170.0), "y": (60.0, 80.0)},
        {"x": (90.0, 110.0), "y": (140.0, 160.0)},
    ]
    lin_total = sum(files_matching_box(lin_stats, b) for b in boxes)
    z_total = sum(files_matching_box(z_stats, b) for b in boxes)
    assert z_total < lin_total, (z_total, lin_total)
    # a y-only predicate: linear-on-x layout cannot prune at all
    y_only = {"y": (0.0, 12.0)}
    assert files_matching_box(z_stats, y_only) < files_matching_box(lin_stats, y_only)


def test_zorder_preserves_data(spark, grid, tmp_path):
    path = str(tmp_path / "z2")
    write_zordered(grid, path, ["x", "y"], bits=5, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == grid.count()
    assert back.agg(F.sum("payload")).first()[0] == grid.agg(F.sum("payload")).first()[0]
    assert set(back.columns) == set(grid.columns)  # __z dropped


def test_zorder_value_interleaves_locality(spark):
    """Nearby (x, y) points must share z-prefixes: the z-range spanned by a
    small tile is far smaller than the one spanned by a thin full-height
    stripe with the same area."""
    df = (
        spark.range(1024)
        .withColumn("x", (F.col("id") % 32).cast("double"))
        .withColumn("y", (F.col("id") / 32).cast("long").cast("double"))
    )
    bounds = [float(v) for v in range(1, 32)]
    z = zorder_value([(F.col("x"), bounds), (F.col("y"), bounds)], bits=5)
    zdf = df.withColumn("z", z)
    tile = zdf.filter((F.col("x") < 8) & (F.col("y") < 8))
    stripe = zdf.filter(F.col("x") < 2)  # same 64-cell area, full height
    t = tile.agg((F.max("z") - F.min("z")).alias("span")).first()["span"]
    s = stripe.agg((F.max("z") - F.min("z")).alias("span")).first()["span"]
    assert t < s


def test_null_values_land_in_bucket_zero(spark):
    df = spark.createDataFrame([(None,), (1.0,), (50.0,)], "x double")
    bounds = [10.0, 20.0, 30.0]
    z = zorder_value([(F.col("x"), bounds)], bits=2)
    rows = df.withColumn("z", z).collect()
    by_x = {r["x"]: r["z"] for r in rows}
    assert by_x[None] == 0 and by_x[1.0] == 0 and by_x[50.0] == 3


def test_zorder_bit_budget_guard():
    from pyspark.sql import functions as FF

    with pytest.raises(ValueError, match="63 usable bits"):
        zorder_value([(FF.col(f"c{i}"), [1.0]) for i in range(9)], bits=8)
