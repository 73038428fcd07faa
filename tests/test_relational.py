"""Grouping-set lattice semantics: the DataFrame rollup()/cube() APIs must
produce exactly the union of their per-set GROUP BY results (these back the
consolidated ``grouping_sets_order_stats`` oracle query, which exercises the
same lattice through SQL GROUPING SETS)."""

from pyspark.sql import functions as F


def test_cube_is_union_of_all_grouping_sets(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 1), ("y", 1)], "a string, b int"
    )
    cube = {
        (r["a"], r["b"]): r["n"]
        for r in df.cube("a", "b").agg(F.count("*").alias("n")).collect()
    }
    expected = {}
    expected.update({(r["a"], r["b"]): r["n"] for r in df.groupBy("a", "b").agg(F.count("*").alias("n")).collect()})
    expected.update({(r["a"], None): r["n"] for r in df.groupBy("a").agg(F.count("*").alias("n")).collect()})
    expected.update({(None, r["b"]): r["n"] for r in df.groupBy("b").agg(F.count("*").alias("n")).collect()})
    expected[(None, None)] = df.count()
    assert cube == expected


def test_rollup_is_prefix_subset_of_cube(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 1), ("y", 1)], "a string, b int"
    )
    rollup = {
        (r["a"], r["b"]): r["n"]
        for r in df.rollup("a", "b").agg(F.count("*").alias("n")).collect()
    }
    cube = {
        (r["a"], r["b"]): r["n"]
        for r in df.cube("a", "b").agg(F.count("*").alias("n")).collect()
    }
    # rollup = cube minus the (None, b) set
    assert set(rollup) == {k for k in cube if not (k[0] is None and k[1] is not None)}
    for k, v in rollup.items():
        assert cube[k] == v


def test_approx_percentile_twin_close_to_exact(spark, sf_dir):
    """price_percentiles_by_flag_approx is the documented 100 TB path; at
    accuracy=10000 the sketch must sit within 1% of the exact percentiles."""
    from vectordb_cloud_spark import queries

    exact = {r["l_returnflag"]: r for r in queries.price_percentiles_by_flag(spark, sf_dir).collect()}
    approx = {r["l_returnflag"]: r for r in queries.price_percentiles_by_flag_approx(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for flag, row in approx.items():
        for c in ("p25", "median", "p90"):
            assert abs(row[c] - exact[flag][c]) <= 0.01 * abs(exact[flag][c]), (flag, c)
