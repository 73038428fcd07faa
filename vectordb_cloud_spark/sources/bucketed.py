"""Bucketed table layout: shuffle-free co-located joins.

``partitionBy`` (collections.py) buys file PRUNING; ``bucketBy`` buys
co-LOCATION — rows with equal join keys land in the same numbered bucket
file on both tables, so a sort-merge join between two tables bucketed the
same way needs NO Exchange at all. At 100 TB the exchange is the cost: a
fact-fact join shuffles both inputs across the network once per query,
while bucketed layouts pay one shuffle at WRITE time and amortize it over
every subsequent join (the standard warehouse design for repeated
fact-fact joins; Spark reads the bucket spec from the catalog and plans
``SortMergeJoin`` directly over per-bucket scans).

The reference has no analog (single-table vector store); this is engine
infrastructure for the relational/training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an EXTERNAL bucketed+sorted table at ``path``.

    Bucket metadata lives in the session catalog (in-memory catalog is
    fine); sorting within buckets lets the join skip its sort as well.
    Overwrites any same-named table registration.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables shuffle-free.

    The ``merge`` hint steers the planner to SortMergeJoin (a broadcast
    would also be exchange-free but only works for small sides); with both
    sides bucketed on ``on`` into the same bucket count, the plan contains
    zero Exchange operators — asserted in tests/test_bucketing.py.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
