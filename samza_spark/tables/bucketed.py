"""Bucketed tables: co-located joins without a per-query shuffle.

Samza co-locates stream-table joins by partitioning the intermediate topic
and the table's changelog identically (IntermediateStreamManager.java:
59-94 partition matching). The Spark-native equivalent is bucketing: both
sides written with ``bucketBy(n, key)`` hash-place rows identically, so an
equi-join on the bucket key runs with NO Exchange on either side — at
100 TB this turns every repeated join against a big keyed table from a
full shuffle into a local zip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list,
    num_buckets: int = 32,
    sort_cols: list | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
