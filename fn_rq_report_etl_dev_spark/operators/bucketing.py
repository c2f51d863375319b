"""Bucketed tables: co-located, shuffle-free joins on a stable key.

The 100 TB merge joins target and source on the merge key every day.
Bucketing both tables on that key by the same bucket count makes the join
a zero-exchange zip of corresponding buckets — the daily merge then
shuffles nothing but the (small) incoming batch. ``sortBy`` on the same
key also removes the sort from the sort-merge join.

Bucketing requires catalog tables (``saveAsTable``): bucket metadata lives
in the metastore, not the parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
