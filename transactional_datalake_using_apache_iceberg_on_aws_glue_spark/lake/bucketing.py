"""Bucketed-table helpers: shuffle-free co-located joins.

At 100 TB the dominant cost of fact⋈fact joins (orders⋈lineitem) is
the exchange of both sides. Writing both tables bucketed + sorted on
the join key moves that cost to write time ONCE; every subsequent join
on the key plans SortMergeJoin with ZERO Exchange operators (verified
by tests/test_plans.py::test_bucketed_join_has_no_exchange).

This is the parquet/catalog analogue of Iceberg's bucket partition
transform (``bucket(N, col)``) — the same layout contract the
reference would get from Iceberg table spec if it declared it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. The
    bucket count should divide evenly into cluster parallelism; at
    cluster scale pick n_buckets ~ max expected join parallelism."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.mode(mode).saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — planned
    without any Exchange when bucket counts match."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)
