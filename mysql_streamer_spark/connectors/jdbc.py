"""JDBC snapshot/backfill source (S8).

The reference snapshots schemas with ``mysqldump --no-data`` and backfills
via its refresh tables (components/mysql_tools.py:48-69); Spark-native
backfill is a partitioned JDBC read: N executors each pull one primary-key
range, so a 100 TB-source backfill parallelizes instead of serializing
through one connection. The helpers keep option-building pure (testable
without a live database).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000


def snapshot_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = DEFAULT_FETCH_SIZE,
) -> dict[str, str]:
    """JDBC reader options for a parallel snapshot.

    With a numeric ``partition_column`` (normally the primary key) Spark
    issues ``num_partitions`` range-predicated queries in parallel; without
    one the read is single-stream (correct but slow — only for tiny dims).
    """
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
        # a snapshot must be one transactionally-consistent cut, like the
        # reference's --single-transaction dump
        "isolationLevel": "REPEATABLE_READ",
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned snapshot needs lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_snapshot(spark: SparkSession, **kwargs) -> DataFrame:
    """spark.read over a live MySQL/any-JDBC table (see snapshot_options)."""
    return spark.read.format("jdbc").options(**snapshot_options(**kwargs)).load()
