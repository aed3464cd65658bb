"""Bucketed-table storage: pre-shuffled layouts for co-located joins.

Repeated large-fact joins on the same key should not pay the shuffle every
query. Writing both sides bucketed by the join key (same bucket count)
lets Spark plan a SortMergeJoin with NO Exchange on either side — the
shuffle was paid once at write time. This is the batch analogue of the
reference's per-table Kafka topic partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
) -> None:
    """Persist as a bucketed+sorted managed table (idempotent overwrite)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
