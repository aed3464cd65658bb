"""Admission filters over the CDC stream (SURVEY.md §2.2, F1-F5).

All filters are plain Column predicates so Catalyst pushes them into the
parquet/Kafka scan (check ``.explain``: they appear under ``PushedFilters``)
— the reference instead pushed only_tables/only_schemas into its binlog
reader (low_level_binlog_stream_reader_wrapper.py:78-94); here the optimizer
does the equivalent for any source that supports pushdown.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_streamer_spark.cdc.source import HEARTBEAT_DB, REFRESH_SUFFIX

#: Reference itest config (config-env-itest-opensource.yaml:29-35).
DEFAULT_SCHEMA_BLACKLIST = (
    "information_schema",
    "mysql",
    "performance_schema",
    "test",
    HEARTBEAT_DB,
)

#: Statements the DDL branch drops outright (schema_event_handler.py:139-142).
SKIPPABLE_QUERIES = ("BEGIN", "COMMIT")


def filter_blacklisted_schemas(
    df: DataFrame, blacklist: Iterable[str] = DEFAULT_SCHEMA_BLACKLIST
) -> DataFrame:
    """F1: drop events whose database is blacklisted."""
    return df.filter(~F.col("database").isin(list(blacklist)))


def filter_table_whitelist(df: DataFrame, whitelist: Iterable[str]) -> DataFrame:
    """F2: keep only whitelisted tables; whitelisting ``t`` implies its
    ``t_data_pipeline_refresh`` twin (reference :78-94). Empty = keep all."""
    tables = list(whitelist)
    if not tables:
        return df
    tables = tables + [t + REFRESH_SUFFIX for t in tables]
    return df.filter(F.col("table").isin(tables))


def split_heartbeats(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F5/S7: (data_events, heartbeats). Heartbeat rows update position /
    feed the replication-delay metric but never reach the handlers
    (simple_binlog_stream_reader_wrapper.py:150-215)."""
    is_hb = F.col("database") == HEARTBEAT_DB
    return df.filter(~is_hb), df.filter(is_hb)


def filter_skippable_queries(df: DataFrame, query_col: str = "query") -> DataFrame:
    """F3: drop BEGIN/COMMIT query events on the DDL branch."""
    return df.filter(~F.upper(F.trim(F.col(query_col))).isin(list(SKIPPABLE_QUERIES)))
