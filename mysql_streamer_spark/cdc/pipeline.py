"""The composed CDC pipeline — the reference's whole DML hot path as one
declarative DataFrame plan (SURVEY.md §7 phase 0).

    events (binlog stand-in)
      -> normalize to CDC shape           (S1/S3, source.py)
      -> split off heartbeats             (F5/S7)
      -> schema blacklist                 (F1)
      -> [optional] table whitelist       (F2)
      -> refresh rerouting                (S4)
      -> transaction id + schema id       (P5/T1)
      -> envelope projection              (P1/P3)

Because it is a single Catalyst plan, the filters get pushed to the scan and
the schema-id lookup is a broadcast join — there is no per-event Python.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_streamer_spark.cdc.source import events_as_cdc
from mysql_streamer_spark.cdc.filters import (
    DEFAULT_SCHEMA_BLACKLIST,
    filter_blacklisted_schemas,
    filter_table_whitelist,
    split_heartbeats,
)
from mysql_streamer_spark.cdc.envelope import build_envelope
from mysql_streamer_spark.tables import load_table, spread


def cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The normalized CDC stream from the driver's events table.

    The feed goes through ``spread`` (r10): the local fixture is ONE
    parquet split, which serialized every downstream map stage (envelope
    projection, wire codecs, ciphers) on a single core; spread's
    partition-count guard makes it a structural no-op wherever the feed
    already arrives in >= cores splits, so at cluster scale no exchange
    is added. Batch entry points only — streaming micro-batches get
    their partitioning from the source."""
    return events_as_cdc(spread(load_table(spark, sf_dir, "events"), "event_id"))


def envelope_from_cdc(
    cdc: DataFrame,
    blacklist: Iterable[str] = DEFAULT_SCHEMA_BLACKLIST,
    table_whitelist: Iterable[str] = (),
    cluster_name: str = "refresh_primary",
) -> DataFrame:
    """Admission filters + envelope over an already-normalized CDC stream
    (single- or multi-row source, batch or streaming micro-batch)."""
    data_events, _heartbeats = split_heartbeats(cdc)
    admitted = filter_blacklisted_schemas(data_events, blacklist)
    admitted = filter_table_whitelist(admitted, table_whitelist)
    return build_envelope(admitted, cluster_name)


def envelope_pipeline_df(
    events: DataFrame,
    blacklist: Iterable[str] = DEFAULT_SCHEMA_BLACKLIST,
    table_whitelist: Iterable[str] = (),
    cluster_name: str = "refresh_primary",
) -> DataFrame:
    """The DML hot path on any events-shaped DataFrame — batch OR streaming
    micro-batch (every step is a stateless projection/filter plus one
    broadcast join, so the identical plan serves both modes)."""
    return envelope_from_cdc(
        events_as_cdc(events), blacklist, table_whitelist, cluster_name
    )


def envelope_pipeline(
    spark: SparkSession,
    sf_dir: str,
    blacklist: Iterable[str] = DEFAULT_SCHEMA_BLACKLIST,
    table_whitelist: Iterable[str] = (),
    cluster_name: str = "refresh_primary",
) -> DataFrame:
    """Full DML-path pipeline: events parquet -> message envelopes.
    The feed is spread across the session's cores where the scan alone
    would under-parallelize (see cdc_events)."""
    return envelope_pipeline_df(
        spread(load_table(spark, sf_dir, "events"), "event_id"),
        blacklist,
        table_whitelist,
        cluster_name,
    )


def changelog_from_cdc(
    cdc: DataFrame, blacklist: Iterable[str] = DEFAULT_SCHEMA_BLACKLIST
) -> DataFrame:
    """Changelog mode (P4) over an already-normalized CDC stream: the ONE
    composition (heartbeat split -> blacklist -> refresh rerouting ->
    constant-schema projection) shared by the batch query, the streaming
    foreachBatch body, the CLI verb, and the SQL view."""
    from mysql_streamer_spark.cdc.changelog import changelog_projection
    from mysql_streamer_spark.cdc.envelope import reroute_refresh_tables

    data, _ = split_heartbeats(cdc)
    return changelog_projection(
        reroute_refresh_tables(filter_blacklisted_schemas(data, blacklist))
    )


def heartbeat_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heartbeat side-channel (serial=event_id, timestamp), F4 fixture."""
    _, hb = split_heartbeats(cdc_events(spark, sf_dir))
    return hb.select(
        F.col("event_id").alias("serial"),
        F.col("timestamp"),
        F.col("log_file"),
        F.col("log_pos"),
    )
