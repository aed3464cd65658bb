"""Envelope construction: refresh rerouting, transaction id, schema id.

Reference behavior being re-expressed:

- Refresh rerouting (S4): rows arriving on ``<t>_data_pipeline_refresh`` are
  relabeled to the base table ``t`` with message_type ``refresh``
  (low_level_binlog_stream_reader_wrapper.py:61, 114-127).
- Transaction id (P5): ``(cluster_name, log_file, log_pos)`` — the
  deterministic global ordering key that replaces the reference's
  single-thread invariant (util/transaction_id.py:22-68). Exposed as a
  sortable ``txn_order`` long so per-key ordering is a window/sort, and as
  the idempotency key for exactly-once sinks.
- Envelope projection (P3): schema_id + payload + position + timestamp
  (util/message_builder.py:51-78).

Schema ids are assigned densely over the distinct ``(database, table)``
universe (ordered lexicographically) — the tiny dimension is broadcast so
the stream-side join is shuffle-free, mirroring the reference's per-table
schema cache (T1, schema_wrapper.py:79-83) as a broadcast join instead of a
driver-side dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_streamer_spark.cdc.source import REFRESH_SUFFIX


def reroute_refresh_tables(df: DataFrame) -> DataFrame:
    """S4: ``<t>_data_pipeline_refresh`` rows -> base table, type=refresh."""
    is_refresh = F.col("table").endswith(REFRESH_SUFFIX)
    return df.withColumn(
        "message_type", F.when(is_refresh, F.lit("refresh")).otherwise(F.col("message_type"))
    ).withColumn(
        "table",
        F.when(
            is_refresh,
            F.expr(f"substring(table, 1, length(table) - {len(REFRESH_SUFFIX)})"),
        ).otherwise(F.col("table")),
    )


#: Bit layout of ``txn_order``: file_no:15 | log_pos:32 | offset:16 (63 bits,
#: fits a signed long). Real-binlog bounds: ``log_pos`` is a byte offset into
#: one binlog file, capped by max_binlog_size at 4 GiB = 2^32; ``offset`` is
#: the row index inside one RowsEvent (an event is < 2^16 rows in practice
#: since events are bounded by binlog_row_event_max_size); ``file_no`` is the
#: live binlog-file counter (purge policy keeps the retained set << 2^15).
TXN_FILE_SHIFT = 2**48
TXN_POS_SHIFT = 2**16


def with_transaction_id(df: DataFrame, cluster_name: str = "refresh_primary") -> DataFrame:
    """P5: attach the (cluster, log_file, log_pos, offset) ordering key.

    ``txn_order`` folds (file_number, log_pos, offset) into one monotonic
    long with disjoint bit ranges (see TXN_* constants above) so binlog order
    is preserved under a plain numeric sort and the long doubles as the
    exactly-once idempotency key (reference util/transaction_id.py:22-68 +
    the single-thread ordering invariant,
    base_parse_replication_stream.py:143).
    """
    file_no = F.substring_index("log_file", ".", -1).cast("long")
    return (
        df.withColumn("cluster_name", F.lit(cluster_name))
        .withColumn(
            "txn_order",
            (
                file_no * F.lit(TXN_FILE_SHIFT)
                + F.col("log_pos") * F.lit(TXN_POS_SHIFT)
                + F.col("offset")
            ).cast("long"),
        )
    )


def schema_id_dimension(df: DataFrame) -> DataFrame:
    """FALLBACK ONLY: positional schema ids discovered from the stream, for
    sources with no registry. The default data path uses the SchemaRegistry
    dimension (registry_schema_dimension) — positional dense-rank ids change
    whenever a table appears/disappears, which is not the reference's
    stable-schema-id semantics (schema_wrapper.py:97-141)."""
    dim = df.select("database", "table").distinct()
    w = Window.orderBy("database", "table")
    return dim.withColumn("schema_id", F.dense_rank().over(w))


def registry_schema_dimension(spark) -> DataFrame:
    """T1's slowly-changing dimension from the ONE source of truth: the
    DDL-replayed SchemaRegistry (schema/bootstrap.py). Tiny at any scale
    (one row per registered table) -> broadcast at the join site."""
    from mysql_streamer_spark.schema.bootstrap import registry_dim_df

    return registry_dim_df(spark)


def with_schema_ids(df: DataFrame, dim: DataFrame | None = None) -> DataFrame:
    """T1 as a broadcast join: stream -> (database, table) -> schema_id.

    Rows for tables the registry has never seen keep a NULL schema_id (the
    reference would block and register on miss; a batch plan surfaces the
    miss instead of hiding it)."""
    dim = dim if dim is not None else registry_schema_dimension(df.sparkSession)
    return df.join(F.broadcast(dim), on=["database", "table"], how="left")


def per_key_ordered(env: DataFrame) -> DataFrame:
    """The parallel substitute for the reference's single-thread total
    order (base_parse_replication_stream.py:143): co-locate each
    (database, table, pk) on one partition and sort within partitions by
    txn_order. Consumers reading a partition stream see every key's
    changes in binlog order — the guarantee downstream appliers need —
    while partitions process in parallel."""
    return env.repartition(
        "database_name", "table_name", "pk"
    ).sortWithinPartitions("database_name", "table_name", "pk", "txn_order")


def write_envelope_partitioned(env: DataFrame, path: str) -> None:
    """Phase-0 sink layout: parquet partitioned by (database, table) so a
    per-table consumer prunes everything else at the directory level."""
    per_key_ordered(env).write.mode("overwrite").partitionBy(
        "database_name", "table_name"
    ).parquet(path)


def build_envelope(df: DataFrame, cluster_name: str = "refresh_primary") -> DataFrame:
    """P3: the final flat message envelope (column order = schema).

    Flat columns rather than nested structs: every value is still present
    (payload_*, position, meta/transaction id), and a flat schema keeps the
    sink parquet friendly to column pruning + predicate pushdown for
    downstream consumers.
    """
    routed = reroute_refresh_tables(df)
    keyed = with_transaction_id(routed, cluster_name)
    enveloped = with_schema_ids(keyed)
    return enveloped.select(
        F.col("schema_id"),
        F.col("cluster_name"),
        F.col("database").alias("database_name"),
        F.col("table").alias("table_name"),
        F.col("message_type"),
        F.col("timestamp"),
        F.col("log_file"),
        F.col("log_pos"),
        F.col("offset"),
        F.col("txn_order"),
        F.col("pk"),
        F.col("payload_k"),
        F.col("payload_val"),
        # refresh messages never carry a previous payload (reference
        # RefreshMessage semantics, low_level_binlog_stream_reader_wrapper.py:44-48)
        F.when(F.col("message_type") != "refresh", F.col("before_val"))
        .alias("previous_payload_val"),
    )
