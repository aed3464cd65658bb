"""State-table parity (T4/K3): the reference persists its resume position
as one row per cluster in ``global_event_state`` (models/
global_event_state.py:37-92, upserted from the producer's position
callback). Spark's checkpoint already owns recovery; this table exists for
operational parity — an inspectable "where is the pipeline" row — and is
maintained transactionally-enough by overwriting one tiny parquet dir per
cluster after each committed micro-batch.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_streamer_spark.cdc.positions import LogPosition

STATE_SCHEMA = (
    "cluster_name string, position string, batch_id long, "
    "event_type string, is_clean_shutdown boolean, time_updated double"
)


def batch_position(env_batch: DataFrame) -> LogPosition | None:
    """The batch's high-water LogPosition — the row with max txn_order
    (one tiny aggregate; driver sees a single row, control-plane only)."""
    row = env_batch.agg(
        F.max_by(
            F.struct("log_file", "log_pos", "offset"), F.col("txn_order")
        ).alias("p")
    ).collect()[0]["p"]
    if row is None:
        return None
    return LogPosition(log_file=row.log_file, log_pos=row.log_pos, offset=row.offset)


def save_state(
    spark: SparkSession,
    state_dir: str,
    cluster_name: str,
    position: LogPosition,
    batch_id: int,
    is_clean_shutdown: bool = False,
) -> None:
    """Upsert-by-overwrite of the cluster's single state row."""
    row = (
        cluster_name,
        position.to_json(),
        batch_id,
        "data_event",
        is_clean_shutdown,
        time.time(),
    )
    spark.createDataFrame([row], STATE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/{cluster_name}")


def advance_state(
    spark: SparkSession,
    state_dir: str,
    cluster_name: str,
    position: LogPosition,
    batch_id: int,
) -> None:
    """Monotone upsert: a position only ever advances (reference invariant —
    the saved position is a high-water mark, and micro-batches are not
    guaranteed to arrive in event order when backfilling many files)."""
    existing = load_state(spark, state_dir, cluster_name)
    if existing is not None:
        old, _, _ = existing
        if (old.log_file, old.log_pos, old.offset or 0) >= (
            position.log_file,
            position.log_pos,
            position.offset or 0,
        ):
            position = old
    save_state(spark, state_dir, cluster_name, position, batch_id)


def load_state(spark: SparkSession, state_dir: str, cluster_name: str):
    """(LogPosition, batch_id, is_clean_shutdown) or None if never saved."""
    from mysql_streamer_spark.cdc.positions import construct_position

    try:
        row = spark.read.parquet(f"{state_dir}/{cluster_name}").collect()[0]
    except Exception:
        return None
    return (
        construct_position(json.loads(row.position)),
        row.batch_id,
        row.is_clean_shutdown,
    )


# -- per-topic offsets (reference data_event_checkpoint,
#    models/data_event_checkpoint.py:38-143: kafka_topic -> kafka_offset) --

_TOPIC_SCHEMA = "topic string, max_txn_order long, n_messages long, batch_id long"


def save_topic_offsets(env_batch: DataFrame, state_dir: str, batch_id: int) -> None:
    """Upsert-by-overwrite of the per-topic high-water offsets from one
    committed batch, merged monotonically with the existing table (bulk
    upsert semantics of the reference's checkpoint table)."""
    from pyspark.sql import functions as F

    spark = env_batch.sparkSession
    new = (
        env_batch.withColumn(
            "topic", F.concat_ws(".", "database_name", "table_name")
        )
        .groupBy("topic")
        .agg(
            F.max("txn_order").alias("max_txn_order"),
            F.count("*").alias("n_messages"),
        )
        .withColumn("batch_id", F.lit(batch_id))
    )
    path = f"{state_dir}/topic_offsets"
    try:
        old = spark.read.parquet(path)
        merged = (
            old.unionByName(new)
            .groupBy("topic")
            .agg(
                F.max("max_txn_order").alias("max_txn_order"),
                F.sum("n_messages").alias("n_messages"),
                F.max("batch_id").alias("batch_id"),
            )
        ).collect()
    except Exception:
        merged = new.collect()
    spark.createDataFrame(merged, _TOPIC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_topic_offsets(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(f"{state_dir}/topic_offsets")
