"""Kafka/Debezium CDC source adapter (S1).

The reference tails the binlog directly with pymysqlreplication; the
Spark-native equivalent is Debezium publishing binlog events to Kafka and
``spark.readStream.format("kafka")`` consuming them. This module maps the
(public, documented) Debezium MySQL envelope onto the engine's normalized
CDC shape (cdc/source.py CDC_EVENT_COLUMNS) so the entire downstream
pipeline — filters, registry join, envelope, checkpointed sink — is
source-agnostic.

Debezium value layout used (https://debezium.io docs, MySQL connector):
``payload.op`` c/u/d/r, ``payload.before``/``payload.after`` row images,
``payload.source`` {db, table, file, pos, row, ts_ms}.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Debezium op -> engine message_type ('r' = snapshot read -> refresh,
#: matching the reference's refresh/backfill message semantics).
DEBEZIUM_OP_MAP = {"c": "create", "u": "update", "d": "delete", "r": "refresh"}

#: Row images stay generic maps; payload extraction picks typed fields out.
DEBEZIUM_VALUE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("op", T.StringType()),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField("before", T.MapType(T.StringType(), T.StringType())),
                    T.StructField("after", T.MapType(T.StringType(), T.StringType())),
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("db", T.StringType()),
                                T.StructField("table", T.StringType()),
                                T.StructField("file", T.StringType()),
                                T.StructField("pos", T.LongType()),
                                T.StructField("row", T.IntegerType()),
                                T.StructField("ts_ms", T.LongType()),
                                # Debezium >= 2.5 also publishes ts_us/ts_ns;
                                # preferring ts_us keeps microsecond event
                                # times lossless through the wire format
                                T.StructField("ts_us", T.LongType()),
                            ]
                        ),
                    ),
                ]
            ),
        )
    ]
)


def _op_to_message_type() -> Column:
    expr = None
    for op, mt in DEBEZIUM_OP_MAP.items():
        cond = F.col("p.op") == op
        expr = F.when(cond, F.lit(mt)) if expr is None else expr.when(cond, F.lit(mt))
    return expr.otherwise(F.lit("create"))


def debezium_to_cdc(
    raw: DataFrame,
    pk_field: str = "pk",
    k_field: str = "k",
    val_field: str = "val",
) -> DataFrame:
    """Kafka-record frame (value binary/string, offset long) -> the engine's
    CDC shape. Insert/read rows carry ``after``; deletes carry ``before``
    (Debezium's contract); updates carry both — exactly the reference's
    payload-extraction rule (util/message_builder.py:80-88).
    """
    p = F.from_json(F.col("value").cast("string"), DEBEZIUM_VALUE_SCHEMA)["payload"]
    image = F.when(F.col("p.op") == "d", F.col("p.before")).otherwise(F.col("p.after"))
    before = F.when(F.col("p.op") == "u", F.col("p.before"))
    return (
        raw.withColumn("p", p)
        .withColumn("image", image)
        .select(
            F.col("offset").alias("event_id"),
            F.col("p.source.db").alias("database"),
            F.col("p.source.table").alias("table"),
            _op_to_message_type().alias("message_type"),
            F.coalesce(
                F.timestamp_micros(F.col("p.source.ts_us")),
                F.timestamp_millis(F.col("p.source.ts_ms")),
            ).alias("timestamp"),
            F.col("p.source.file").alias("log_file"),
            F.col("p.source.pos").alias("log_pos"),
            F.coalesce(F.col("p.source.row"), F.lit(0)).alias("offset"),
            F.col("image")[pk_field].cast("long").alias("pk"),
            F.col("image")[k_field].cast("int").alias("payload_k"),
            F.col("image")[val_field].cast("double").alias("payload_val"),
            before[val_field].cast("double").alias("before_val"),
        )
    )


def cdc_to_debezium_json(cdc: DataFrame) -> DataFrame:
    """Inverse of ``debezium_to_cdc``: encode the engine's normalized CDC
    shape as Debezium-format Kafka records (value JSON string + offset).
    Used as the wire format of the Kafka producer path and to prove the
    adapter lossless by roundtrip (parse(encode(x)) == x — the registered
    ``cdc_debezium_roundtrip`` query hash-matches the direct path's
    oracle). Pure column expressions; map-side."""
    op = (
        F.when(F.col("message_type") == "create", F.lit("c"))
        .when(F.col("message_type") == "update", F.lit("u"))
        .when(F.col("message_type") == "delete", F.lit("d"))
        .otherwise(F.lit("r"))
    )
    image = F.create_map(
        F.lit("pk"), F.col("pk").cast("string"),
        F.lit("k"), F.col("payload_k").cast("string"),
        F.lit("val"), F.col("payload_val").cast("string"),
    )
    before_image = F.when(
        F.col("message_type") == "update",
        F.create_map(
            F.lit("pk"), F.col("pk").cast("string"),
            F.lit("k"), F.col("payload_k").cast("string"),
            F.lit("val"), F.col("before_val").cast("string"),
        ),
    )
    payload = F.struct(
        op.alias("op"),
        F.floor(F.unix_micros("timestamp") / 1000).cast("long").alias("ts_ms"),
        # Debezium's delete contract: the row image rides in `before`
        F.when(op == "d", image).otherwise(before_image).alias("before"),
        F.when(op != "d", image).alias("after"),
        F.struct(
            F.col("database").alias("db"),
            F.col("table").alias("table"),
            F.col("log_file").alias("file"),
            F.col("log_pos").cast("long").alias("pos"),
            F.col("offset").cast("int").alias("row"),
            F.floor(F.unix_micros("timestamp") / 1000).cast("long").alias("ts_ms"),
            F.unix_micros("timestamp").alias("ts_us"),
        ).alias("source"),
    )
    return cdc.select(
        # genuine Debezium JSON carries explicit nulls ("before": null on
        # inserts, "after": null on deletes) — keep them, the default
        # drop-null behavior is a wire-format drift the golden corpus
        # (tests/fixtures/debezium/) caught
        F.to_json(
            F.struct(payload.alias("payload")),
            {"ignoreNullFields": "false"},
        ).alias("value"),
        F.col("event_id").alias("offset"),
    )


def kafka_cdc_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over Debezium topics, already normalized to CDC shape.
    (Requires a live broker — interface only in the sandbox; the adapter
    itself is unit-tested on in-memory records.)"""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return debezium_to_cdc(reader.load())
