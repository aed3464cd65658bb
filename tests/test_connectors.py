"""Connector-layer tests: Debezium adapter on in-memory Kafka-shaped
records, envelope round-trip through the Kafka record shape, and JDBC
snapshot option building (no live services in the sandbox — format and
interface tests, per the round plan)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mysql_streamer_spark.connectors import (
    debezium_to_cdc,
    envelope_to_kafka_records,
    snapshot_options,
)
from mysql_streamer_spark.cdc.pipeline import envelope_from_cdc


def _dbz(op, db, table, pos, row=0, before=None, after=None, ts_ms=1709251200000):
    return json.dumps(
        {
            "payload": {
                "op": op,
                "ts_ms": ts_ms,
                "before": before,
                "after": after,
                "source": {
                    "db": db,
                    "table": table,
                    "file": "binlog.000042",
                    "pos": pos,
                    "row": row,
                    "ts_ms": ts_ms,
                },
            }
        }
    )


@pytest.fixture()
def kafka_frame(spark):
    rows = [
        (0, _dbz("c", "db_0", "click", 100, after={"pk": "1", "k": "7", "val": "1.5"})),
        (
            1,
            _dbz(
                "u",
                "db_0",
                "click",
                140,
                before={"pk": "1", "k": "7", "val": "1.5"},
                after={"pk": "1", "k": "7", "val": "2.5"},
            ),
        ),
        (2, _dbz("d", "db_0", "click", 180, before={"pk": "1", "k": "7", "val": "2.5"})),
        (3, _dbz("r", "db_1", "signup", 220, after={"pk": "9", "k": "3", "val": "4.0"})),
        # second row of a multi-row event: same pos, row index 1
        (4, _dbz("c", "db_0", "click", 260, row=1, after={"pk": "2", "k": "1", "val": "9"})),
    ]
    return spark.createDataFrame(rows, "offset long, value string")


def test_debezium_adapter_maps_ops_and_payloads(kafka_frame):
    cdc = debezium_to_cdc(kafka_frame)
    rows = {r.event_id: r for r in cdc.collect()}
    assert rows[0].message_type == "create" and rows[0].payload_val == 1.5
    assert rows[0].before_val is None
    assert rows[1].message_type == "update"
    assert rows[1].payload_val == 2.5 and rows[1].before_val == 1.5
    # delete carries the before-image as its payload (Debezium contract)
    assert rows[2].message_type == "delete" and rows[2].payload_val == 2.5
    assert rows[3].message_type == "refresh"
    assert rows[4].offset == 1 and rows[4].log_pos == 260
    assert rows[0].log_file == "binlog.000042"


def test_debezium_rows_flow_through_the_envelope(kafka_frame):
    env = envelope_from_cdc(debezium_to_cdc(kafka_frame))
    got = {r.txn_order: r for r in env.collect()}
    assert len(got) == 5
    r0 = min(got.items())[1]
    # registry knows db_0.click -> real schema id, not NULL
    assert r0.schema_id is not None
    assert {r.message_type for r in got.values()} == {
        "create",
        "update",
        "delete",
        "refresh",
    }


def test_envelope_to_kafka_records_roundtrip(spark, sf_dir):
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline

    env = envelope_pipeline(spark, sf_dir).limit(20)
    recs = envelope_to_kafka_records(env)
    assert recs.columns == ["key", "value", "topic", "headers"]
    row = recs.collect()[0]
    parsed = json.loads(row.value)
    cluster, txn = row.key.rsplit(":", 1)
    assert parsed["cluster_name"] == cluster
    assert str(parsed["txn_order"]) == txn
    assert row.topic == f"{parsed['database_name']}.{parsed['table_name']}"
    # headers: Spark Kafka-sink shape, UTF-8 bytes, derived from the value
    # (value is None when the enveloped field is NULL — legal in Kafka)
    hdrs = {
        h.key: bytes(h.value).decode() if h.value is not None else None
        for h in row.headers
    }
    sid = parsed.get("schema_id")
    assert hdrs == {
        "schema_id": str(sid) if sid is not None else None,
        "message_type": parsed["message_type"],
    }


def test_kafka_records_compact_to_latest_per_key(spark, sf_dir):
    """Log-compaction semantics over the idempotency key: a replayed
    micro-batch (every record published twice) compacts back to exactly
    the original message set — the consumer-side effectively-once
    guarantee the key exists to provide."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline

    env = envelope_pipeline(spark, sf_dir)
    rows = (
        envelope_to_kafka_records(env).select("key", "value", "topic").collect()
    )
    schema = "key string, value string, topic string"
    replayed = spark.createDataFrame(rows + rows, schema)
    # what a compacted topic retains: one record per (topic, key)
    compacted = replayed.dropDuplicates(["topic", "key"])
    got = sorted(map(tuple, compacted.collect()))
    # multiset compare happens driver-side (864 records): exceptAll on
    # this shape is rewritten by Catalyst into Generate(ReplicateRows)
    # and a final count() then prunes the value column out from under the
    # generator — INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND, a Spark 4.1
    # optimizer bug this test would otherwise flake on
    assert got == sorted(map(tuple, rows))
    assert len(got) == env.count()


def test_jdbc_snapshot_options():
    opts = snapshot_options(
        url="jdbc:mysql://primary:3306/db_0",
        table="click",
        partition_column="pk",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "pk"
    assert opts["numPartitions"] == "64"
    assert opts["isolationLevel"] == "REPEATABLE_READ"
    with pytest.raises(ValueError):
        snapshot_options(url="u", table="t", partition_column="pk")


def test_kafka_wire_roundtrip_preserves_envelope(spark, sf_dir):
    """envelope -> Kafka record JSON -> parsed back == original rows (the
    sink's wire format is lossless for every envelope column)."""
    from pyspark.sql import functions as F
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline

    from mysql_streamer_spark.connectors.sinks import WIRE_JSON_OPTIONS

    env = envelope_pipeline(spark, sf_dir)
    schema_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in env.schema)
    recs = envelope_to_kafka_records(env)
    parsed = recs.select(
        F.from_json("value", schema_ddl, WIRE_JSON_OPTIONS).alias("m")
    ).select("m.*")
    # from_json yields nullable fields; names and types must round-trip
    assert [(f.name, f.dataType) for f in parsed.schema] == [
        (f.name, f.dataType) for f in env.schema
    ]
    assert parsed.exceptAll(env).count() == 0
    assert env.exceptAll(parsed).count() == 0


def test_debezium_ts_ms_floors_pre_epoch_timestamps(spark):
    """Debezium's source.ts_ms is epoch MILLIS with floor semantics; a
    truncate-toward-zero derivation is off by one for pre-1970 timestamps
    whose micros are not on a millisecond boundary."""
    from mysql_streamer_spark.connectors.kafka import cdc_to_debezium_json
    import json as _json

    cdc = spark.createDataFrame(
        [(1, "db", "t", "create", "1969-12-31 23:59:59.9995", "binlog.000001", 4, 0, 1, 1, 1.0, None)],
        "event_id long, database string, table string, message_type string, "
        "ts string, log_file string, log_pos long, offset int, pk long, "
        "payload_k int, payload_val double, before_val double",
    ).selectExpr(
        "event_id", "database", "table", "message_type",
        "CAST(ts AS TIMESTAMP) AS timestamp", "log_file", "log_pos",
        "offset", "pk", "payload_k", "payload_val", "before_val",
    )
    row = cdc_to_debezium_json(cdc).collect()[0]
    payload = _json.loads(row.value)
    # -500 µs before epoch floors to -1 ms (truncation would give 0)
    assert payload["payload"]["source"]["ts_ms"] == -1


def test_jdbc_snapshot_roundtrips_against_embedded_derby(spark, sf_dir):
    """S8 against a real JDBC database: seed embedded Derby from the
    nation dim, snapshot it back through the PARTITIONED reader, compare
    values and confirm the read actually split into key ranges."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.connectors.jdbc import (
        DERBY_DRIVER,
        embedded_derby_fixture,
        jdbc_snapshot,
    )
    from mysql_streamer_spark.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    url = embedded_derby_fixture(spark, nation, "nation")
    snap = jdbc_snapshot(
        spark,
        url=url,
        table="nation",
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=25,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    assert snap.rdd.getNumPartitions() == 4
    got = {
        (r[0], r[1], r[2])
        for r in snap.select(
            F.col("N_NATIONKEY").cast("int"),
            "N_NAME",
            F.col("N_REGIONKEY").cast("int"),
        ).collect()
    }
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    assert got == want


def test_embedded_derby_fixture_escapes_and_nulls(spark):
    from mysql_streamer_spark.connectors.jdbc import (
        DERBY_DRIVER,
        embedded_derby_fixture,
        jdbc_snapshot,
    )

    df = spark.createDataFrame(
        [(1, "O'Brien", None), (2, None, 2.5)],
        "id int, name string, score double",
    )
    url = embedded_derby_fixture(spark, df, "t")
    back = jdbc_snapshot(spark, url=url, table="t", driver=DERBY_DRIVER)
    rows = {(r[0], r[1], r[2]) for r in back.collect()}
    assert rows == {(1, "O'Brien", None), (2, None, 2.5)}


def test_snapshot_diff_classifies_on_presence_not_null_values(spark):
    """A row whose value is legitimately NULL on one side is an UPDATE,
    never a phantom insert/delete; NULL->NULL is unchanged and omitted."""
    from mysql_streamer_spark.connectors.jdbc import snapshot_diff

    before = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "gone")],
        "pk int, val string",
    )
    after = spark.createDataFrame(
        [(1, "now-set"), (2, None), (3, None), (5, None)],
        "pk int, val string",
    )
    rows = {
        (r.pk, r.message_type, r.val, r.before_val)
        for r in snapshot_diff(before, after, keys=["pk"]).collect()
    }
    assert rows == {
        (1, "update", "now-set", None),
        (2, "update", None, "x"),
        (4, "delete", None, "gone"),
        (5, "insert", None, None),
    }
