"""Golden-corpus test for the Debezium adapter (VERDICT r6 #6).

``tests/fixtures/debezium/*.json`` hold genuine Debezium-2.x-format MySQL
change events in the shape the public docs/tutorial publish (the
``inventory.products`` example): full ``schema`` block, typed row images,
``source`` metadata with snapshot/gtid/transaction variants, and the
2.6+ ``ts_us``/``ts_ns`` fields. The prior coverage was roundtrip-only
(parse(encode(x)) == x), which a symmetric format drift would slip past —
this corpus pins the adapter to the real wire format.
"""

from __future__ import annotations

import json
from pathlib import Path

FIXTURES = Path(__file__).parent / "fixtures" / "debezium"


def _raw_df(spark):
    files = sorted(FIXTURES.glob("*.json"))
    assert len(files) >= 6
    rows = [
        # compact-encode like a real Kafka value; offset = file order
        (json.dumps(json.loads(f.read_text())), i)
        for i, f in enumerate(files)
    ]
    return spark.createDataFrame(rows, "value string, offset long")


def test_golden_corpus_normalizes_to_cdc(spark):
    from mysql_streamer_spark.connectors.kafka import debezium_to_cdc

    cdc = debezium_to_cdc(
        _raw_df(spark), pk_field="id", k_field="id", val_field="weight"
    ).orderBy("event_id")
    rows = [r.asDict() for r in cdc.collect()]
    assert [r["message_type"] for r in rows] == [
        "create",
        "update",
        "delete",
        "refresh",
        "create",
        "update",
    ]
    assert all(r["database"] == "inventory" for r in rows)
    assert all(r["table"] == "products" for r in rows)

    create, update, delete, snap, create_us, upd_txn = rows

    # create: image from `after`, no before value
    assert create["pk"] == 101 and create["payload_val"] == 3.14
    assert create["before_val"] is None
    assert create["log_file"] == "mysql-bin.000003" and create["log_pos"] == 355
    # 2.4 events carry only ts_ms -> millisecond timestamp
    assert str(create["timestamp"]) == "2023-09-27 12:17:26"

    # update: after image + before value
    assert update["payload_val"] == 5.17 and update["before_val"] == 3.14

    # delete: Debezium's contract puts the row image in `before`
    assert delete["payload_val"] == 5.17 and delete["before_val"] is None
    assert delete["pk"] == 101

    # snapshot read -> refresh semantics (backfill), image from after
    assert snap["pk"] == 102 and snap["payload_val"] == 8.1

    # 2.6 events prefer microsecond source time (lossless)
    assert create_us["pk"] == 103
    assert str(create_us["timestamp"]) == "2024-04-26 12:23:37.000123"
    assert create_us["offset"] == 2  # source.row -> intra-event offset

    # transaction-block update parses like any other
    assert upd_txn["payload_val"] == 0.875 and upd_txn["before_val"] == 0.75


def test_golden_corpus_flows_through_the_envelope(spark):
    """The normalized corpus runs the REAL downstream composition: filters +
    refresh routing + transaction id + schema-id join. inventory.products is
    not in the registry, so schema_id surfaces as NULL (the engine's
    loud-miss contract) — the rest of the envelope is exact."""
    from mysql_streamer_spark.cdc.pipeline import envelope_from_cdc
    from mysql_streamer_spark.connectors.kafka import debezium_to_cdc

    cdc = debezium_to_cdc(
        _raw_df(spark), pk_field="id", k_field="id", val_field="weight"
    )
    env = envelope_from_cdc(cdc).orderBy("txn_order")
    rows = [r.asDict() for r in env.collect()]
    assert len(rows) == 6
    assert all(r["schema_id"] is None for r in rows)  # unregistered table
    assert all(r["cluster_name"] == "refresh_primary" for r in rows)
    # txn_order is monotonic in (file, pos, row) — binlog order preserved
    orders = [r["txn_order"] for r in rows]
    assert orders == sorted(orders)
    by_type = {r["message_type"] for r in rows}
    assert by_type == {"create", "update", "delete", "refresh"}
    # refresh never carries a previous payload; updates always do
    for r in rows:
        if r["message_type"] == "refresh":
            assert r["previous_payload_val"] is None
        if r["message_type"] == "update":
            assert r["previous_payload_val"] is not None


def test_encode_matches_wire_format_fields(spark):
    """cdc_to_debezium_json's output parses under the SAME golden-corpus
    reader — encoder and wire format cannot drift apart silently."""
    from mysql_streamer_spark.connectors.kafka import (
        cdc_to_debezium_json,
        debezium_to_cdc,
    )

    cdc = debezium_to_cdc(
        _raw_df(spark), pk_field="id", k_field="id", val_field="weight"
    )
    reencoded = cdc_to_debezium_json(cdc)
    assert {"value", "offset"} <= set(reencoded.columns)
    p = json.loads(reencoded.orderBy("offset").limit(1).collect()[0]["value"])
    assert set(p["payload"]) >= {"op", "before", "after", "source"}
    assert set(p["payload"]["source"]) >= {"db", "table", "file", "pos", "row"}
