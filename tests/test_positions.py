"""Position model round-trips (reference util/position.py test themes)."""

from __future__ import annotations

import json

import pytest

from mysql_streamer_spark.cdc.positions import (
    GtidPosition,
    HeartbeatPosition,
    LogPosition,
    construct_position,
)


def test_gtid_round_trip():
    p = GtidPosition(gtid="sid:13", offset=10)
    assert p.to_dict() == {"gtid": "sid:13", "offset": 10}
    assert construct_position(p.to_dict()) == p


def test_log_position_round_trip():
    p = LogPosition(log_file="binlog.000001", log_pos=120, offset=5)
    d = json.loads(p.to_json())
    assert d == {"log_file": "binlog.000001", "log_pos": 120, "offset": 5}
    assert construct_position(d) == p


def test_heartbeat_position_fields():
    p = HeartbeatPosition(
        log_file="binlog.000002", log_pos=4, hb_serial=7, hb_timestamp=1700000000.0
    )
    d = p.to_dict()
    assert d["hb_serial"] == 7 and d["hb_timestamp"] == 1700000000.0
    rebuilt = construct_position(d)
    assert rebuilt.log_file == "binlog.000002" and rebuilt.hb_serial == 7


def test_construct_position_rejects_garbage():
    with pytest.raises(ValueError):
        construct_position({"nope": 1})


def test_filter_after_position_intra_event_offset(spark):
    from mysql_streamer_spark.cdc.positions import LogPosition, filter_after_position

    rows = [
        ("binlog.000001", 100, 0),
        ("binlog.000001", 100, 1),  # the restart point
        ("binlog.000001", 100, 2),  # same event, later row -> admitted
        ("binlog.000001", 104, 0),
        ("binlog.000002", 4, 0),
    ]
    df = spark.createDataFrame(rows, "log_file string, log_pos long, offset int")
    pos = LogPosition(log_file="binlog.000001", log_pos=100, offset=1)
    got = {(r.log_file, r.log_pos, r.offset) for r in filter_after_position(df, pos).collect()}
    assert got == {
        ("binlog.000001", 100, 2),
        ("binlog.000001", 104, 0),
        ("binlog.000002", 4, 0),
    }


def test_failover_repoint_resumes_from_heartbeat(spark, sf_dir):
    """R6: timestamp -> HeartbeatPosition -> seek; the resumed stream
    contains exactly the rows past the located heartbeat."""
    from mysql_streamer_spark.cdc.pipeline import cdc_events, heartbeat_stream
    from mysql_streamer_spark.cdc.positions import (
        HeartbeatPosition,
        filter_after_position,
        position_for_timestamp,
    )
    from pyspark.sql import functions as F

    hb = heartbeat_stream(spark, sf_dir)
    mid_ts = hb.agg(F.max("timestamp")).collect()[0][0]
    pos = position_for_timestamp(hb, mid_ts)
    assert isinstance(pos, HeartbeatPosition)
    assert pos.hb_serial is not None

    cdc = cdc_events(spark, sf_dir)
    resumed = filter_after_position(cdc, pos)
    # every admitted row is strictly past the position
    bad = resumed.filter(
        (F.col("log_file") < pos.log_file)
        | ((F.col("log_file") == pos.log_file) & (F.col("log_pos") <= pos.log_pos))
    ).count()
    assert bad == 0
    assert resumed.count() < cdc.count()


def test_exact_heartbeat_lookup_disambiguates_shared_timestamp(spark):
    """Reference parity (heartbeat_searcher.py:121-127): with a serial the
    lookup matches (timestamp, serial) EXACTLY — two heartbeats sharing a
    timestamp each resolve to their own position, and a serial that never
    fired at that timestamp returns None (not the tiebreak winner)."""
    from mysql_streamer_spark.cdc.positions import position_for_timestamp

    hb = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "binlog.000001", 100),
            (2, "2024-01-01 00:00:00", "binlog.000001", 200),
            (3, "2024-01-02 00:00:00", "binlog.000002", 4),
        ],
        "serial long, timestamp string, log_file string, log_pos long",
    ).selectExpr(
        "serial", "CAST(timestamp AS TIMESTAMP) AS timestamp", "log_file", "log_pos"
    )

    p1 = position_for_timestamp(hb, "2024-01-01 00:00:00", serial=1)
    p2 = position_for_timestamp(hb, "2024-01-01 00:00:00", serial=2)
    assert (p1.hb_serial, p1.log_pos) == (1, 100)
    assert (p2.hb_serial, p2.log_pos) == (2, 200)
    # exact contract: no heartbeat with that (ts, serial) pair -> None,
    # even though serial 3 exists at a LATER timestamp
    assert position_for_timestamp(hb, "2024-01-01 00:00:00", serial=3) is None
    # without a serial: newest-at-or-before with serial DESC tiebreak
    p = position_for_timestamp(hb, "2024-01-01 12:00:00")
    assert (p.hb_serial, p.log_pos) == (2, 200)
