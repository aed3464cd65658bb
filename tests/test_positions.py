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
