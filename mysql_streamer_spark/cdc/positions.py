"""Resume positions (reference util/position.py:27-211).

Spark Structured Streaming tracks offsets natively in its checkpoint; these
dataclasses exist for wire/state parity — the reference persists the
position as a JSON dict in ``global_event_state`` and the same ``to_dict``
shapes are reproduced here so state-table contents are comparable
(FIXTURES.md §F7).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Position:
    """Abstract resume token (reference util/position.py:27-46)."""

    offset: int | None = None

    def to_dict(self) -> dict:
        return {}

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)


@dataclass(frozen=True)
class GtidPosition(Position):
    """GTID-based position (reference util/position.py:49-114)."""

    gtid: str | None = None

    def to_dict(self) -> dict:
        d: dict = {}
        if self.gtid:
            d["gtid"] = self.gtid
        if self.offset is not None:
            d["offset"] = self.offset
        return d


@dataclass(frozen=True)
class LogPosition(Position):
    """(log_file, log_pos) position plus heartbeat provenance
    (reference util/position.py:117-172)."""

    log_file: str | None = None
    log_pos: int | None = None
    hb_serial: int | None = None
    hb_timestamp: float | None = None

    def to_dict(self) -> dict:
        d: dict = {}
        if self.log_file and self.log_pos is not None:
            d["log_file"] = self.log_file
            d["log_pos"] = self.log_pos
        if self.offset is not None:
            d["offset"] = self.offset
        if self.hb_serial is not None:
            d["hb_serial"] = self.hb_serial
        if self.hb_timestamp is not None:
            d["hb_timestamp"] = self.hb_timestamp
        return d


@dataclass(frozen=True)
class HeartbeatPosition(LogPosition):
    """Position located via a heartbeat (serial, timestamp) pair —
    master-independent, so it survives failover (util/position.py:193-211)."""


def construct_position(d: dict) -> Position:
    """Rebuild a Position from its persisted dict (util/position.py:175-190)."""
    if "gtid" in d:
        return GtidPosition(gtid=d["gtid"], offset=d.get("offset"))
    if "log_file" in d:
        return LogPosition(
            log_file=d["log_file"],
            log_pos=d["log_pos"],
            offset=d.get("offset"),
            hb_serial=d.get("hb_serial"),
            hb_timestamp=d.get("hb_timestamp"),
        )
    raise ValueError(f"cannot construct position from {d!r}")


def filter_after_position(cdc, position: LogPosition):
    """S6 — intra-event offset seek: admit only rows strictly PAST the
    saved position, down to the row index inside a multi-row event
    (reference SimpleBinlogStreamReaderWrapper._seek skips ``offset``
    events past the restart point,
    simple_binlog_stream_reader_wrapper.py:133-148). The tuple comparison
    is a plain column predicate, so it pushes into the scan."""
    from pyspark.sql import functions as F

    file_c, pos_c, off_c = F.col("log_file"), F.col("log_pos"), F.col("offset")
    off = position.offset or 0
    return cdc.filter(
        (file_c > position.log_file)
        | ((file_c == position.log_file) & (pos_c > position.log_pos))
        | (
            (file_c == position.log_file)
            & (pos_c == position.log_pos)
            & (off_c > off)
        )
    )


def position_for_timestamp(heartbeats, ts, serial: int | None = None) -> HeartbeatPosition | None:
    """R5/R6 — failover re-pointing: locate a heartbeat and return its
    master-independent HeartbeatPosition (a heartbeat's (timestamp, serial)
    survives a primary switch; the reference scans binlog files
    newest-to-oldest for the same answer, heartbeat_searcher.py:53-64).

    With ``serial`` the lookup is the reference CLI's EXACT contract
    (``mysql_heartbeat_search TS SERIAL``): only the heartbeat whose
    (timestamp, serial) both match is returned
    (heartbeat_searcher.py:121-127's ``hb_serial == hb_serial and
    hb_timestamp == hb_timestamp``) — two heartbeats sharing a timestamp
    resolve to the one the caller asked for, or to None if that exact pair
    never fired. Without ``serial`` it is the re-pointing form: the newest
    heartbeat at or before ``ts``, serial as tiebreaker."""
    from pyspark.sql import functions as F

    if serial is not None:
        matched = heartbeats.filter(
            (F.col("timestamp") == ts) & (F.col("serial") == int(serial))
        )
    else:
        matched = heartbeats.filter(F.col("timestamp") <= ts).orderBy(
            F.col("timestamp").desc(), F.col("serial").desc()
        )
    # The stored epoch is computed JVM-side (micros since the UTC epoch)
    # rather than via ``collected_naive_datetime.timestamp()``: a collected
    # timestamp is a NAIVE datetime whose rendering zone depends on the
    # driver process, and re-parsing it is ambiguous around DST folds — so
    # the epoch must never pass through a naive datetime at all.
    row = (
        matched.withColumn("__ts_us", F.unix_micros(F.col("timestamp")))
        .limit(1)
        .collect()
    )
    if not row:
        return None
    r = row[0]
    return HeartbeatPosition(
        log_file=r.log_file,
        log_pos=r.log_pos,
        offset=0,
        hb_serial=r.serial,
        hb_timestamp=r["__ts_us"] / 1_000_000,
    )
