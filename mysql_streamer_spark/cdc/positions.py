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
