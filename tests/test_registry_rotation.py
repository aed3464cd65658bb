"""Driver-coverage rotation (queries/__init__.py): tier classification from
recorded CORRECTNESS files and the prefix guarantees the driver relies on."""

from __future__ import annotations

import json
from pathlib import Path


def _write(tmp_path: Path, name: str, rows: dict) -> None:
    (tmp_path / name).write_text(json.dumps(rows))


GREEN = {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
RED_HASH = {"err": None, "rows_match": True, "schema_match": True, "hash_match": False}
RED_ERR = {"err": "boom", "rows_match": None, "schema_match": None, "hash_match": None}


def test_latest_row_wins_over_older_green(tmp_path):
    from mysql_streamer_spark.queries import _checked_names_under

    _write(tmp_path, "CORRECTNESS_r01.json", {"q_a": GREEN, "q_b": GREEN})
    _write(tmp_path, "CORRECTNESS_r02.json", {"q_a": RED_HASH, "q_c": RED_ERR})
    green, failed = _checked_names_under(tmp_path)
    assert green == {"q_b"}
    assert failed == {"q_a", "q_c"}  # old green must NOT mask the regression


def test_later_green_clears_earlier_failure(tmp_path):
    from mysql_streamer_spark.queries import _checked_names_under

    _write(tmp_path, "CORRECTNESS_r01.json", {"q_a": RED_ERR})
    _write(tmp_path, "CORRECTNESS_r02.json", {"q_a": GREEN})
    green, failed = _checked_names_under(tmp_path)
    assert green == {"q_a"} and failed == set()


def test_garbage_files_are_ignored(tmp_path):
    from mysql_streamer_spark.queries import _checked_names_under

    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    _write(tmp_path, "CORRECTNESS_r02.json", {"q_a": GREEN})
    (tmp_path / "CORRECTNESS_r03.json").write_text('["a", "list"]')
    green, failed = _checked_names_under(tmp_path)
    assert green == {"q_a"} and failed == set()


def test_no_files_means_everything_unchecked(tmp_path):
    from mysql_streamer_spark.queries import _checked_names_under

    assert _checked_names_under(tmp_path) == (frozenset(), frozenset())


def test_live_registry_prefix_properties():
    """The actual repo state: registration order is duplicate-free, every
    spec in the driver's 50-query prefix is not-yet-green by the latest
    recorded rows, and every currently-failed query sits inside it."""
    from mysql_streamer_spark.queries import all_specs, _driver_checked_names

    specs = all_specs()
    names = [s.name for s in specs]
    assert len(names) == len(set(names))
    green, failed = _driver_checked_names()
    prefix = set(names[: min(50, len(names))])
    if len(names) - len(green) >= 50:
        assert not (prefix & green)
    assert failed <= prefix or len(failed) > 50
