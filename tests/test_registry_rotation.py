"""Driver-coverage rotation (queries/__init__.py): tier classification from
recorded CORRECTNESS files and the prefix guarantees the driver relies on."""

from __future__ import annotations

import json
from pathlib import Path


def _write(tmp_path: Path, name: str, rows: dict) -> None:
    (tmp_path / name).write_text(json.dumps(rows))


GREEN = {"err": None, "rows_match": True, "schema_match": True, "hash_match": True}
ROWS_ONLY = {"err": None, "rows_match": True, "schema_match": True, "hash_match": None}
RED_HASH = {"err": None, "rows_match": True, "schema_match": True, "hash_match": False}
RED_ERR = {"err": "boom", "rows_match": None, "schema_match": None, "hash_match": None}


def test_latest_row_wins_over_older_green(tmp_path):
    from mysql_streamer_spark.queries import _latest_rows_under, _row_is_green

    _write(tmp_path, "CORRECTNESS_r01.json", {"q_a": GREEN, "q_b": GREEN})
    _write(tmp_path, "CORRECTNESS_r02.json", {"q_a": RED_HASH, "q_c": RED_ERR})
    latest = _latest_rows_under(tmp_path)
    assert latest["q_a"][0] == 2 and not _row_is_green(latest["q_a"][1], True)
    assert latest["q_b"][0] == 1 and _row_is_green(latest["q_b"][1], True)
    assert not _row_is_green(latest["q_c"][1], True)


def test_later_green_clears_earlier_failure(tmp_path):
    from mysql_streamer_spark.queries import _latest_rows_under, _row_is_green

    _write(tmp_path, "CORRECTNESS_r01.json", {"q_a": RED_ERR})
    _write(tmp_path, "CORRECTNESS_r02.json", {"q_a": GREEN})
    latest = _latest_rows_under(tmp_path)
    assert latest["q_a"][0] == 2 and _row_is_green(latest["q_a"][1], True)


def test_garbage_files_are_ignored(tmp_path):
    from mysql_streamer_spark.queries import _latest_rows_under

    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    _write(tmp_path, "CORRECTNESS_r02.json", {"q_a": GREEN})
    (tmp_path / "CORRECTNESS_r03.json").write_text('["a", "list"]')
    latest = _latest_rows_under(tmp_path)
    assert set(latest) == {"q_a"} and latest["q_a"][0] == 2


def test_no_files_means_everything_unchecked(tmp_path):
    from mysql_streamer_spark.queries import _latest_rows_under

    assert _latest_rows_under(tmp_path) == {}


def test_round_numbers_sort_numerically_not_lexically(tmp_path):
    from mysql_streamer_spark.queries import _latest_rows_under, _row_is_green

    _write(tmp_path, "CORRECTNESS_r02.json", {"q_a": GREEN})
    _write(tmp_path, "CORRECTNESS_r10.json", {"q_a": RED_HASH})
    latest = _latest_rows_under(tmp_path)
    assert latest["q_a"][0] == 10 and not _row_is_green(latest["q_a"][1], True)


def test_null_hash_green_depends_on_oracle_presence():
    """VERDICT r4 item 7: a rows-only row (hash_match null) is green ONLY
    for queries whose spec declares no oracle. An oracle-backed query with
    a null hash means the value check never ran — not green, so the
    rotation re-presents it to the driver."""
    from mysql_streamer_spark.queries import _row_is_green

    assert _row_is_green(ROWS_ONLY, has_oracle=False)
    assert not _row_is_green(ROWS_ONLY, has_oracle=True)
    assert _row_is_green(GREEN, has_oracle=True)
    assert not _row_is_green(RED_HASH, has_oracle=False)


def test_greens_rotate_stalest_first(tmp_path, monkeypatch):
    """ADVICE r4 (high): greens must remain in the rotation — ordered by
    the round of their latest green row, oldest first — so every query is
    eventually re-checked and a regression cannot hide behind an old row."""
    import mysql_streamer_spark.queries as q

    specs = q.all_specs()
    names = [s.name for s in specs]
    rows = {}
    for i, n in enumerate(names):
        rnd = 1 + (i % 3)  # spread greens across three past rounds
        rows.setdefault(rnd, {})[n] = GREEN if specs[i].oracle else ROWS_ONLY
    for rnd, chunk in rows.items():
        _write(tmp_path, f"CORRECTNESS_r{rnd:02d}.json", chunk)
    monkeypatch.setattr(q, "_latest_driver_rows", lambda: q._latest_rows_under(tmp_path))
    rotated = q.all_specs()
    latest = q._latest_rows_under(tmp_path)
    rounds = [latest[s.name][0] for s in rotated]
    # all-green registry: the output must be ordered stalest-round-first
    assert rounds == sorted(rounds)
    assert set(n.name for n in rotated) == set(names)


def test_live_registry_prefix_properties():
    """The actual repo state: registration order is duplicate-free, every
    spec in the driver's 50-query prefix is not-yet-green by the latest
    recorded rows (while unchecked queries remain), and every currently-
    failed query sits inside it."""
    from mysql_streamer_spark.queries import (
        all_specs,
        _latest_driver_rows,
        _row_is_green,
    )

    specs = all_specs()
    names = [s.name for s in specs]
    assert len(names) == len(set(names))
    latest = _latest_driver_rows()
    oracle_by_name = {s.name: s.oracle is not None for s in specs}
    green = {
        n
        for n, (_, row) in latest.items()
        if n in oracle_by_name and _row_is_green(row, oracle_by_name[n])
    }
    failed = {n for n in latest if n in oracle_by_name and n not in green}
    prefix = set(names[: min(50, len(names))])
    if len(names) - len(green) >= 50:
        assert not (prefix & green)
    assert failed <= prefix or len(failed) > 50
