"""CLI entry-point tests (reference §3 binaries parity): each subcommand
drives the same code paths the library tests cover, so these assert the
argument wiring and output contract."""

from __future__ import annotations

import json
import os

from mysql_streamer_spark.cli import main


def test_registry_dump_lists_every_bootstrap_table(capsys):
    assert main(["registry-dump"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) >= 1
    first = lines[0]
    assert {"database", "table", "schema_id", "version", "columns"} <= set(first)
    # schema ids are unique across tables
    ids = [l["schema_id"] for l in lines]
    assert len(set(ids)) == len(ids)


def test_heartbeat_search_finds_position(spark, sf_dir, capsys):
    rc = main(["heartbeat-search", "2024-03-01 00:00:00", "--sf-dir", sf_dir])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["found"] is True
    assert out["log_file"].startswith("binlog.")
    assert out["log_pos"] >= 0


def test_heartbeat_search_before_stream_start_fails(spark, sf_dir, capsys):
    rc = main(["heartbeat-search", "1970-01-02 00:00:00", "--sf-dir", sf_dir])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["found"] is False


def test_stream_command_drains_to_sink(spark, sf_dir, tmp_path, capsys):
    src = tmp_path / "src"
    os.makedirs(src)
    os.symlink(f"{sf_dir}/events.parquet", src / "events.parquet")
    rc = main(
        [
            "stream",
            str(src),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["batches"] >= 1
    sunk = spark.read.parquet(str(tmp_path / "out"))
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline

    assert sunk.count() == envelope_pipeline(spark, sf_dir).count()


def test_changelog_command_matches_batch_projection(spark, sf_dir, tmp_path, capsys):
    import json as _json
    import os as _os

    src = tmp_path / "src"
    _os.makedirs(src)
    _os.symlink(f"{sf_dir}/events.parquet", src / "events.parquet")
    rc = main(
        ["changelog", str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")]
    )
    assert rc == 0
    _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sunk = spark.read.parquet(str(tmp_path / "out"))
    from mysql_streamer_spark.queries.cdc import q_cdc_changelog

    expected = q_cdc_changelog(spark, sf_dir)
    assert sunk.count() == expected.count()
    assert set(sunk.columns) >= set(expected.columns)


def test_dataset_card_prints_one_json_row(spark, sf_dir, capsys):
    from mysql_streamer_spark.cli import main

    assert main(["dataset-card", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    card = json.loads(out[0])
    assert card["n_docs"] > 0 and card["total_tokens"] > 0


def test_query_command_runs_registered_operator(spark, sf_dir, capsys):
    from mysql_streamer_spark.cli import main

    assert main(["query", "text_fertility", "--sf-dir", sf_dir, "--limit", "5"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert 1 <= len(out) <= 5
    assert "fertility" in json.loads(out[0])


def test_query_command_unknown_name_fails(spark, sf_dir, capsys):
    from mysql_streamer_spark.cli import main

    assert main(["query", "no_such_query", "--sf-dir", sf_dir]) == 2


def test_heartbeat_search_with_serial_exact_matches(spark, sf_dir, capsys):
    """CLI parity with mysql_heartbeat_search TS SERIAL: the serial is an
    exact match key, so the right serial finds its heartbeat and a serial
    that never fired at that timestamp fails."""
    from mysql_streamer_spark.cdc.pipeline import heartbeat_stream

    r = heartbeat_stream(spark, sf_dir).orderBy("serial").limit(1).collect()[0]
    ts = str(r.timestamp)
    rc = main(["heartbeat-search", ts, str(r.serial), "--sf-dir", sf_dir])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["found"] is True
    assert out["serial"] == r.serial
    assert out["log_file"] == r.log_file and out["log_pos"] == r.log_pos
    # output contract: timestamp is the str(datetime) form, not epoch floats
    assert out["timestamp"] == str(r.timestamp)

    rc = main(["heartbeat-search", ts, str(r.serial + 10**9), "--sf-dir", sf_dir])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["found"] is False


def test_sql_verb_queries_envelope_view(spark, sf_dir, capsys):
    rc = main(
        [
            "sql",
            "SELECT message_type, count(*) AS n FROM envelope"
            " GROUP BY 1 ORDER BY 1",
            "--sf-dir",
            sf_dir,
        ]
    )
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rc == 0 and len(lines) >= 2
    assert {"message_type", "n"} <= set(lines[0])
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline

    total = sum(int(l["n"]) for l in lines)
    assert total == envelope_pipeline(spark, sf_dir).count()


def test_sql_verb_joins_fixture_table_to_registry(spark, sf_dir, capsys):
    rc = main(
        [
            "sql",
            "SELECT e.table_name, r.schema_id FROM envelope e "
            "JOIN schema_registry r ON e.database_name = r.database "
            "AND e.table_name = r.table LIMIT 1",
            "--sf-dir",
            sf_dir,
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "schema_id" in out


def test_sql_verb_reports_bad_sql(spark, sf_dir, capsys):
    rc = main(["sql", "SELECT FROM nowhere", "--sf-dir", sf_dir])
    assert rc == 2
    err = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert "error" in err

def test_state_at_rejects_malformed_log_file(capsys):
    # `state-at foo` used to die with a raw ValueError traceback; it must
    # exit 2 with a JSON error instead (ADVICE r7)
    rc = main(["state-at", "not-a-binlog-name"])
    assert rc == 2
    err = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert "binlog" in err["error"]


def test_state_diff_verb_matches_registered_query(spark, sf_dir, capsys):
    """The CLI diff over the registered query's own window must agree
    with q_cdc_state_diff exactly (same composition, CLI-parsed cutoffs)."""
    import json as _json

    from mysql_streamer_spark.queries.cdc import (
        STATE_DIFF_FROM_FILE,
        STATE_DIFF_TO_FILE,
        q_cdc_state_diff,
    )

    rc = main(
        [
            "state-diff",
            f"binlog.{STATE_DIFF_FROM_FILE:06d}",
            f"binlog.{STATE_DIFF_TO_FILE:06d}",
            "--sf-dir",
            sf_dir,
        ]
    )
    assert rc == 0
    got = {
        (r["database_name"], r["table_name"], r["change_kind"]): r["n_keys"]
        for r in (
            _json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
        )
    }
    expected = {
        (r.database_name, r.table_name, r.change_kind): r.n_keys
        for r in q_cdc_state_diff(spark, sf_dir).collect()
    }
    assert got == expected


def test_state_diff_rejects_bad_input(capsys):
    rc = main(["state-diff", "nope", "binlog.000008"])
    assert rc == 2
    assert "binlog" in json.loads(capsys.readouterr().err.strip().splitlines()[-1])["error"]
    rc = main(["state-diff", "binlog.000008", "binlog.000004"])
    assert rc == 2
    assert "precede" in json.loads(capsys.readouterr().err.strip().splitlines()[-1])["error"]


def test_snapshot_command_dumps_jdbc_table_to_parquet(spark, sf_dir, tmp_path, capsys):
    from mysql_streamer_spark.connectors.jdbc import (
        DERBY_DRIVER,
        embedded_derby_fixture,
    )
    from mysql_streamer_spark.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    url = embedded_derby_fixture(spark, nation, "nation")
    out = str(tmp_path / "snap")
    rc = main(
        [
            "snapshot",
            url,
            "nation",
            out,
            "--driver",
            DERBY_DRIVER,
            "--partition-column",
            "n_nationkey",
            "--lower-bound",
            "0",
            "--upper-bound",
            "25",
            "--num-partitions",
            "4",
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["rows"] == nation.count()
    assert spark.read.parquet(out).count() == nation.count()
