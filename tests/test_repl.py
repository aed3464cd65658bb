"""Interactive streamer (repl.py) — the reference's dev loop
(interactive_streamer.py:1-116): type DDL/DML, watch schema registrations
and enveloped messages. The VERDICT-r6 acceptance sequence is the core
test: CREATE → INSERT → ALTER → INSERT, asserting the printed envelopes."""

from __future__ import annotations

import io
import json

import pytest

from mysql_streamer_spark.repl import ReplSession, run_repl


@pytest.fixture()
def sess(spark):
    return ReplSession(spark)


def _msgs(lines):
    return [json.loads(l) for l in lines if not l.startswith("--")]


def test_create_insert_alter_insert(sess):
    out = sess.execute("CREATE TABLE yelp.biz (id int, name varchar(64))")
    assert out == ["-- schema yelp.biz v1 schema_id=1: id int, name string"]

    m1 = _msgs(sess.execute("INSERT INTO biz (id, name) VALUES (1, 'Cafe')"))
    assert len(m1) == 1
    assert m1[0]["message_type"] == "create"
    assert m1[0]["schema_id"] == 1
    assert m1[0]["database_name"] == "yelp" and m1[0]["table_name"] == "biz"
    assert json.loads(m1[0]["payload_data"]) == {"id": 1, "name": "Cafe"}
    assert m1[0]["previous_payload_data"] is None

    out = sess.execute("ALTER TABLE biz ADD COLUMN rating int DEFAULT 5")
    assert out == [
        "-- schema yelp.biz v2 schema_id=2: id int, name string, rating int"
    ]

    m2 = _msgs(sess.execute("INSERT INTO biz (id, name) VALUES (2, 'Bar')"))
    # post-ALTER inserts publish under the NEW schema id with the default
    assert m2[0]["schema_id"] == 2
    assert json.loads(m2[0]["payload_data"]) == {"id": 2, "name": "Bar", "rating": 5}


def test_update_carries_before_image(sess):
    sess.execute("CREATE TABLE t (id int, v varchar(8))")
    sess.execute("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    m = _msgs(sess.execute("UPDATE t SET v = 'z' WHERE id = 2"))
    assert len(m) == 1
    assert m[0]["message_type"] == "update"
    assert json.loads(m[0]["payload_data"]) == {"id": 2, "v": "z"}
    assert json.loads(m[0]["previous_payload_data"]) == {"id": 2, "v": "b"}


def test_delete_publishes_removed_row(sess):
    sess.execute("CREATE TABLE t (id int, v int)")
    sess.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
    m = _msgs(sess.execute("DELETE FROM t WHERE id = 1"))
    assert m[0]["message_type"] == "delete"
    assert json.loads(m[0]["payload_data"]) == {"id": 1, "v": 10}
    # the row store no longer matches it
    assert _msgs(sess.execute("DELETE FROM t WHERE id = 1")) == []


def test_multirow_insert_gets_per_row_offsets(sess):
    """S3 row-explode parity: one statement carrying N rows publishes N
    messages sharing the position, ordered by intra-statement offset."""
    sess.execute("CREATE TABLE t (id int)")
    m = _msgs(sess.execute("INSERT INTO t VALUES (1), (2), (3)"))
    assert [x["offset"] for x in m] == [0, 1, 2]
    assert len({x["log_pos"] for x in m}) == 1
    assert sorted({x["txn_order"] for x in m}) == [x["txn_order"] for x in m]


def test_refresh_table_rerouting(sess):
    """S4: rows typed at <t>_data_pipeline_refresh come out relabeled to the
    base table as message_type=refresh with no previous payload."""
    sess.execute("CREATE TABLE t (id int, v int)")
    m = _msgs(
        sess.execute("INSERT INTO t_data_pipeline_refresh VALUES (7, 70)")
    )
    assert m[0]["table_name"] == "t"
    assert m[0]["message_type"] == "refresh"
    assert m[0]["previous_payload_data"] is None


def test_rename_moves_identity(sess):
    sess.execute("CREATE TABLE a (id int)")
    sess.execute("RENAME TABLE a TO b")
    m = _msgs(sess.execute("INSERT INTO b VALUES (1)"))
    assert m[0]["table_name"] == "b" and m[0]["schema_id"] == 1
    with pytest.raises(Exception):
        # the old identity is gone
        _ = [l for l in sess.execute("INSERT INTO a VALUES (2)")]


def test_unsupported_statement_is_dropped_not_fatal(sess):
    out = sess.execute("GRANT ALL ON *.* TO 'x'")
    assert out and out[0].startswith("-- ignored")


def test_dml_before_create_is_a_schema_miss(sess):
    from mysql_streamer_spark.repl import ReplError

    with pytest.raises(ReplError, match="no schema registered"):
        sess._dml("INSERT INTO nope VALUES (1)")


def test_run_repl_script(spark):
    buf = io.StringIO()
    n = run_repl(
        spark,
        [
            "CREATE TABLE t (id int, v varchar(4));"
            "INSERT INTO t VALUES (1, 'x');"
            "UPDATE t SET v = 'y' WHERE id = 1"
        ],
        out=buf,
    )
    assert n == 3
    lines = buf.getvalue().strip().splitlines()
    assert lines[0].startswith("-- schema yelp.t v1")
    msgs = _msgs(lines)
    assert [m["message_type"] for m in msgs] == ["create", "update"]
    # statement errors print, they don't kill the loop
    buf2 = io.StringIO()
    run_repl(spark, ["INSERT INTO missing VALUES (1)", "!tables"], out=buf2)
    assert "-- error: no schema registered" in buf2.getvalue()


def test_select_inspects_the_row_store(sess):
    """The MySQL-shell pane of the dev loop: real Spark SQL over the
    registry-typed row store, reflecting prior DML."""
    sess.execute("CREATE TABLE t (id int, v varchar(8), n int)")
    sess.execute("INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    sess.execute("DELETE FROM t WHERE id = 2")
    out = sess.execute("SELECT id, n FROM t WHERE n >= 10 ORDER BY id DESC")
    rows = [json.loads(l) for l in out]
    assert rows == [{"id": 3, "n": 30}, {"id": 1, "n": 10}]
    agg = json.loads(sess.execute("SELECT sum(n) AS total FROM t")[0])
    assert agg == {"total": 40}


def test_update_rejects_pk_collision_and_unknown_columns(sess):
    from mysql_streamer_spark.repl import ReplError

    sess.execute("CREATE TABLE t (id int, v int)")
    sess.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
    with pytest.raises(ReplError, match="duplicate primary key"):
        sess._dml("UPDATE t SET id = 2 WHERE id = 1")
    with pytest.raises(ReplError, match="unknown columns"):
        sess._dml("UPDATE t SET w = 9 WHERE id = 1")
    # the failed statements left the store untouched
    rows = {json.loads(l)["id"] for l in sess.execute("!rows yelp.t")}
    assert rows == {1, 2}


def test_multirow_insert_is_atomic(sess):
    from mysql_streamer_spark.repl import ReplError

    sess.execute("CREATE TABLE t (id int)")
    with pytest.raises(ReplError, match="duplicate primary key"):
        sess._dml("INSERT INTO t VALUES (1), (1)")
    # the first tuple must NOT linger as a phantom row
    m = _msgs(sess.execute("INSERT INTO t VALUES (1)"))
    assert m[0]["message_type"] == "create"


def test_where_string_literal_containing_and(sess):
    sess.execute("CREATE TABLE t (id int, name varchar(32))")
    sess.execute("INSERT INTO t VALUES (1, 'rock and roll'), (2, 'jazz')")
    m = _msgs(sess.execute("UPDATE t SET id = 3 WHERE name = 'rock and roll'"))
    assert len(m) == 1 and json.loads(m[0]["payload_data"])["id"] == 3


def test_select_errors_do_not_kill_the_loop_and_empty_tables_resolve(spark):
    buf = io.StringIO()
    run_repl(
        spark,
        [
            "CREATE TABLE empty_t (id int);"
            "SELECT * FROM nosuch;"
            "SELECT count(*) AS n FROM empty_t"
        ],
        out=buf,
    )
    out = buf.getvalue()
    assert "-- error (AnalysisException)" in out
    assert '{"n": 0}' in out  # created-but-empty table is SELECTable


def test_cli_repl_execute(spark, capsys):
    from mysql_streamer_spark.cli import main

    rc = main(
        [
            "repl",
            "--execute",
            "CREATE TABLE t (id int); INSERT INTO t VALUES (9)",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "-- schema yelp.t v1" in out
    assert '"message_type": "create"' in out.replace("'", '"') or '"create"' in out
