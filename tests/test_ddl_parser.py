"""DDL classifier tests — same grammar surface as the reference's
sql_handler_test.py:83-248 (MySQL 5.5/5.6/5.7 incl. modifiers, quoting and
noise tails), written fresh against our parser API."""

from __future__ import annotations

import pytest

from mysql_streamer_spark.schema.ddl_parser import (
    StatementKind as K,
    parse_statement,
)


@pytest.mark.parametrize(
    "sql,kind,db,table",
    [
        ("CREATE TABLE biz (id int(11), name varchar(64))", K.CREATE_TABLE, None, "biz"),
        ("create table `a_db`.`b_table` (x int)", K.CREATE_TABLE, "a_db", "b_table"),
        ("CREATE TABLE IF NOT EXISTS t (x int)", K.CREATE_TABLE, None, "t"),
        ("CREATE TEMPORARY TABLE tmp (x int)", K.CREATE_TABLE, None, "tmp"),
        ("ALTER TABLE biz ADD location varchar(128) DEFAULT NULL", K.ALTER_TABLE, None, "biz"),
        ("ALTER ONLINE IGNORE TABLE t ADD c int", K.ALTER_TABLE, None, "t"),
        ("ALTER TABLE db1.t ENGINE=INNODB", K.ALTER_TABLE, "db1", "t"),
        ("ALTER TABLE t ROW_FORMAT=COMPRESSED", K.ALTER_TABLE, None, "t"),
        ("ALTER TABLE t AUTO_INCREMENT=100", K.ALTER_TABLE, None, "t"),
        ("ALTER TABLE t CONVERT TO CHARACTER SET utf8", K.ALTER_TABLE, None, "t"),
        ("DROP TABLE IF EXISTS `t`", K.DROP_TABLE, None, "t"),
        ("DROP TEMPORARY TABLE x.y", K.DROP_TABLE, "x", "y"),
        ("CREATE DATABASE IF NOT EXISTS d", K.CREATE_DATABASE, "d", None),
        ("CREATE SCHEMA d2", K.CREATE_DATABASE, "d2", None),
        ("ALTER DATABASE d CHARACTER SET utf8", K.ALTER_DATABASE, "d", None),
        ("DROP DATABASE IF EXISTS d", K.DROP_DATABASE, "d", None),
        ("DROP SCHEMA d", K.DROP_DATABASE, "d", None),
        ("CREATE UNIQUE INDEX idx USING BTREE ON t (c)", K.CREATE_INDEX, None, "t"),
        ("CREATE FULLTEXT INDEX idx ON t (c)", K.CREATE_INDEX, None, "t"),
        ("DROP INDEX idx ON a.t", K.DROP_INDEX, "a", "t"),
        ("BEGIN", K.UNSUPPORTED, None, None),
        ("COMMIT", K.UNSUPPORTED, None, None),
        ("INSERT INTO t VALUES (1)", K.UNSUPPORTED, None, None),
        ("GRANT ALL ON *.* TO 'x'", K.UNSUPPORTED, None, None),
        ("TRUNCATE TABLE t", K.UNSUPPORTED, None, None),
    ],
)
def test_classification(sql, kind, db, table):
    p = parse_statement(sql)
    assert p.kind is kind
    assert p.database == db
    assert p.table == table


def test_default_database_applied():
    p = parse_statement("ALTER TABLE t ADD c int", default_database="mydb")
    assert (p.database, p.table) == ("mydb", "t")


def test_quoted_unicode_and_escaped_backticks():
    p = parse_statement("CREATE TABLE `db``x`.`t‽able` (id int)")
    assert p.database == "db`x"
    assert p.table == "t‽able"


def test_create_table_columns():
    p = parse_statement(
        """CREATE TABLE biz (
            id int(11) NOT NULL AUTO_INCREMENT,
            name varchar(64) DEFAULT NULL,
            bal decimal(9,2),
            tags set('A','B'),
            PRIMARY KEY (id),
            KEY name_idx (name)
        ) ENGINE=InnoDB AUTO_INCREMENT=5 DEFAULT CHARSET=utf8"""
    )
    assert [c.name for c in p.columns] == ["id", "name", "bal", "tags"]
    assert p.columns[0].nullable is False
    assert p.columns[1].type_str == "varchar(64)"
    assert p.columns[3].type_str == "set('A','B')"


def test_alter_ops():
    p = parse_statement(
        "ALTER TABLE t ADD location varchar(128) DEFAULT NULL, "
        "DROP COLUMN old_c, MODIFY office varchar(128), "
        "CHANGE name address VARCHAR(64)"
    )
    ops = {o.op: o for o in p.alter_ops}
    assert ops["add"].column == "location" and ops["add"].type_str == "varchar(128)"
    assert ops["drop"].column == "old_c"
    assert ops["modify"].column == "office"
    assert ops["change"].column == "name" and ops["change"].new_column == "address"


def test_rename_table_statement():
    p = parse_statement("RENAME TABLE employee TO employee_backup", default_database="d")
    assert p.kind is K.RENAME_TABLE
    assert p.renames == (("d.employee", "d.employee_backup"),)
    assert p.is_rename


def test_rename_table_multi_pair():
    p = parse_statement("RENAME TABLE a TO b, c.x TO c.y", default_database="d")
    assert p.renames == (("d.a", "d.b"), ("c.x", "c.y"))


def test_alter_rename_detection():
    p = parse_statement("ALTER TABLE x RENAME TO y", default_database="d")
    assert p.kind is K.ALTER_TABLE
    assert p.is_rename
    assert p.renames == (("d.x", "d.y"),)


def test_alter_rename_as():
    p = parse_statement("ALTER TABLE x RENAME AS y", default_database="d")
    assert p.is_rename and p.renames[0][1] == "d.y"


def test_unsupported_never_raises():
    for junk in ["", "???", "SELECT 1", "/* only a comment */", "set names utf8"]:
        assert parse_statement(junk).kind is K.UNSUPPORTED


def test_rename_index_is_not_table_rename():
    p = parse_statement("ALTER TABLE t RENAME INDEX i_old TO i_new", default_database="d")
    assert p.kind is K.ALTER_TABLE
    assert not p.is_rename
    assert p.renames == ()
    ops = {o.op for o in p.alter_ops}
    assert "rename" not in ops
    assert "rename_index" in ops


def test_rename_column_is_column_op():
    p = parse_statement("ALTER TABLE t RENAME COLUMN a TO b", default_database="d")
    assert p.kind is K.ALTER_TABLE
    assert not p.is_rename
    ops = {o.op: o for o in p.alter_ops}
    assert ops["rename_column"].column == "a"
    assert ops["rename_column"].new_column == "b"


def test_combined_add_and_rename_keeps_both_ops():
    p = parse_statement("ALTER TABLE t ADD c int, RENAME TO t2", default_database="d")
    assert p.is_rename
    assert p.renames == (("d.t", "d.t2"),)
    ops = {o.op: o for o in p.alter_ops}
    assert ops["add"].column == "c"


# --- ALTER-chain corpus (reference acceptance/complex_statements.feature) ---

def test_add_column_captures_after_placement_and_default():
    from mysql_streamer_spark.schema.ddl_parser import parse_statement

    p = parse_statement(
        "ALTER TABLE `employee` ADD `office` varchar(64) DEFAULT NULL"
        " AFTER `job_description`",
        default_database="db",
    )
    (op,) = p.alter_ops
    assert op.op == "add" and op.column == "office"
    assert op.position == ("AFTER", "job_description")
    assert op.default_str == "NULL"


def test_add_column_first_placement():
    from mysql_streamer_spark.schema.ddl_parser import parse_statement

    (op,) = parse_statement(
        "ALTER TABLE t ADD badge_id int FIRST", default_database="db"
    ).alter_ops
    assert op.position == "FIRST" and op.default_str is None


def test_modify_keeps_place_without_position_clause():
    from mysql_streamer_spark.schema.ddl_parser import parse_statement

    (op,) = parse_statement(
        "ALTER TABLE t MODIFY office varchar(128)", default_database="db"
    ).alter_ops
    assert op.op == "modify" and op.position is None


def test_change_with_type_change_and_quoted_default():
    from mysql_streamer_spark.schema.ddl_parser import parse_statement

    (op,) = parse_statement(
        "ALTER TABLE t CHANGE update_at updated_at bigint NOT NULL DEFAULT '0'",
        default_database="db",
    ).alter_ops
    assert (op.column, op.new_column) == ("update_at", "updated_at")
    assert op.type_str.lower().startswith("bigint")
    assert op.default_str == "'0'"


def test_create_table_captures_column_defaults():
    from mysql_streamer_spark.schema.ddl_parser import parse_statement

    p = parse_statement(
        "CREATE TABLE t (a int DEFAULT NULL, b varchar(8) NOT NULL DEFAULT 'x',"
        " c float(10,2) NOT NULL DEFAULT 0.00, d int NOT NULL)",
        default_database="db",
    )
    defaults = {c.name: c.default_str for c in p.columns}
    assert defaults == {"a": "NULL", "b": "'x'", "c": "0.00", "d": None}


def test_registry_replays_reference_alter_chain_in_order(spark):
    """End-to-end BDD-chain parity: after the full chain the latest schema
    has office (widened) between job_description and created_at, the
    renamed updated_at as bigint, and badge_id first — the expected
    SHOW CREATE TABLE column order of complex_statements.feature."""
    from mysql_streamer_spark.queries.schema_registry import (
        q_schema_registry_alter_chains,
    )

    rows = q_schema_registry_alter_chains(spark, "").orderBy("version").collect()
    assert [r.version for r in rows] == [1, 2, 3, 4, 5]
    assert rows[-1].columns == (
        "badge_id int, id int, name string, is_active tinyint, salary float, "
        "job_description string, office string, created_at int, updated_at bigint"
    )
    assert rows[1].change_kind == "add:office"
    assert rows[3].change_kind == "change:update_at->updated_at"
    assert "is_active=0" in rows[0].defaults and "salary=0.00" in rows[0].defaults
    # MODIFY without DEFAULT is a full redefinition: office's default dies at v3
    assert "office=NULL" in rows[1].defaults
    assert "office" not in rows[2].defaults


def test_default_keyword_inside_comment_string_is_ignored():
    from mysql_streamer_spark.schema.ddl_parser import parse_statement

    (op,) = parse_statement(
        "ALTER TABLE t ADD c int COMMENT 'uses DEFAULT 5 internally'",
        default_database="db",
    ).alter_ops
    assert op.default_str is None
    # ...while a real DEFAULT next to a comment is still captured
    (op2,) = parse_statement(
        "ALTER TABLE t ADD c int DEFAULT 7 COMMENT 'x DEFAULT y'",
        default_database="db",
    ).alter_ops
    assert op2.default_str == "7"


def test_quoted_default_with_escaped_quote():
    from mysql_streamer_spark.schema.ddl_parser import parse_statement

    p = parse_statement(
        "CREATE TABLE t (a varchar(8) DEFAULT 'it''s')", default_database="db"
    )
    assert p.columns[0].default_str == "'it''s'"


def test_after_keyword_inside_comment_string_is_ignored():
    from mysql_streamer_spark.schema.ddl_parser import parse_statement

    (op,) = parse_statement(
        "ALTER TABLE t ADD c int COMMENT 'goes AFTER everything'",
        default_database="db",
    ).alter_ops
    assert op.position is None


def test_modify_without_default_drops_stale_default():
    from mysql_streamer_spark.schema.registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.apply_statement(
        "CREATE TABLE t (a int DEFAULT 5, b int DEFAULT 6)", default_database="db"
    )
    reg.apply_statement("ALTER TABLE t MODIFY a bigint", default_database="db")
    assert reg.get("db", "t").defaults == {"b": "6"}
    reg.apply_statement(
        "ALTER TABLE t CHANGE b b2 bigint NOT NULL", default_database="db"
    )
    assert reg.get("db", "t").defaults == {}
    reg.apply_statement(
        "ALTER TABLE t MODIFY a int DEFAULT 9", default_database="db"
    )
    assert reg.get("db", "t").defaults == {"a": "9"}
