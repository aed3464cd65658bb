"""Schema registry: DDL replay, evolution, rename invalidation, persistence
(reference themes: schema_event_handlers_test.py, acceptance/*.feature)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mysql_streamer_spark.schema.mysql_types import mysql_type_to_spark
from mysql_streamer_spark.schema.registry import SchemaRegistry, UnsupportedDDLError


def test_type_mapping_families():
    assert mysql_type_to_spark("int(11)").spark_type == T.IntegerType()
    assert mysql_type_to_spark("bigint unsigned").spark_type == T.DecimalType(20, 0)
    assert mysql_type_to_spark("decimal(9,2)").spark_type == T.DecimalType(9, 2)
    assert mysql_type_to_spark("float").spark_type == T.FloatType()
    assert mysql_type_to_spark("double").spark_type == T.DoubleType()
    assert mysql_type_to_spark("varchar(64)").spark_type == T.StringType()
    assert mysql_type_to_spark("blob").spark_type == T.BinaryType()
    assert mysql_type_to_spark("date").spark_type == T.DateType()
    assert mysql_type_to_spark("enum('A','B')").spark_type == T.StringType()

    s = mysql_type_to_spark("set('A','B')")
    assert s.spark_type == T.ArrayType(T.StringType()) and s.wire_transform == "set"
    assert mysql_type_to_spark("time(6)").wire_transform == "time"
    assert mysql_type_to_spark("datetime(6)").wire_transform == "datetime"
    assert mysql_type_to_spark("timestamp").wire_transform == "timestamp"


def test_create_then_alter_add():
    reg = SchemaRegistry()
    e1 = reg.apply_statement(
        "CREATE TABLE biz (id int(11) NOT NULL, name varchar(64))", "db1"
    )
    assert e1.schema_id == 1 and e1.version == 1
    assert [f.name for f in e1.struct.fields] == ["id", "name"]

    e2 = reg.apply_statement(
        "ALTER TABLE biz ADD location varchar(128) DEFAULT NULL", "db1"
    )
    assert e2.schema_id == 2 and e2.version == 2
    assert [f.name for f in e2.struct.fields] == ["id", "name", "location"]

    old, new = reg.diff("db1", "biz")
    assert len(old.fields) == 2 and len(new.fields) == 3


def test_alter_change_renames_column():
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE t (name varchar(64))", "d")
    e = reg.apply_statement("ALTER TABLE t CHANGE name address VARCHAR(64)", "d")
    assert [f.name for f in e.struct.fields] == ["address"]


def test_alter_modify_changes_type_and_tmap():
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE t (c varchar(10))", "d")
    e = reg.apply_statement("ALTER TABLE t MODIFY c time(3)", "d")
    assert e.struct.fields[0].dataType == T.LongType()
    assert e.transformation_map == {"c": "time"}


def test_rename_moves_history():
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE employee (id int)", "d")
    reg.apply_statement("RENAME TABLE employee TO employee_backup", "d")
    assert reg.get("d", "employee") is None
    moved = reg.get("d", "employee_backup")
    assert moved is not None and moved.table == "employee_backup"


def test_alter_rename_moves_history():
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE x (id int)", "d")
    reg.apply_statement("ALTER TABLE x RENAME TO y", "d")
    assert reg.get("d", "x") is None and reg.get("d", "y") is not None


def test_drop_table():
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE t (id int)", "d")
    reg.apply_statement("DROP TABLE t", "d")
    assert reg.get("d", "t") is None


def test_if_not_exists_idempotent():
    reg = SchemaRegistry()
    e1 = reg.apply_statement("CREATE TABLE t (id int)", "d")
    e2 = reg.apply_statement("CREATE TABLE IF NOT EXISTS t (id int)", "d")
    assert e1.schema_id == e2.schema_id


def test_unsupported_raises():
    reg = SchemaRegistry()
    with pytest.raises(UnsupportedDDLError):
        reg.apply_statement("TRUNCATE TABLE t", "d")


def test_db_and_index_ddl_are_schema_neutral():
    reg = SchemaRegistry()
    assert reg.apply_statement("CREATE DATABASE d") is None
    reg.apply_statement("CREATE TABLE t (id int)", "d")
    assert reg.apply_statement("CREATE INDEX i ON t (id)", "d") is None
    assert reg.get("d", "t").version == 1


def test_persistence_round_trip(spark, tmp_path):
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE biz (id int NOT NULL, tags set('A','B'))", "d")
    reg.apply_statement("ALTER TABLE biz ADD c time(6)", "d")
    path = str(tmp_path / "registry")
    reg.save(spark, path)

    loaded = SchemaRegistry.load(spark, path)
    e = loaded.get("d", "biz")
    assert e.version == 2 and e.schema_id == 2
    assert e.transformation_map == {"tags": "set", "c": "time"}
    # next registration continues the id sequence
    e3 = loaded.apply_statement("CREATE TABLE t2 (id int)", "d")
    assert e3.schema_id == 3


def test_combined_add_and_rename_applies_add_first():
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE d.t (id int)", default_database="d")
    reg.apply_statement("ALTER TABLE d.t ADD c int, RENAME TO d.t2")
    assert reg.get("d", "t") is None
    entry = reg.get("d", "t2")
    assert entry is not None
    assert [f.name for f in entry.struct.fields] == ["id", "c"]


def test_rename_column_keeps_type_and_history():
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE d.t (id int, stamp timestamp)")
    reg.apply_statement("ALTER TABLE d.t RENAME COLUMN stamp TO created_at")
    entry = reg.get("d", "t")
    assert [f.name for f in entry.struct.fields] == ["id", "created_at"]
    assert entry.struct["created_at"].dataType == T.TimestampType()
    # the wire transform follows the renamed column
    assert entry.transformation_map.get("created_at") == "timestamp"
    assert "stamp" not in entry.transformation_map
    assert entry.version == 2


def test_rename_index_is_schema_neutral():
    reg = SchemaRegistry()
    reg.apply_statement("CREATE TABLE d.t (id int)")
    reg.apply_statement("ALTER TABLE d.t RENAME INDEX i_a TO i_b")
    entry = reg.get("d", "t")
    # no identity move, no bogus d.INDEX table
    assert reg.tables() == [("d", "t")]
    assert [f.name for f in entry.struct.fields] == ["id"]


def test_bootstrap_replay_admission_and_evolution():
    from mysql_streamer_spark.schema.bootstrap import (
        bootstrap_registry,
        registry_dim_rows,
        DATABASES,
        TABLES,
    )

    reg = bootstrap_registry()
    # blacklisted (test.*) and unsupported (TRUNCATE) never registered
    assert ("test", "scratch") not in reg.tables()
    assert len(reg.tables()) == len(DATABASES) * len(TABLES)
    # evolution bumped versions for the three ALTERed tables
    assert reg.get("db_0", "purchase").version == 2
    assert reg.get("db_0", "click").version == 2
    assert reg.get("db_1", "view").version == 2
    # SET column carries its wire transform
    assert reg.get("db_0", "click").transformation_map["tags"] == "set"
    # dimension rows expose the LATEST id per table, all distinct
    ids = [sid for _, _, sid in registry_dim_rows()]
    assert len(set(ids)) == len(ids)


def test_catalog_introspection_parity(spark):
    """Q5: catalog APIs answer column introspection from the registry."""
    from mysql_streamer_spark.schema.bootstrap import bootstrap_registry
    from mysql_streamer_spark.schema.catalog import (
        sync_registry_to_catalog,
        table_columns,
        catalog_view_name,
    )

    reg = bootstrap_registry()
    names = sync_registry_to_catalog(spark, reg)
    assert catalog_view_name("db_1", "signup") in names

    cols = {c.name: c for c in spark.catalog.listColumns("reg__db_1__signup")}
    assert cols["amount"].dataType == "decimal(12,2)"
    assert cols["tags"].dataType == "array<string>"
    assert cols["wake_time"].dataType == "bigint"  # TIME -> µs long

    info = {c.name: c for c in table_columns(reg, "db_1", "signup")}
    assert info["tags"].wire_transform == "set"
    assert info["created_dt"].wire_transform == "datetime"
    assert info["pk"].nullable is False


def test_confluent_levels_runtime_probe_semantics():
    """The runtime resolvability probe must encode NON-NULL values: the
    view.k long->int change is forward-INCOMPATIBLE precisely because a
    real long value cannot decode as int (a null probe would slip through
    the null branch and misreport FULL)."""
    from mysql_streamer_spark.connectors.avro_wire import (
        avro_schema_for_entry,
        canonical_value,
        schemas_resolvable,
    )
    from mysql_streamer_spark.schema.bootstrap import bootstrap_registry

    reg = bootstrap_registry()
    v1, v2 = (
        avro_schema_for_entry(e) for e in reg.history("db_1", "view")
    )
    assert schemas_resolvable(v1, v2) is True  # int -> long promotes
    assert schemas_resolvable(v2, v1) is False  # long -> int cannot
    # the probe value really is non-null on union fields
    val = canonical_value(v2)
    assert val["k"] == 1 and val["pk"] == 1
    # added nullable columns read as defaults: purchase v1 bytes under v2
    p1, p2 = (
        avro_schema_for_entry(e) for e in reg.history("db_0", "purchase")
    )
    assert schemas_resolvable(p1, p2) and schemas_resolvable(p2, p1)


def test_subject_strategies_and_per_subject_versions(spark):
    """The Confluent subject contract: subjects derive from topic and/or
    record FQN per strategy; versions allocate PER SUBJECT (1..n in
    registration order) while schema ids stay GLOBAL — the same id is
    visible under all three strategies' subjects."""
    from mysql_streamer_spark.queries.schema_registry import (
        SUBJECT_STRATEGIES,
        _subject_for,
        q_schema_registry_subjects,
    )
    from mysql_streamer_spark.schema.bootstrap import bootstrap_registry

    assert _subject_for(
        "TopicNameStrategy", "db_0.purchase", "replication_handler.db_0.purchase"
    ) == "db_0.purchase-value"
    assert _subject_for(
        "RecordNameStrategy", "db_0.purchase", "replication_handler.db_0.purchase"
    ) == "replication_handler.db_0.purchase"
    assert _subject_for(
        "TopicRecordNameStrategy",
        "db_0.purchase",
        "replication_handler.db_0.purchase",
    ) == "db_0.purchase-replication_handler.db_0.purchase"

    out = q_schema_registry_subjects(spark, "/root/testdata/sf0.001").collect()
    by_strategy: dict[str, dict[str, tuple]] = {s: {} for s in SUBJECT_STRATEGIES}
    for r in out:
        by_strategy[r.strategy][r.topic] = (
            r.n_versions,
            r.latest_schema_id,
            r.status,
        )
    # every strategy routes the same topic set, and PER TOPIC the global
    # id + per-subject version count agree across strategies
    topic_sets = {s: set(m) for s, m in by_strategy.items()}
    assert len(set(map(frozenset, topic_sets.values()))) == 1
    for topic in topic_sets["TopicNameStrategy"]:
        rows = {s: by_strategy[s][topic] for s in SUBJECT_STRATEGIES}
        assert len(set(rows.values())) == 1, (topic, rows)
    # the multi-version table allocates subject versions 1..n (n >= 2) and
    # its latest GLOBAL id is the registry's latest id for that table
    reg = bootstrap_registry()
    purchase = reg.history("db_0", "purchase")
    assert len(purchase) >= 2
    n_versions, latest_id, status = by_strategy["TopicNameStrategy"][
        "db_0.purchase"
    ]
    assert (n_versions, latest_id, status) == (
        len(purchase),
        purchase[-1].schema_id,
        "resolved",
    )
    # the DLQ verdict fires per strategy for stream topics with no subject
    unregistered = {
        (r.strategy, r.topic) for r in out if r.status == "unregistered_schema"
    }
    assert {t for _, t in unregistered}, "fixture must exercise the DLQ path"
    for s in SUBJECT_STRATEGIES:
        assert {t for st, t in unregistered if st == s} == {
            t for _, t in unregistered
        }
