"""Schema-subsystem queries: the DDL-replayed registry exposed to the
correctness gate (T1/T2/T3/Q1-Q4 wired end-to-end instead of unit-only).

``schema_registry_state`` replays the deterministic DDL event stream
(admission filters F1/F3/F4 included) and returns every registered schema
version; the oracle is the expected golden state. ``schema_registry_
evolution`` aggregates that registry view with DataFrame ops (version
counts, id ranges, latest column count parsed from the struct JSON), so the
Spark aggregation path is cross-checked against the independently generated
expectation.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_streamer_spark.queries.registry import QuerySpec
from mysql_streamer_spark.schema.bootstrap import (
    bootstrap_registry,
    registry_state_values_sql,
)


def q_schema_registry_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bootstrap_registry().to_dataframe(spark, latest_only=False)


def q_schema_registry_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = bootstrap_registry().to_dataframe(spark, latest_only=False)
    return state.groupBy("database", "table").agg(
        F.count("*").alias("n_versions"),
        F.min("schema_id").alias("first_schema_id"),
        F.max("schema_id").alias("last_schema_id"),
        F.json_array_length(
            F.get_json_object(F.max_by("struct_json", "version"), "$.fields")
        ).alias("n_cols_latest"),
    )


def _evolution_values_sql() -> str:
    reg = bootstrap_registry()
    rows = []
    for db, table in reg.tables():
        h = reg.history(db, table)
        n_cols = len(json.loads(h[-1].struct.json())["fields"])
        rows.append(
            f"('{db}', '{table}', {len(h)}, {h[0].schema_id}, "
            f"{h[-1].schema_id}, {n_cols})"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ') AS t(database, "table", n_versions, first_schema_id, '
        "last_schema_id, n_cols_latest)"
    )


def q_schema_registry_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wire-transform dimension (P2) as a queryable surface: one row
    per (db, table, column, transform) from each table's LATEST schema —
    exactly the broadcast map the payload stage applies, so downstream
    tooling can audit which columns get SET/TIME/DATETIME rewrites."""
    reg = bootstrap_registry()
    rows = []
    for db, table in reg.tables():
        entry = reg.get(db, table)
        for col, tf in sorted(entry.transformation_map.items()):
            rows.append((db, table, entry.schema_id, col, tf))
    return spark.createDataFrame(
        rows, "database string, `table` string, schema_id int, column_name string, transform string"
    )


def _transforms_values_sql() -> str:
    reg = bootstrap_registry()
    rows = []
    for db, table in reg.tables():
        entry = reg.get(db, table)
        for col, tf in sorted(entry.transformation_map.items()):
            rows.append(
                f"('{db}', '{table}', {entry.schema_id}, '{col}', '{tf}')"
            )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ') AS t(database, "table", schema_id, column_name, transform)'
    )


SPECS = [
    QuerySpec("schema_registry_state", q_schema_registry_state, registry_state_values_sql()),
    QuerySpec(
        "schema_registry_transforms",
        q_schema_registry_transforms,
        _transforms_values_sql(),
    ),
    QuerySpec(
        "schema_registry_evolution", q_schema_registry_evolution, _evolution_values_sql()
    ),
]
