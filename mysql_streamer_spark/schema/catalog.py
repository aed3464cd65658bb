"""Q5 — table-metadata introspection parity.

The reference introspects ``information_schema.COLUMNS`` /
``KEY_COLUMN_USAGE`` into MySQLTable/MySQLColumn/MySQLKey
(components/mysql_parser.py:22-190). The Spark-native equivalents:

- ``table_columns``: column metadata straight from the registry's
  StructTypes (name, Spark type, nullable, wire transform).
- ``sync_registry_to_catalog``: project every registered table into the
  Spark catalog as a typed (empty) view, so standard catalog APIs —
  ``spark.catalog.listColumns``, ``DESCRIBE`` — answer introspection
  queries against the registry's view of the upstream schema.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from mysql_streamer_spark.schema.registry import SchemaRegistry


@dataclass(frozen=True)
class ColumnInfo:
    name: str
    spark_type: str
    nullable: bool
    wire_transform: str | None


def table_columns(
    registry: SchemaRegistry, database: str, table: str
) -> list[ColumnInfo]:
    entry = registry.get(database, table)
    if entry is None:
        raise KeyError(f"unknown table {database}.{table}")
    return [
        ColumnInfo(
            name=f.name,
            spark_type=f.dataType.simpleString(),
            nullable=f.nullable,
            wire_transform=entry.transformation_map.get(f.name),
        )
        for f in entry.struct.fields
    ]


def catalog_view_name(database: str, table: str, prefix: str = "reg__") -> str:
    return f"{prefix}{database}__{table}"


def sync_registry_to_catalog(
    spark: SparkSession, registry: SchemaRegistry, prefix: str = "reg__"
) -> list[str]:
    """Register each table's LATEST schema as a typed empty view; returns
    the view names. Catalog introspection then reflects the registry."""
    names = []
    for db, table in registry.tables():
        entry = registry.get(db, table)
        name = catalog_view_name(db, table, prefix)
        spark.createDataFrame([], entry.struct).createOrReplaceTempView(name)
        names.append(name)
    return names
