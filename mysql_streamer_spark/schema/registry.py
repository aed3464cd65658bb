"""Versioned schema registry — the reference's Schematizer + schema-tracker
collapsed into one transactional table (T1/T2/T3, SURVEY.md §7 phase 1).

The reference kept a shadow MySQL in sync by replaying DDL
(schema_tracker.py:49-68), asked it ``SHOW CREATE TABLE``, and registered
the result with an external Avro registry, caching ``(schema_id,
transformation_map)`` per table (schema_wrapper.py:143-162). Here DDL is
parsed directly (ddl_parser) and applied to Spark StructTypes; every
registration gets a monotonically increasing ``schema_id``; the latest
version per table is exposed as a small DataFrame for broadcast joins
against the stream.

ALTER handling mirrors the reference's diffing dance
(schema_event_handler.py:154-175): the pre-ALTER and post-ALTER schemas are
both retained (as registry versions), and renames invalidate rather than
diff (schema_event_handler.py:205-218).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mysql_streamer_spark.schema.ddl_parser import (
    ParsedStatement,
    StatementKind,
    parse_statement,
)
from mysql_streamer_spark.schema.mysql_types import mysql_type_to_spark


@dataclass(frozen=True)
class SchemaEntry:
    """One registered schema version (reference SchemaWrapperEntry —
    schema_wrapper.py:29-32 — plus the version/provenance the Schematizer
    kept server-side)."""

    database: str
    table: str
    version: int
    schema_id: int
    struct: T.StructType
    #: column -> wire-transform tag (set/timestamp/datetime/time), the
    #: reference's transformation_map (schema_wrapper.py:146-162)
    transformation_map: dict[str, str] = field(default_factory=dict)
    #: column -> DEFAULT literal verbatim ("0", "'x'", "NULL") — the
    #: reference registers defaults into the Avro schema it publishes
    #: (acceptance/complex_statements.feature's expected schemas carry
    #: them); tracked here so evolution preserves/retires them correctly
    defaults: dict[str, str] = field(default_factory=dict)
    source_ddl: str = ""

    def to_row(self) -> dict:
        return {
            "database": self.database,
            "table": self.table,
            "version": self.version,
            "schema_id": self.schema_id,
            "struct_json": self.struct.json(),
            "transformation_map": json.dumps(self.transformation_map, sort_keys=True),
            "source_ddl": self.source_ddl,
        }


class UnsupportedDDLError(ValueError):
    pass


def _struct_from_columns(columns) -> tuple[T.StructType, dict[str, str], dict[str, str]]:
    fields, tmap, defaults = [], {}, {}
    for c in columns:
        mapped = mysql_type_to_spark(c.type_str)
        fields.append(T.StructField(c.name, mapped.spark_type, c.nullable))
        if mapped.wire_transform:
            tmap[c.name] = mapped.wire_transform
        if c.default_str is not None:
            defaults[c.name] = c.default_str
    return T.StructType(fields), tmap, defaults


class SchemaRegistry:
    """In-memory registry with parquet persistence.

    Scale note: the registry is control-plane metadata — one row per schema
    version ever registered, i.e. tiny at any data scale — so a driver-side
    dict plus a broadcast DataFrame view is the right shape; the 100 TB
    concern lives entirely on the stream side.
    """

    def __init__(self) -> None:
        self._entries: dict[tuple[str, str], list[SchemaEntry]] = {}
        self._next_schema_id = 1
        self._dropped: set[tuple[str, str]] = set()

    # -- lookups (T1) ------------------------------------------------------
    def get(self, database: str, table: str) -> SchemaEntry | None:
        versions = self._entries.get((database, table))
        return versions[-1] if versions else None

    def history(self, database: str, table: str) -> list[SchemaEntry]:
        return list(self._entries.get((database, table), []))

    def tables(self) -> list[tuple[str, str]]:
        return sorted(self._entries.keys())

    # -- registration / DDL replay (T2/T3) ---------------------------------
    def _register(
        self,
        database: str,
        table: str,
        struct: T.StructType,
        tmap: dict[str, str],
        ddl: str,
        defaults: dict[str, str] | None = None,
    ) -> SchemaEntry:
        versions = self._entries.setdefault((database, table), [])
        entry = SchemaEntry(
            database=database,
            table=table,
            version=len(versions) + 1,
            schema_id=self._next_schema_id,
            struct=struct,
            transformation_map=tmap,
            defaults=dict(defaults or {}),
            source_ddl=ddl,
        )
        self._next_schema_id += 1
        versions.append(entry)
        self._dropped.discard((database, table))
        return entry

    def apply_statement(
        self, sql: str | ParsedStatement, default_database: str | None = None
    ) -> SchemaEntry | None:
        """Replay one DDL statement; returns the new entry for schema-bearing
        statements, None for ones that are tracked but register nothing
        (DROP, DB-level, index DDL) — UNSUPPORTED raises."""
        p = sql if isinstance(sql, ParsedStatement) else parse_statement(sql, default_database)
        k = p.kind
        if k is StatementKind.UNSUPPORTED:
            raise UnsupportedDDLError(p.raw)
        if k is StatementKind.CREATE_TABLE:
            if p.if_not_exists and self.get(p.database, p.table) is not None:
                return self.get(p.database, p.table)
            struct, tmap, defaults = _struct_from_columns(p.columns)
            return self._register(p.database, p.table, struct, tmap, p.raw, defaults)
        if k is StatementKind.ALTER_TABLE:
            if p.is_rename:
                # a combined "ADD c int, RENAME TO t2" must evolve the schema
                # BEFORE the identity moves, or the ADD is silently lost
                column_ops = tuple(
                    op for op in p.alter_ops
                    if op.op in ("add", "drop", "modify", "change", "rename_column")
                )
                if column_ops:
                    self._apply_alter(replace(p, alter_ops=column_ops))
                self._apply_renames(p.renames)
                return None
            return self._apply_alter(p)
        if k is StatementKind.DROP_TABLE:
            self._entries.pop((p.database, p.table), None)
            self._dropped.add((p.database, p.table))
            return None
        if k is StatementKind.RENAME_TABLE:
            self._apply_renames(p.renames)
            return None
        # database-level + index DDL: position-relevant but schema-neutral
        return None

    def _apply_renames(self, renames) -> None:
        """Rename = move history to the new identity (cache reset semantics:
        the reference clears its cache instead of diffing,
        schema_event_handler.py:205-218)."""
        for old, new in renames:
            old_db, old_tbl = old.split(".", 1)
            new_db, new_tbl = new.split(".", 1)
            versions = self._entries.pop((old_db, old_tbl), None)
            if versions is None:
                continue
            moved = [replace(v, database=new_db, table=new_tbl) for v in versions]
            self._entries[(new_db, new_tbl)] = moved

    def _apply_alter(self, p: ParsedStatement) -> SchemaEntry:
        current = self.get(p.database, p.table)
        if current is None:
            raise KeyError(f"ALTER on unknown table {p.database}.{p.table}")
        fields = list(current.struct.fields)
        tmap = dict(current.transformation_map)
        defaults = dict(current.defaults)
        by_name = {f.name: i for i, f in enumerate(fields)}

        def mapped_field(
            name: str, type_str: str, default_str, nullable: bool = True
        ) -> T.StructField:
            m = mysql_type_to_spark(type_str)
            if m.wire_transform:
                tmap[name] = m.wire_transform
            else:
                tmap.pop(name, None)
            # ADD/MODIFY/CHANGE carry a FULL column definition in MySQL:
            # omitting DEFAULT means the column has no explicit default
            # afterwards, so a stale entry must drop, not persist
            if default_str is not None:
                defaults[name] = default_str
            else:
                defaults.pop(name, None)
            return T.StructField(name, m.spark_type, nullable)

        def place(f: T.StructField, op, from_idx: int | None) -> None:
            """Honor MySQL column placement (FIRST / AFTER c / keep place
            or append) — the reorder semantics
            acceptance/complex_statements.feature exercises with
            ``ADD … AFTER job_description``."""
            if from_idx is not None:
                fields.pop(from_idx)
            if op.position == "FIRST":
                at = 0
            elif isinstance(op.position, tuple):
                anchor = op.position[1]
                names = [x.name for x in fields]
                at = names.index(anchor) + 1 if anchor in names else len(fields)
            elif from_idx is not None:  # modify/change without placement
                at = from_idx
            else:  # plain ADD appends
                at = len(fields)
            fields.insert(at, f)
            by_name.clear()
            by_name.update({x.name: i for i, x in enumerate(fields)})

        for op in p.alter_ops:
            if op.op == "add" and op.type_str:
                place(mapped_field(op.column, op.type_str, op.default_str, op.nullable), op, None)
            elif op.op == "drop" and op.column in by_name:
                idx = by_name.pop(op.column)
                fields.pop(idx)
                tmap.pop(op.column, None)
                defaults.pop(op.column, None)
                by_name = {f.name: i for i, f in enumerate(fields)}
            elif op.op == "modify" and op.column in by_name:
                place(
                    mapped_field(op.column, op.type_str, op.default_str, op.nullable),
                    op,
                    by_name[op.column],
                )
            elif op.op == "change" and op.column in by_name:
                idx = by_name[op.column]
                tmap.pop(op.column, None)
                # CHANGE redefines the column under the new name; the old
                # name's default dies with it (mapped_field sets the new
                # one only if the new definition declares DEFAULT)
                defaults.pop(op.column, None)
                place(
                    mapped_field(op.new_column, op.type_str, op.default_str, op.nullable),
                    op,
                    idx,
                )
            elif op.op == "rename_column" and op.column in by_name:
                # MySQL 8.0 RENAME COLUMN: identity changes, type stays
                idx = by_name.pop(op.column)
                old = fields[idx]
                fields[idx] = T.StructField(op.new_column, old.dataType, old.nullable)
                if op.column in tmap:
                    tmap[op.new_column] = tmap.pop(op.column)
                if op.column in defaults:
                    defaults[op.new_column] = defaults.pop(op.column)
                by_name[op.new_column] = idx
        return self._register(
            p.database, p.table, T.StructType(fields), tmap, p.raw, defaults
        )

    def diff(self, database: str, table: str) -> tuple[T.StructType | None, T.StructType | None]:
        """T3: (pre-ALTER, post-ALTER) schemas of the latest evolution."""
        h = self.history(database, table)
        if not h:
            return (None, None)
        if len(h) == 1:
            return (None, h[-1].struct)
        return (h[-2].struct, h[-1].struct)

    # -- DataFrame view / persistence ---------------------------------------
    _VIEW_SCHEMA = (
        "database string, table string, version int, schema_id int, "
        "struct_json string, transformation_map string, source_ddl string"
    )

    def to_dataframe(self, spark: SparkSession, latest_only: bool = True) -> DataFrame:
        rows = []
        for versions in self._entries.values():
            take = versions[-1:] if latest_only else versions
            rows.extend(v.to_row() for v in take)
        return spark.createDataFrame(rows, schema=self._VIEW_SCHEMA)

    def save(self, spark: SparkSession, path: str) -> None:
        self.to_dataframe(spark, latest_only=False).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SchemaRegistry":
        reg = cls()
        rows = (
            spark.read.parquet(path)
            .orderBy("schema_id")
            .collect()
        )
        for r in rows:
            entry = SchemaEntry(
                database=r.database,
                table=r.table,
                version=r.version,
                schema_id=r.schema_id,
                struct=T.StructType.fromJson(json.loads(r.struct_json)),
                transformation_map=json.loads(r.transformation_map),
                source_ddl=r.source_ddl,
            )
            reg._entries.setdefault((entry.database, entry.table), []).append(entry)
            reg._next_schema_id = max(reg._next_schema_id, entry.schema_id + 1)
        return reg
