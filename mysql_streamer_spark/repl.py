"""Interactive streamer — the reference's dev REPL re-expressed for Spark.

The reference ships ``interactive_streamer.py:1-116``: a tmux + docker
harness with three panes — a MySQL shell you type DDL/DML into, the
replication handler's logs, and a Kafka console consumer tailing the
published messages. The developer loop it enables is: *type a statement,
watch the enveloped message(s) come out*.

This module is that loop without the containers. A ``ReplSession`` keeps

- a live :class:`SchemaRegistry` fed by every DDL statement you type — the
  schema-tracker pane (reference ``components/schema_tracker.py:31-119``);
- a tiny in-memory row store per table, keyed by primary key, so UPDATE and
  DELETE produce faithful *row images* (before/after values) exactly like a
  row-based-replication binlog event would carry
  (``util/message_builder.py:80-88``); and
- monotonic binlog position counters (log_file/log_pos, per-row offset).

Each DML statement becomes a one-statement micro-batch: its row images are
assembled into a DataFrame and routed through the REAL envelope
composition — ``reroute_refresh_tables`` → ``with_transaction_id`` →
``with_schema_ids`` against the live registry dimension — and the resulting
messages print as JSON lines (the Kafka pane).

This is DEV TOOLING, not the data path: statements are typed one at a time
by a human, so the per-statement ``createDataFrame`` is inherently
driver-side and row counts are interactive-scale. The batch/streaming data
path never goes through this module.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_streamer_spark.cdc.envelope import (
    reroute_refresh_tables,
    with_schema_ids,
    with_transaction_id,
)
from mysql_streamer_spark.cdc.source import REFRESH_SUFFIX
from mysql_streamer_spark.schema.ddl_parser import StatementKind, parse_statement
from mysql_streamer_spark.schema.registry import SchemaRegistry, UnsupportedDDLError

#: The row-image frame fed to the envelope composition. ``payload_data`` /
#: ``before_data`` are JSON objects (the reference envelope's payload is a
#: dict, message_builder.py:51-78); positions mirror the CDC event shape.
REPL_EVENT_SCHEMA = (
    "database string, table string, message_type string, "
    "timestamp string, log_file string, log_pos long, offset int, "
    "pk string, payload_data string, before_data string"
)

_DML_HEAD = re.compile(r"^\s*(insert|update|delete)\b", re.IGNORECASE)

_INSERT_RE = re.compile(
    r"^\s*insert\s+into\s+(?P<ident>[`\w.]+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?values\s*(?P<values>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*update\s+(?P<ident>[`\w.]+)\s+set\s+(?P<sets>.+?)"
    r"(?:\s+where\s+(?P<where>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*delete\s+from\s+(?P<ident>[`\w.]+)"
    r"(?:\s+where\s+(?P<where>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


class ReplError(ValueError):
    """A statement the REPL understands enough to reject with a message."""


def _parse_literal(tok: str) -> Any:
    tok = tok.strip()
    if tok.upper() == "NULL":
        return None
    if tok.startswith("'") and tok.endswith("'") and len(tok) >= 2:
        return tok[1:-1].replace("''", "'")
    if re.fullmatch(r"[+-]?\d+", tok):
        return int(tok)
    if re.fullmatch(r"[+-]?\d*\.\d+(e[+-]?\d+)?", tok, re.IGNORECASE):
        return float(tok)
    raise ReplError(f"cannot parse literal: {tok!r}")


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside single-quoted strings and parentheses."""
    parts, depth, in_str, cur = [], 0, False, []
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == "'":
                # '' is an escaped quote inside the string
                if i + 1 < len(s) and s[i + 1] == "'":
                    cur.append("''")
                    i += 2
                    continue
                in_str = False
            cur.append(ch)
        elif ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _assignments(clause: str) -> dict[str, Any]:
    """SET list: comma-separated ``col = literal`` terms, split
    quote-aware so string values may contain commas."""
    out: dict[str, Any] = {}
    for term in _split_top_level(clause):
        m = re.fullmatch(r"\s*`?(\w+)`?\s*=\s*(.+?)\s*", term, re.DOTALL)
        if not m:
            raise ReplError(f"unsupported SET term (only col = literal): {term!r}")
        out[m.group(1)] = _parse_literal(m.group(2))
    return out


def _mask_strings(s: str) -> str:
    """Same-length copy with string-literal interiors replaced by 'x', so
    positional regex splits cannot fire inside quotes."""
    out: list[str] = []
    in_str = False
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    out.append("xx")
                    i += 2
                    continue
                in_str = False
                out.append("'")
            else:
                out.append("x")
        else:
            if ch == "'":
                in_str = True
            out.append(ch)
        i += 1
    return "".join(out)


def _eq_terms(clause: str) -> dict[str, Any]:
    """WHERE as a conjunction of ``col = literal`` terms (the REPL's
    supported predicate language — enough for the pk-targeted statements a
    dev loop types). The AND split positions come from a string-masked
    copy, so literals containing ' and ' survive intact."""
    clause = clause.strip()
    masked = _mask_strings(clause)
    terms, start = [], 0
    for m in re.finditer(r"\s+and\s+", masked, flags=re.IGNORECASE):
        terms.append(clause[start : m.start()])
        start = m.end()
    terms.append(clause[start:])
    out: dict[str, Any] = {}
    for term in terms:
        m = re.fullmatch(r"\s*`?(\w+)`?\s*=\s*(.+?)\s*", term, re.DOTALL)
        if not m:
            raise ReplError(f"unsupported WHERE term (only col = literal): {term!r}")
        val = _parse_literal(m.group(2))
        if val is None:
            # MySQL `col = NULL` matches NO rows (NULL-propagating
            # comparison); a dict-equality match would treat it as IS NULL
            # and hit rows a real shell would not — reject instead
            raise ReplError(
                "col = NULL matches no rows in MySQL; use a non-NULL literal"
            )
        out[m.group(1)] = val
    return out


@dataclass
class _Pending:
    """Row images of one statement, pre-envelope."""

    database: str
    table: str  # as typed — a _data_pipeline_refresh name stays suffixed
    images: list[tuple[str, Any, dict, dict | None]] = field(default_factory=list)
    # (message_type, pk_value, payload, before)


class ReplSession:
    """One interactive session: registry + row store + positions.

    The primary key is the table's FIRST declared column (the REPL
    simplification of the reference's information_schema PK introspection,
    ``components/mysql_parser.py:139-181``).
    """

    def __init__(
        self,
        spark: SparkSession,
        default_database: str = "yelp",
        cluster_name: str = "refresh_primary",
    ) -> None:
        self.spark = spark
        self.registry = SchemaRegistry()
        self.default_database = default_database
        self.cluster_name = cluster_name
        self.rows: dict[tuple[str, str], dict[Any, dict]] = {}
        self._log_pos = 4
        self._file_no = 1
        self._stmt_count = 0

    # -- positions ----------------------------------------------------------
    def _next_position(self) -> tuple[str, int]:
        self._log_pos += 4
        if self._log_pos >= 1000:  # rotate like the fixture's binlog files
            self._file_no += 1
            self._log_pos = 4
        return f"binlog.{self._file_no:06d}", self._log_pos

    def _timestamp(self) -> str:
        # deterministic fake clock: +1s per statement from a fixed epoch
        # (real datetime arithmetic, so minute/hour/day rollover is valid)
        from datetime import datetime, timedelta

        self._stmt_count += 1
        return str(datetime(2024, 1, 1) + timedelta(seconds=self._stmt_count))

    # -- identifiers ----------------------------------------------------------
    def _split_ident(self, ident: str) -> tuple[str, str]:
        ident = ident.replace("`", "")
        if "." in ident:
            db, t = ident.split(".", 1)
            return db, t
        return self.default_database, ident

    def _schema_for(self, database: str, table: str):
        base = (
            table[: -len(REFRESH_SUFFIX)]
            if table.endswith(REFRESH_SUFFIX)
            else table
        )
        entry = self.registry.get(database, base)
        if entry is None:
            raise ReplError(
                f"no schema registered for {database}.{base} — CREATE TABLE first "
                "(the reference blocks and registers on schema miss)"
            )
        return entry

    # -- statement dispatch ---------------------------------------------------
    def execute(self, sql: str) -> list[str]:
        """One statement in, printable lines out (schema notes are ``--``
        comments; messages are JSON objects, one per line)."""
        sql = sql.strip().rstrip(";").strip()
        if not sql:
            return []
        if sql.startswith("!"):
            return self._meta(sql)
        if re.match(r"^\s*select\b", sql, re.IGNORECASE):
            return self._select(sql)
        if _DML_HEAD.match(sql):
            return [json.dumps(m, sort_keys=True) for m in self._dml(sql)]
        return self._ddl(sql)

    def _select(self, sql: str) -> list[str]:
        """Inspect the row store with real Spark SQL (the reference dev
        loop's MySQL-shell pane). Every stored table registers as a temp
        view under its bare name (default database) or ``db_table``;
        values re-enter typed through the table's REGISTERED struct
        (from_json), so the SELECT sees the schema the registry declares,
        not the literal parser's guesses."""
        # every REGISTERED table gets a view — created-but-empty tables
        # must be SELECTable (as empty), not unknown
        for db, t in self.registry.tables():
            entry = self.registry.get(db, t)
            store = self.rows.get((db, t), {})
            payload = [(json.dumps(r),) for r in store.values()]
            df = (
                self.spark.createDataFrame(payload, "j string")
                if payload
                else self.spark.createDataFrame([], "j string")
            )
            typed = df.select(
                F.from_json("j", entry.struct).alias("r")
            ).select("r.*")
            name = t if db == self.default_database else f"{db}_{t}"
            typed.createOrReplaceTempView(name)
        out = self.spark.sql(sql)
        return [
            json.dumps(r.asDict(), sort_keys=True, default=str)
            for r in out.collect()
        ]

    def _meta(self, cmd: str) -> list[str]:
        parts = cmd[1:].split()
        if parts and parts[0] == "tables":
            return [
                f"-- {db}.{t} v{self.registry.get(db, t).version} "
                f"schema_id={self.registry.get(db, t).schema_id}"
                for db, t in sorted(self.registry.tables())
            ] or ["-- (no tables registered)"]
        if parts and parts[0] == "rows" and len(parts) == 2:
            db, t = self._split_ident(parts[1])
            store = self.rows.get((db, t), {})
            return [json.dumps(r, sort_keys=True) for r in store.values()] or [
                "-- (empty)"
            ]
        return ["-- meta commands: !tables | !rows db.table"]

    # -- DDL path -------------------------------------------------------------
    def _ddl(self, sql: str) -> list[str]:
        p = parse_statement(sql, self.default_database)
        if p.kind is StatementKind.UNSUPPORTED:
            # F4 parity: unsupported statements are dropped, not fatal
            return [f"-- ignored (unsupported statement): {sql.splitlines()[0]}"]
        try:
            entry = self.registry.apply_statement(p)
        except UnsupportedDDLError as e:
            return [f"-- ignored (unsupported DDL): {e}"]
        if entry is not None:
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in entry.struct.fields
            )
            return [
                f"-- schema {entry.database}.{entry.table} v{entry.version} "
                f"schema_id={entry.schema_id}: {cols}"
            ]
        return [f"-- tracked ({p.kind.value}): {sql.splitlines()[0]}"]

    # -- DML path -------------------------------------------------------------
    def _dml(self, sql: str) -> list[dict]:
        head = _DML_HEAD.match(sql).group(1).lower()
        pending = getattr(self, f"_parse_{head}")(sql)
        return self._publish(pending)

    def _parse_insert(self, sql: str) -> _Pending:
        m = _INSERT_RE.match(sql)
        if not m:
            raise ReplError(f"cannot parse INSERT: {sql!r}")
        db, table = self._split_ident(m.group("ident"))
        entry = self._schema_for(db, table)
        fields = entry.struct.fieldNames()
        cols = (
            [c.strip().replace("`", "") for c in m.group("cols").split(",")]
            if m.group("cols")
            else list(fields)
        )
        unknown = set(cols) - set(fields)
        if unknown:
            raise ReplError(f"unknown columns {sorted(unknown)} for {db}.{table}")
        pend = _Pending(db, table)
        is_refresh = table.endswith(REFRESH_SUFFIX)
        pk_col = fields[0]
        # two phases: validate EVERY tuple before touching the store, so a
        # bad later tuple cannot leave earlier phantom rows behind
        # (statement atomicity, like the transactional original)
        new_rows: list[dict] = []
        seen_pks: set = set()
        store = self.rows.setdefault((db, table), {})
        for tup in _split_top_level(m.group("values")):
            if not (tup.startswith("(") and tup.endswith(")")):
                raise ReplError(f"cannot parse VALUES tuple: {tup!r}")
            vals = [_parse_literal(v) for v in _split_top_level(tup[1:-1])]
            if len(vals) != len(cols):
                raise ReplError(f"{len(cols)} columns but {len(vals)} values")
            row = dict(zip(cols, vals))
            for f_ in fields:  # defaults for unlisted columns
                if f_ not in row:
                    d = entry.defaults.get(f_)
                    row[f_] = _parse_literal(d) if d is not None else None
            if row.get(pk_col) is None:
                raise ReplError(f"primary key column {pk_col!r} must be set")
            if not is_refresh and (
                row[pk_col] in store or row[pk_col] in seen_pks
            ):
                raise ReplError(f"duplicate primary key {row[pk_col]!r}")
            seen_pks.add(row[pk_col])
            new_rows.append(row)
        for row in new_rows:
            if not is_refresh:
                store[row[pk_col]] = dict(row)
            pend.images.append(("create", row[pk_col], row, None))
        return pend

    def _parse_update(self, sql: str) -> _Pending:
        m = _UPDATE_RE.match(sql)
        if not m:
            raise ReplError(f"cannot parse UPDATE: {sql!r}")
        db, table = self._split_ident(m.group("ident"))
        entry = self._schema_for(db, table)
        sets = _assignments(m.group("sets"))
        fields = set(entry.struct.fieldNames())
        unknown = set(sets) - fields
        if unknown:  # MySQL errors on unknown columns; so does the REPL
            raise ReplError(f"unknown columns {sorted(unknown)} for {db}.{table}")
        where = _eq_terms(m.group("where")) if m.group("where") else {}
        store = self.rows.get((db, table), {})
        pend = _Pending(db, table)
        pk_col = entry.struct.fieldNames()[0]
        matched = [
            (pk_val, row)
            for pk_val, row in sorted(store.items(), key=lambda kv: str(kv[0]))
            if all(row.get(c) == v for c, v in where.items())
        ]
        if pk_col in sets:
            # a pk move must not clobber an existing row (duplicate-key
            # error, like MySQL); validate before mutating anything
            for pk_val, _row in matched:
                tgt = sets[pk_col]
                if tgt != pk_val and (
                    tgt in store or len(matched) > 1
                ):
                    raise ReplError(f"duplicate primary key {tgt!r}")
        for pk_val, row in matched:
            before = dict(row)
            row.update(sets)
            if row[pk_col] != pk_val:  # pk update moves the store key
                del store[pk_val]
                store[row[pk_col]] = row
            pend.images.append(("update", row[pk_col], dict(row), before))
        return pend

    def _parse_delete(self, sql: str) -> _Pending:
        m = _DELETE_RE.match(sql)
        if not m:
            raise ReplError(f"cannot parse DELETE: {sql!r}")
        db, table = self._split_ident(m.group("ident"))
        self._schema_for(db, table)
        where = _eq_terms(m.group("where")) if m.group("where") else {}
        store = self.rows.get((db, table), {})
        pend = _Pending(db, table)
        for pk_val, row in sorted(store.items(), key=lambda kv: str(kv[0])):
            if all(row.get(c) == v for c, v in where.items()):
                pend.images.append(("delete", pk_val, dict(row), None))
        for _, pk_val, _, _ in pend.images:
            store.pop(pk_val, None)
        return pend

    # -- envelope micro-batch ---------------------------------------------------
    def _project(self, entry, row: dict) -> dict:
        """Project a stored row onto the table's CURRENT schema (columns
        added since the row was written surface as their default/NULL —
        evolution semantics, T3)."""
        out = {}
        for f_ in entry.struct.fieldNames():
            if f_ in row:
                out[f_] = row[f_]
            else:
                d = entry.defaults.get(f_)
                out[f_] = _parse_literal(d) if d is not None else None
        return out

    def _publish(self, pend: _Pending) -> list[dict]:
        if not pend.images:
            return []
        entry = self._schema_for(pend.database, pend.table)
        log_file, log_pos = self._next_position()
        ts = self._timestamp()
        rows = [
            (
                pend.database,
                pend.table,
                mtype,
                ts,
                log_file,
                log_pos,
                i,  # per-row offset inside one statement (S3 row explode)
                str(pk),
                json.dumps(self._project(entry, payload), sort_keys=True),
                json.dumps(self._project(entry, before), sort_keys=True)
                if before is not None
                else None,
            )
            for i, (mtype, pk, payload, before) in enumerate(pend.images)
        ]
        df = self.spark.createDataFrame(rows, schema=REPL_EVENT_SCHEMA)
        dim = self.registry.to_dataframe(self.spark).select(
            "database", "table", "schema_id"
        )
        out = repl_envelope(df, dim, self.cluster_name).collect()
        return [r.asDict() for r in out]


def repl_envelope(
    df: DataFrame, dim: DataFrame, cluster_name: str = "refresh_primary"
) -> DataFrame:
    """The REAL envelope composition over row-image micro-batches: refresh
    rerouting (S4) → transaction id (P5) → broadcast schema-id join (T1) →
    the message projection (P3, ``util/message_builder.py:51-78``) with the
    dict payload carried as JSON. Refresh messages never carry a previous
    payload (RefreshMessage semantics)."""
    routed = reroute_refresh_tables(df)
    keyed = with_transaction_id(routed, cluster_name)
    env = with_schema_ids(keyed, dim)
    return env.select(
        F.col("schema_id"),
        F.col("cluster_name"),
        F.col("database").alias("database_name"),
        F.col("table").alias("table_name"),
        F.col("message_type"),
        F.col("timestamp"),
        F.col("log_file"),
        F.col("log_pos"),
        F.col("offset"),
        F.col("txn_order"),
        F.col("pk"),
        F.col("payload_data"),
        F.when(F.col("message_type") != "refresh", F.col("before_data")).alias(
            "previous_payload_data"
        ),
    )


def run_repl(
    spark: SparkSession,
    lines,
    out=None,
    default_database: str = "yelp",
) -> int:
    """Drive a ReplSession from an iterable of input lines; returns the
    number of statements executed. ``;`` separates statements on one line."""
    import sys

    out = out or sys.stdout
    sess = ReplSession(spark, default_database=default_database)
    n = 0
    for line in lines:
        for stmt in _split_top_level(line, sep=";"):
            n += 1
            try:
                for printed in sess.execute(stmt):
                    print(printed, file=out)
            except ReplError as e:
                print(f"-- error: {e}", file=out)
            except Exception as e:  # noqa: BLE001 - a typo'd SELECT must
                # not kill the session (and its schemas + row store)
                first = (str(e).splitlines() or [type(e).__name__])[0]
                print(f"-- error ({type(e).__name__}): {first[:200]}", file=out)
    return n
