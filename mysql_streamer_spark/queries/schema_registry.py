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
from mysql_streamer_spark.tables import load_table
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


def q_schema_registry_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-compatibility classification between CONSECUTIVE versions of
    every table — the reference's Schematizer performs exactly this check
    before accepting a new Avro schema (components/schema_wrapper.py:97-141
    registers old+new+ALTER so the registry can judge the evolution).
    Column sets and name:type signatures diff via array ops over the parsed
    struct JSON; the verdict CASE is shared text with the oracle so the two
    engines CLASSIFY independently from the same replayed registry state."""
    from pyspark.sql import Window

    state = bootstrap_registry().to_dataframe(spark, latest_only=False)
    fields_schema = (
        "STRUCT<fields: ARRAY<STRUCT<name: STRING, type: STRING>>>"
    )
    parsed = state.select(
        "database",
        "table",
        "version",
        F.expr(
            f"transform(from_json(struct_json, '{fields_schema}').fields, f -> f.name)"
        ).alias("names"),
        F.expr(
            f"transform(from_json(struct_json, '{fields_schema}').fields, "
            "f -> concat(f.name, ':', f.type))"
        ).alias("sigs"),
    )
    w = Window.partitionBy("database", "table").orderBy("version")
    diffed = (
        parsed.withColumn("prev_names", F.lag("names").over(w))
        .withColumn("prev_sigs", F.lag("sigs").over(w))
        .withColumn(
            "n_added",
            F.when(
                F.col("prev_names").isNull(), F.lit(0)
            ).otherwise(F.size(F.array_except("names", "prev_names"))),
        )
        .withColumn(
            "n_dropped",
            F.when(
                F.col("prev_names").isNull(), F.lit(0)
            ).otherwise(F.size(F.array_except("prev_names", "names"))),
        )
        .withColumn(
            "n_type_changed",
            F.when(F.col("prev_names").isNull(), F.lit(0)).otherwise(
                F.expr(
                    "size(filter(sigs, s -> "
                    "array_contains(prev_names, split_part(s, ':', 1)) "
                    "AND NOT array_contains(prev_sigs, s)))"
                )
            ),
        )
        .withColumn("is_initial", F.col("prev_names").isNull())
    )
    return diffed.select(
        "database",
        "table",
        "version",
        "n_added",
        "n_dropped",
        "n_type_changed",
        F.expr(_COMPAT_CASE).alias("compat"),
    )


#: shared verdict text — identical SQL in both engines
_COMPAT_CASE = """
CASE WHEN is_initial THEN 'initial'
     WHEN n_type_changed > 0 THEN 'type_change'
     WHEN n_added > 0 AND n_dropped > 0 THEN 'rename_or_mixed'
     WHEN n_added > 0 THEN 'add_columns'
     WHEN n_dropped > 0 THEN 'drop_columns'
     ELSE 'identical' END
""".strip()


def _compat_oracle() -> str:
    return f"""
WITH state AS ({registry_state_values_sql()})
, parsed AS (
  SELECT database, "table", version,
    list_transform(
      generate_series(0, CAST(json_array_length(struct_json, '$.fields') AS INT) - 1),
      i -> json_extract_string(struct_json, '$.fields[' || i || '].name')
    ) AS names,
    list_transform(
      generate_series(0, CAST(json_array_length(struct_json, '$.fields') AS INT) - 1),
      i -> json_extract_string(struct_json, '$.fields[' || i || '].name') || ':'
           || json_extract_string(struct_json, '$.fields[' || i || '].type')
    ) AS sigs
  FROM state
), diffed AS (
  SELECT database, "table", version, names, sigs,
    lag(names) OVER w AS prev_names,
    lag(sigs) OVER w AS prev_sigs
  FROM parsed
  WINDOW w AS (PARTITION BY database, "table" ORDER BY version)
), counted AS (
  SELECT database, "table", version,
    prev_names IS NULL AS is_initial,
    CASE WHEN prev_names IS NULL THEN 0
         ELSE len(list_filter(names, n -> NOT list_contains(prev_names, n)))
    END AS n_added,
    CASE WHEN prev_names IS NULL THEN 0
         ELSE len(list_filter(prev_names, n -> NOT list_contains(names, n)))
    END AS n_dropped,
    CASE WHEN prev_names IS NULL THEN 0
         ELSE len(list_filter(sigs, s ->
               list_contains(prev_names, split_part(s, ':', 1))
               AND NOT list_contains(prev_sigs, s)))
    END AS n_type_changed
  FROM diffed
)
SELECT database, "table", version, n_added, n_dropped, n_type_changed,
       {_COMPAT_CASE} AS compat
FROM counted
"""


def q_schema_registry_column_lifetimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column lifetime table over the replayed registry: for every
    (database, table, column) ever registered, the version span it lived
    through, how many versions it was present in, how many distinct types
    it carried, whether it is live in the table's latest schema, and
    whether it was dropped and re-added (a presence gap). This is the
    audit a consumer team reads before depending on a column — the
    registry-history complement to ``schema_registry_compat``'s
    version-pair diffs (reference: the Schematizer keeps exactly this
    history so downstream consumers can reason about column availability,
    components/schema_wrapper.py:97-141).

    Scale shape: the registry state is a broadcast-scale dimension (one
    row per schema version); fields explode from the struct JSON, one
    hash aggregate per (table, column), and the per-table latest version
    joins broadcast. The oracle recomputes independently from the golden
    registry VALUES via DuckDB's JSON functions — two engines, two JSON
    parsers, same lifetimes."""
    state = bootstrap_registry().to_dataframe(spark, latest_only=False)
    fields_schema = (
        "STRUCT<fields: ARRAY<STRUCT<name: STRING, type: STRING>>>"
    )
    exploded = state.select(
        "database",
        "table",
        "version",
        F.explode(
            F.expr(f"from_json(struct_json, '{fields_schema}').fields")
        ).alias("f"),
    ).select(
        "database",
        "table",
        "version",
        F.col("f.name").alias("column_name"),
        F.col("f.type").alias("col_type"),
    )
    latest = state.groupBy("database", "table").agg(
        F.max("version").alias("latest_version")
    )
    per_col = exploded.groupBy("database", "table", "column_name").agg(
        F.min("version").alias("first_version"),
        F.max("version").alias("last_version"),
        F.count("*").alias("n_versions_present"),
        F.countDistinct("col_type").alias("n_types"),
    )
    return per_col.join(F.broadcast(latest), ["database", "table"]).select(
        "database",
        "table",
        "column_name",
        "first_version",
        "last_version",
        "n_versions_present",
        "n_types",
        (F.col("last_version") == F.col("latest_version")).alias("is_live"),
        (
            F.col("n_versions_present")
            < F.col("last_version") - F.col("first_version") + 1
        ).alias("was_readded"),
    )


def _column_lifetimes_oracle() -> str:
    return f"""
WITH state AS ({registry_state_values_sql()})
, exploded AS (
  SELECT database, "table", version,
    json_extract_string(struct_json, '$.fields[' || i || '].name')
      AS column_name,
    json_extract_string(struct_json, '$.fields[' || i || '].type')
      AS col_type
  FROM state,
    unnest(generate_series(
      0, CAST(json_array_length(struct_json, '$.fields') AS INT) - 1
    )) AS t(i)
), latest AS (
  SELECT database, "table", max(version) AS latest_version
  FROM state GROUP BY 1, 2
), per_col AS (
  SELECT database, "table", column_name,
    min(version) AS first_version,
    max(version) AS last_version,
    CAST(count(*) AS BIGINT) AS n_versions_present,
    CAST(count(DISTINCT col_type) AS BIGINT) AS n_types
  FROM exploded GROUP BY 1, 2, 3
)
SELECT p.database, p."table", p.column_name, p.first_version,
  p.last_version, p.n_versions_present, p.n_types,
  p.last_version = l.latest_version AS is_live,
  p.n_versions_present < p.last_version - p.first_version + 1
    AS was_readded
FROM per_col p
JOIN latest l ON p.database = l.database AND p."table" = l."table"
"""


def q_cdc_schema_version_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of schema resolution: every DML event is stamped with the schema
    version IN EFFECT AT ITS POSITION, not the latest one — the reference's
    true processing semantics (schema_wrapper.py resolves the tracker state
    at the replay position; a row logged before an ALTER must decode with
    the pre-ALTER schema). Refresh-twin tables resolve to their base
    table's schema (the rerouting of
    low_level_binlog_stream_reader_wrapper.py:114-127).

    Scale shape: the version dimension is tiny and versions are converted
    to validity INTERVALS driver-side, so resolution is one broadcast join
    in which each event matches exactly one version — map-side, no window,
    no shuffle until the final per-version count (partial-aggregated).
    """
    from mysql_streamer_spark.cdc.source import (
        HEARTBEAT_DB,
        REFRESH_SUFFIX,
        events_as_cdc,
    )
    from mysql_streamer_spark.schema.bootstrap import versioned_dim_df

    cdc = events_as_cdc(load_table(spark, sf_dir, "events")).filter(
        (F.col("database") != HEARTBEAT_DB) & (F.col("database") != "test")
    )
    cdc = cdc.withColumn(
        "base_table", F.replace(F.col("table"), F.lit(REFRESH_SUFFIX), F.lit(""))
    )
    dim = versioned_dim_df(spark)
    joined = cdc.join(
        F.broadcast(dim),
        (cdc.database == dim.database)
        & (cdc.base_table == dim.table)
        & (cdc.timestamp >= dim.eff_ts)
        & (dim.eff_end.isNull() | (cdc.timestamp < dim.eff_end)),
        "inner",
    )
    return (
        joined.groupBy(cdc.database, "base_table", "version", "schema_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("timestamp").alias("first_ts"),
            F.max("timestamp").alias("last_ts"),
        )
        .select(
            "database",
            F.col("base_table").alias("table"),
            "version",
            "schema_id",
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def _version_routing_oracle() -> str:
    from mysql_streamer_spark.cdc.source import ORACLE_CDC_EVENTS_CTE
    from mysql_streamer_spark.schema.bootstrap import versioned_dim_values_sql

    return f"""
WITH {ORACLE_CDC_EVENTS_CTE.strip()}
, dim AS ({versioned_dim_values_sql()})
, routed AS (
  SELECT cdc.database, replace(cdc."table", '_data_pipeline_refresh', '')
           AS base_table,
         dim.version, dim.schema_id, cdc.timestamp
  FROM cdc
  JOIN dim
    ON cdc.database = dim.database
   AND replace(cdc."table", '_data_pipeline_refresh', '') = dim."table"
   AND cdc.timestamp >= dim.eff_ts
   AND (dim.eff_end IS NULL OR cdc.timestamp < dim.eff_end)
  WHERE cdc.database NOT IN ('yelp_heartbeat', 'test')
)
SELECT database, base_table AS "table", version, schema_id,
       count(*) AS n_events,
       min(timestamp) AS first_ts,
       max(timestamp) AS last_ts
FROM routed
GROUP BY database, base_table, version, schema_id
"""


def q_cdc_ddl_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DDL admission chain AS A DATAFRAME PLAN — the distributed form
    the schema branch takes when QueryEvents arrive on the same stream as
    row events (reference schema_event_handler.handle_event order: skip
    F3, drop F4-unsupported, drop F1-blacklisted). The classifier verdict
    is stamped per statement from the deterministic Python parser (the
    control plane), while the F3/F1 filters run as Column predicates —
    so a billion-row query-event backlog admits/drops without leaving
    the JVM."""
    from mysql_streamer_spark.cdc.filters import (
        DEFAULT_SCHEMA_BLACKLIST,
        filter_skippable_queries,
    )
    from mysql_streamer_spark.schema.bootstrap import bootstrap_ddl_stream
    from mysql_streamer_spark.schema.ddl_parser import StatementKind, parse_statement

    rows = []
    for pos, sql in enumerate(bootstrap_ddl_stream()):
        p = parse_statement(sql)
        rows.append(
            (
                pos,
                sql,
                p.kind.name,
                p.database,
                p.table,
            )
        )
    events = spark.createDataFrame(
        rows,
        "pos int, query string, kind string, database string, `table` string",
    )
    admitted = filter_skippable_queries(events).filter(
        (F.col("kind") != StatementKind.UNSUPPORTED.name)
        & (
            F.col("database").isNull()
            | ~F.col("database").isin(list(DEFAULT_SCHEMA_BLACKLIST))
        )
    )
    return admitted.select("pos", "kind", "database", "table")


def _statement_matrix() -> list[tuple[str, str]]:
    """(sql, expected_kind) corpus modeled on the reference's
    sql_handler_test.py:46-248 fixture grid: every statement class through
    its modifier/quoting/IF-EXISTS variants, plus the catch-all set. The
    expected kind is HAND-DECLARED per template — independent of both
    classification engines."""
    corpus: list[tuple[str, str]] = []
    tables = ["business", "`business`", "`yelp`.`business`"]
    for tmp in ("", "TEMPORARY "):
        for ine in ("", "IF NOT EXISTS "):
            for tbl in tables:
                for cols in ("(test_col VARCHAR(255))", "LIKE test_table"):
                    corpus.append(
                        (f"CREATE {tmp}TABLE {ine}{tbl} {cols}", "CREATE_TABLE")
                    )
    for oo in ("", "ONLINE ", "OFFLINE "):
        for ig in ("", "IGNORE "):
            for tbl in tables:
                for op in ("DROP test_col", "ENGINE=INNODB"):
                    corpus.append(
                        (f"ALTER {oo}{ig}TABLE {tbl} {op}", "ALTER_TABLE")
                    )
    for tmp in ("", "TEMPORARY "):
        for ie in ("", "IF EXISTS "):
            for tbl in tables:
                corpus.append((f"DROP {tmp}TABLE {ie}{tbl}", "DROP_TABLE"))
    for obj in ("DATABASE", "SCHEMA"):
        corpus.append((f"CREATE {obj} yelp", "CREATE_DATABASE"))
        corpus.append(
            (f"ALTER {obj} yelp DEFAULT CHARACTER SET utf8", "ALTER_DATABASE")
        )
        corpus.append((f"DROP {obj} yelp", "DROP_DATABASE"))
    for uniq in ("", "UNIQUE ", "FULLTEXT ", "SPATIAL "):
        corpus.append(
            (f"CREATE {uniq}INDEX idx ON business (test_col)", "CREATE_INDEX")
        )
    corpus.append(("CREATE ONLINE INDEX idx ON business (a)", "CREATE_INDEX"))
    corpus.append(("DROP INDEX idx ON business", "DROP_INDEX"))
    corpus.append(("DROP ONLINE INDEX idx ON business", "DROP_INDEX"))
    corpus.append(("DROP INDEX ONLINE idx ON business", "DROP_INDEX"))
    corpus.append(("RENAME TABLE business TO biz", "RENAME_TABLE"))
    corpus.append(("RENAME TABLE a TO b, c TO d", "RENAME_TABLE"))
    for sql in (
        "INSERT INTO business VALUES (1)",
        "UPDATE business SET a = 1",
        "DELETE FROM business WHERE a = 1",
        "BEGIN",
        "COMMIT",
        "TRUNCATE TABLE business",
        "CREATE TRIGGER trg BEFORE INSERT ON t FOR EACH ROW SET @x = 1",
        "CREATE VIEW v AS SELECT 1",
        "GRANT SELECT ON yelp.business TO someone",
        "SET NAMES utf8",
        "USE yelp",
        "ANALYZE TABLE business",
        "CREATE TABLE",
        "DROP TABLE IF EXISTS",
        "DROP TABLE IF EXISTS;",
        "CREATE TABLE IF NOT EXISTS;",
        "CREATE TABLE (a INT)",
    ):
        corpus.append((sql, "UNSUPPORTED"))
    corpus.append(("DROP TABLE business;", "DROP_TABLE"))
    corpus.append(("DROP TABLE IF EXISTS `business`;", "DROP_TABLE"))
    return corpus


def q_schema_registry_statement_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q2 differential gate as an oracle query: the reference-test
    statement grid (sql_handler_test.py:46-248) classified by BOTH
    engines — the token-matcher DSL (schema/token_matcher.py, the
    reference's Optional/Compound/Any semantics) and the regex/enum
    parser (schema/ddl_parser.py) — with the expected kind hand-declared
    per template. ``engines_agree`` must be uniformly true and ``kind``
    must hash-match the declared expectation: a classification bug now
    needs the same wrong answer from two unrelated grammars AND the
    hand expectation to slip past. Bounded control-plane corpus,
    stamped driver-side like cdc_ddl_admission."""
    from mysql_streamer_spark.schema.ddl_parser import parse_statement
    from mysql_streamer_spark.schema.token_matcher import classify_with_matchers

    rows = []
    for pos, (sql, _expected) in enumerate(_statement_matrix()):
        dsl = classify_with_matchers(sql).name
        parser = parse_statement(sql).kind.name
        rows.append((pos, sql, dsl, dsl == parser))
    return spark.createDataFrame(
        rows, "pos int, query string, kind string, engines_agree boolean"
    )


def _statement_matrix_oracle() -> str:
    rows = []
    for pos, (sql, expected) in enumerate(_statement_matrix()):
        lit = sql.replace("'", "''")
        rows.append(f"({pos}, '{lit}', '{expected}', TRUE)")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(pos, query, kind, engines_agree)"
    )


def _ddl_admission_oracle() -> str:
    from mysql_streamer_spark.cdc.filters import (
        DEFAULT_SCHEMA_BLACKLIST,
        SKIPPABLE_QUERIES,
    )
    from mysql_streamer_spark.schema.bootstrap import bootstrap_ddl_stream
    from mysql_streamer_spark.schema.ddl_parser import StatementKind, parse_statement

    rows = []
    for pos, sql in enumerate(bootstrap_ddl_stream()):
        p = parse_statement(sql)
        if sql.strip().upper() in SKIPPABLE_QUERIES:
            continue
        if p.kind is StatementKind.UNSUPPORTED:
            continue
        if p.database in DEFAULT_SCHEMA_BLACKLIST:
            continue
        db = f"'{p.database}'" if p.database is not None else "CAST(NULL AS VARCHAR)"
        tb = f"'{p.table}'" if p.table is not None else "CAST(NULL AS VARCHAR)"
        rows.append(f"({pos}, '{p.kind.name}', {db}, {tb})")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ') AS t(pos, kind, database, "table")'
    )


#: The reference's BDD ALTER-chain corpus
#: (acceptance/complex_statements.feature: ADD … AFTER reorder, table
#: renames both syntaxes, MODIFY widen), extended with the CHANGE-with-type
#: -change and FIRST placements the same feature family covers.
_ALTER_CHAIN_STATEMENTS: tuple[str, ...] = (
    "CREATE TABLE `employee` ("
    "`id` int(11) DEFAULT NULL, `name` varchar(64) DEFAULT NULL, "
    "`is_active` tinyint(1) NOT NULL DEFAULT 0, "
    "`salary` float(10, 2) NOT NULL DEFAULT 0.00, "
    "`job_description` text DEFAULT NULL, `created_at` int(11) NOT NULL, "
    "`update_at` int(11) NOT NULL) ENGINE=InnoDB DEFAULT CHARSET=utf8",
    "ALTER TABLE `employee` ADD `office` varchar(64) DEFAULT NULL"
    " AFTER `job_description`",
    "RENAME TABLE `employee` TO `employee_backup`",
    "ALTER TABLE `employee_backup` RENAME TO `employee_new`",
    "ALTER TABLE `employee_new` MODIFY office varchar(128)",
    "ALTER TABLE `employee_new` CHANGE update_at updated_at bigint NOT NULL",
    "ALTER TABLE `employee_new` ADD badge_id int FIRST",
)


def _classify_evolution(prev, cur) -> str:
    """Mechanical compatibility label between consecutive versions."""
    if prev is None:
        return "create"
    p = {f.name: f.dataType.simpleString() for f in prev.struct.fields}
    c = {f.name: f.dataType.simpleString() for f in cur.struct.fields}
    added, removed = sorted(set(c) - set(p)), sorted(set(p) - set(c))
    if len(added) == 1 and len(removed) == 1:
        return f"change:{removed[0]}->{added[0]}"
    if added:
        return "add:" + ",".join(added)
    if removed:
        return "drop:" + ",".join(removed)
    retyped = sorted(n for n in c if p[n] != c[n])
    if retyped:
        return "modify:" + ",".join(retyped)
    # DDL applied but invisible to the Spark type (e.g. varchar widen)
    return "redefine"


def q_schema_registry_alter_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T3 parity with the reference's complex-statements acceptance
    chain: replay CREATE -> ADD…AFTER (column reorder) -> RENAME TABLE ->
    ALTER…RENAME -> MODIFY (widen) -> CHANGE with type change -> ADD…FIRST
    on a FRESH registry, and emit every version's exact column ORDER,
    tracked DEFAULT literals, and a mechanical compatibility label. The
    oracle is a hand-written golden table — independent of the registry
    code — so a regression in placement, rename-history-move, default
    tracking, or CHANGE semantics breaks the hash."""
    from mysql_streamer_spark.schema.registry import SchemaRegistry

    reg = SchemaRegistry()
    for stmt in _ALTER_CHAIN_STATEMENTS:
        reg.apply_statement(stmt, default_database="rbrsource")
    rows = []
    prev = None
    for e in reg.history("rbrsource", "employee_new"):
        rows.append(
            (
                e.database,
                e.table,
                e.version,
                e.schema_id,
                ", ".join(
                    f"{f.name} {f.dataType.simpleString()}" for f in e.struct.fields
                ),
                ", ".join(f"{k}={v}" for k, v in sorted(e.defaults.items())),
                _classify_evolution(prev, e),
            )
        )
        prev = e
    return spark.createDataFrame(
        rows,
        "database string, `table` string, version int, schema_id int, "
        "columns string, defaults string, change_kind string",
    )


def q_schema_registry_avro_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Schematizer's output surface: every version of the replayed
    acceptance chain rendered as the Avro record schema the reference
    would register (acceptance/complex_statements.feature's 'expected
    avro schema' step — nullable columns as ["null", T] unions with
    default null, tracked DEFAULT literals as typed Avro defaults, NOT
    NULL columns bare). The oracle is the five schema JSONs pasted as a
    golden table, so the registry->Avro derivation
    (connectors/avro_wire.py:avro_schema_for_entry) is pinned end-to-end,
    independent of the code that computes it."""
    import json as _json

    from mysql_streamer_spark.connectors.avro_wire import avro_schema_for_entry
    from mysql_streamer_spark.schema.registry import SchemaRegistry

    reg = SchemaRegistry()
    for stmt in _ALTER_CHAIN_STATEMENTS:
        reg.apply_statement(stmt, default_database="rbrsource")
    rows = [
        (e.version, _json.dumps(avro_schema_for_entry(e), sort_keys=True))
        for e in reg.history("rbrsource", "employee_new")
    ]
    return spark.createDataFrame(rows, "version int, avro_schema string")


#: the five expected schemas, golden (see the BDD feature's expected-avro
#: step for the shape contract this pins)
_AVRO_SCHEMAS_ORACLE = """
SELECT * FROM (VALUES
 (1, '{"fields": [{"default": null, "name": "id", "type": ["null", "int"]}, {"default": null, "name": "name", "type": ["null", "string"]}, {"default": 0, "name": "is_active", "type": "int"}, {"default": 0.0, "name": "salary", "type": "float"}, {"default": null, "name": "job_description", "type": ["null", "string"]}, {"name": "created_at", "type": "int"}, {"name": "update_at", "type": "int"}], "name": "employee_new", "namespace": "replication_handler.rbrsource", "type": "record"}'),
 (2, '{"fields": [{"default": null, "name": "id", "type": ["null", "int"]}, {"default": null, "name": "name", "type": ["null", "string"]}, {"default": 0, "name": "is_active", "type": "int"}, {"default": 0.0, "name": "salary", "type": "float"}, {"default": null, "name": "job_description", "type": ["null", "string"]}, {"default": null, "name": "office", "type": ["null", "string"]}, {"name": "created_at", "type": "int"}, {"name": "update_at", "type": "int"}], "name": "employee_new", "namespace": "replication_handler.rbrsource", "type": "record"}'),
 (3, '{"fields": [{"default": null, "name": "id", "type": ["null", "int"]}, {"default": null, "name": "name", "type": ["null", "string"]}, {"default": 0, "name": "is_active", "type": "int"}, {"default": 0.0, "name": "salary", "type": "float"}, {"default": null, "name": "job_description", "type": ["null", "string"]}, {"default": null, "name": "office", "type": ["null", "string"]}, {"name": "created_at", "type": "int"}, {"name": "update_at", "type": "int"}], "name": "employee_new", "namespace": "replication_handler.rbrsource", "type": "record"}'),
 (4, '{"fields": [{"default": null, "name": "id", "type": ["null", "int"]}, {"default": null, "name": "name", "type": ["null", "string"]}, {"default": 0, "name": "is_active", "type": "int"}, {"default": 0.0, "name": "salary", "type": "float"}, {"default": null, "name": "job_description", "type": ["null", "string"]}, {"default": null, "name": "office", "type": ["null", "string"]}, {"name": "created_at", "type": "int"}, {"name": "updated_at", "type": "long"}], "name": "employee_new", "namespace": "replication_handler.rbrsource", "type": "record"}'),
 (5, '{"fields": [{"default": null, "name": "badge_id", "type": ["null", "int"]}, {"default": null, "name": "id", "type": ["null", "int"]}, {"default": null, "name": "name", "type": ["null", "string"]}, {"default": 0, "name": "is_active", "type": "int"}, {"default": 0.0, "name": "salary", "type": "float"}, {"default": null, "name": "job_description", "type": ["null", "string"]}, {"default": null, "name": "office", "type": ["null", "string"]}, {"name": "created_at", "type": "int"}, {"name": "updated_at", "type": "long"}], "name": "employee_new", "namespace": "replication_handler.rbrsource", "type": "record"}')
) AS t(version, avro_schema)
"""


#: hand-written golden expectation (NOT generated from the registry)
_ALTER_CHAINS_ORACLE = """
SELECT * FROM (VALUES
  ('rbrsource', 'employee_new', 1, 1,
   'id int, name string, is_active tinyint, salary float, job_description string, created_at int, update_at int',
   'id=NULL, is_active=0, job_description=NULL, name=NULL, salary=0.00',
   'create'),
  ('rbrsource', 'employee_new', 2, 2,
   'id int, name string, is_active tinyint, salary float, job_description string, office string, created_at int, update_at int',
   'id=NULL, is_active=0, job_description=NULL, name=NULL, office=NULL, salary=0.00',
   'add:office'),
  ('rbrsource', 'employee_new', 3, 3,
   'id int, name string, is_active tinyint, salary float, job_description string, office string, created_at int, update_at int',
   'id=NULL, is_active=0, job_description=NULL, name=NULL, salary=0.00',
   'redefine'),
  ('rbrsource', 'employee_new', 4, 4,
   'id int, name string, is_active tinyint, salary float, job_description string, office string, created_at int, updated_at bigint',
   'id=NULL, is_active=0, job_description=NULL, name=NULL, salary=0.00',
   'change:update_at->updated_at'),
  ('rbrsource', 'employee_new', 5, 5,
   'badge_id int, id int, name string, is_active tinyint, salary float, job_description string, office string, created_at int, updated_at bigint',
   'id=NULL, is_active=0, job_description=NULL, name=NULL, salary=0.00',
   'add:badge_id')
) AS t(database, "table", version, schema_id, columns, defaults, change_kind)
"""


SPECS = [
    QuerySpec("schema_registry_state", q_schema_registry_state, registry_state_values_sql()),
    QuerySpec(
        "schema_registry_alter_chains",
        q_schema_registry_alter_chains,
        _ALTER_CHAINS_ORACLE,
    ),
    QuerySpec(
        "schema_registry_avro_schemas",
        q_schema_registry_avro_schemas,
        _AVRO_SCHEMAS_ORACLE,
    ),
    QuerySpec("cdc_ddl_admission", q_cdc_ddl_admission, _ddl_admission_oracle()),
    QuerySpec(
        "schema_registry_statement_matrix",
        q_schema_registry_statement_matrix,
        _statement_matrix_oracle(),
    ),
    QuerySpec(
        "cdc_schema_version_routing",
        q_cdc_schema_version_routing,
        _version_routing_oracle(),
    ),
    QuerySpec(
        "schema_registry_transforms",
        q_schema_registry_transforms,
        _transforms_values_sql(),
    ),
    QuerySpec(
        "schema_registry_evolution", q_schema_registry_evolution, _evolution_values_sql()
    ),
    QuerySpec(
        "schema_registry_column_lifetimes",
        q_schema_registry_column_lifetimes,
        _column_lifetimes_oracle(),
    ),
    QuerySpec(
        "schema_registry_compat", q_schema_registry_compat, _compat_oracle()
    ),
]


# ---------------------------------------------------------------------------
# Confluent compatibility LEVELS per table (the policy semantics a schema
# registry enforces on registration)
# ---------------------------------------------------------------------------

#: shared verdict text — identical CASE in both engines
_LEVEL_CASE = """
CASE WHEN backward_transitive AND forward_transitive THEN 'FULL_TRANSITIVE'
     WHEN backward AND forward THEN 'FULL'
     WHEN backward_transitive THEN 'BACKWARD_TRANSITIVE'
     WHEN backward THEN 'BACKWARD'
     WHEN forward_transitive THEN 'FORWARD_TRANSITIVE'
     WHEN forward THEN 'FORWARD'
     ELSE 'NONE' END
""".strip()


def q_schema_registry_confluent_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard registry compatibility POLICY levels (BACKWARD /
    FORWARD / FULL and their _TRANSITIVE forms), computed per table from
    the replayed registry by RUNTIME probes: for every (writer, reader)
    version pair the policy needs, a canonical non-null record is
    actually ENCODED under the writer and decode_resolved under the
    reader — the operational definition (the same call consumers run),
    not a field-list heuristic. The oracle classifies the SAME pairs
    declaratively in SQL from the registry's struct JSON (name/type/
    nullability + the spec's promotion table), so a hash match proves
    the runtime resolution engine and the declarative rules agree on
    every level — the check a registry performs before accepting a new
    version (reference schema_wrapper.py:97-141 registers old+new so its
    Schematizer can enforce exactly this).

    Scale shape: pure control plane — the registry holds a handful of
    versions; the probes run driver-side in microseconds and emit a
    constant-size dimension."""
    import json as _json

    from mysql_streamer_spark.connectors.avro_wire import (
        avro_schema_for_entry,
        schemas_resolvable,
    )

    reg = bootstrap_registry()
    rows = []
    for db, table in reg.tables():
        hist = reg.history(db, table)
        schemas = [avro_schema_for_entry(e) for e in hist]
        latest = schemas[-1]
        earlier = schemas[:-1]
        backward = schemas_resolvable(earlier[-1], latest) if earlier else True
        backward_transitive = all(
            schemas_resolvable(w, latest) for w in earlier
        )
        forward = schemas_resolvable(latest, earlier[-1]) if earlier else True
        forward_transitive = all(
            schemas_resolvable(latest, r) for r in earlier
        )
        rows.append(
            (
                db,
                table,
                len(hist),
                backward,
                backward_transitive,
                forward,
                forward_transitive,
            )
        )
    df = spark.createDataFrame(
        rows,
        "database string, `table` string, n_versions long, backward boolean, "
        "backward_transitive boolean, forward boolean, forward_transitive boolean",
    )
    return df.withColumn("level", F.expr(_LEVEL_CASE))


def _confluent_levels_oracle() -> str:
    from mysql_streamer_spark.schema.bootstrap import registry_state_values_sql

    return f"""
WITH state AS ({registry_state_values_sql()})
, fields AS (
  SELECT database, "table", version,
    json_extract_string(struct_json, '$.fields[' || i || '].name') AS fname,
    CASE json_extract_string(struct_json, '$.fields[' || i || '].type')
      WHEN 'integer' THEN 'int' WHEN 'tinyint' THEN 'int'
      WHEN 'smallint' THEN 'int' WHEN 'long' THEN 'long'
      WHEN 'float' THEN 'float' WHEN 'double' THEN 'double'
      WHEN 'string' THEN 'string' WHEN 'boolean' THEN 'boolean'
      WHEN 'binary' THEN 'bytes'
      ELSE 'long' END AS ftype,
    CAST(json_extract(struct_json, '$.fields[' || i || '].nullable')
         AS BOOLEAN) AS fnullable
  FROM state, unnest(generate_series(
    0, CAST(json_array_length(struct_json, '$.fields') AS INT) - 1
  )) AS t(i)
), latest AS (
  SELECT database, "table", max(version) AS vmax,
         CAST(count(*) AS BIGINT) AS n_versions
  FROM state GROUP BY 1, 2
), pairs AS (
  SELECT l.database, l."table", s.version AS w_v, l.vmax AS r_v
  FROM latest l JOIN state s
    ON s.database = l.database AND s."table" = l."table" AND s.version < l.vmax
  UNION ALL
  SELECT l.database, l."table", l.vmax, s.version
  FROM latest l JOIN state s
    ON s.database = l.database AND s."table" = l."table" AND s.version < l.vmax
), ok AS (
  SELECT p.database, p."table", p.w_v, p.r_v,
    bool_and(CASE WHEN wf.fname IS NOT NULL THEN
        wf.ftype = rf.ftype
        OR (wf.ftype = 'int' AND rf.ftype IN ('long', 'float', 'double'))
        OR (wf.ftype = 'long' AND rf.ftype IN ('float', 'double'))
        OR (wf.ftype = 'float' AND rf.ftype = 'double')
      ELSE rf.fnullable END) AS ok
  FROM pairs p
  JOIN fields rf ON rf.database = p.database AND rf."table" = p."table"
                AND rf.version = p.r_v
  LEFT JOIN fields wf ON wf.database = p.database AND wf."table" = p."table"
                     AND wf.version = p.w_v AND wf.fname = rf.fname
  GROUP BY 1, 2, 3, 4
), flags AS (
  SELECT l.database, l."table", l.n_versions,
    COALESCE(bool_and(o.ok) FILTER (
      WHERE o.w_v = l.vmax - 1 AND o.r_v = l.vmax), TRUE) AS backward,
    COALESCE(bool_and(o.ok) FILTER (
      WHERE o.r_v = l.vmax AND o.w_v < l.vmax), TRUE) AS backward_transitive,
    COALESCE(bool_and(o.ok) FILTER (
      WHERE o.w_v = l.vmax AND o.r_v = l.vmax - 1), TRUE) AS forward,
    COALESCE(bool_and(o.ok) FILTER (
      WHERE o.w_v = l.vmax AND o.r_v < l.vmax), TRUE) AS forward_transitive
  FROM latest l
  LEFT JOIN ok o ON o.database = l.database AND o."table" = l."table"
  GROUP BY 1, 2, 3
)
SELECT database, "table", n_versions, backward, backward_transitive,
       forward, forward_transitive,
       {_LEVEL_CASE} AS level
FROM flags
"""


SPECS.append(
    QuerySpec(
        "schema_registry_confluent_levels",
        q_schema_registry_confluent_levels,
        _confluent_levels_oracle(),
    )
)


# ---------------------------------------------------------------------------
# Confluent subject-naming strategies + per-subject version allocation
# ---------------------------------------------------------------------------

#: the three standard Confluent subject-naming strategies; the record FQN
#: follows avro_schema_for_entry's namespace (replication_handler.<db>)
SUBJECT_STRATEGIES = (
    "TopicNameStrategy",
    "RecordNameStrategy",
    "TopicRecordNameStrategy",
)


def _subject_for(strategy: str, topic: str, record_fqn: str) -> str:
    if strategy == "TopicNameStrategy":
        return f"{topic}-value"
    if strategy == "RecordNameStrategy":
        return record_fqn
    return f"{topic}-{record_fqn}"


def q_schema_registry_subjects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subject naming + id allocation, the registry semantics the wire
    family left unmodeled: every schema version the replayed registry
    issued is mapped under all three standard Confluent subject-naming
    strategies (TopicNameStrategy '<topic>-value', RecordNameStrategy
    '<record fqn>', TopicRecordNameStrategy '<topic>-<record fqn>'), with
    VERSIONS allocated per subject (1..n in registration order) while the
    schema id stays GLOBAL — exactly the Confluent contract. Then every
    topic actually present in the CDC stream is routed topic -> subject
    -> latest schema id per strategy; topics with no registered subject
    classify ``unregistered_schema`` — the same verdict the strict
    producer's DLQ issues (cdc_wire_dlq_routing), proven here per
    strategy. Reference analog: schema_wrapper.py:97-141 registers under
    a (namespace, source) identity and routes by what registration
    returned.

    Scale shape: the subject dimension is control-plane (registry-sized,
    broadcast); stream topics reduce via one distinct on a bounded
    domain; the routing join is broadcast — no data-plane shuffle grows
    with input."""
    from mysql_streamer_spark.cdc.source import (
        HEARTBEAT_DB,
        REFRESH_SUFFIX,
        events_as_cdc,
    )

    reg = bootstrap_registry()
    dim_rows = []
    for db, table in reg.tables():
        topic = f"{db}.{table}"
        fqn = f"replication_handler.{db}.{table}"
        for strategy in SUBJECT_STRATEGIES:
            subject = _subject_for(strategy, topic, fqn)
            for v, e in enumerate(reg.history(db, table), start=1):
                dim_rows.append((strategy, subject, v, e.schema_id))
    dim = spark.createDataFrame(
        dim_rows,
        "strategy string, subject string, subject_version int, schema_id int",
    )
    latest = dim.groupBy("strategy", "subject").agg(
        F.max("subject_version").alias("n_versions"),
        F.max_by("schema_id", "subject_version").alias("latest_schema_id"),
    )
    cdc = events_as_cdc(load_table(spark, sf_dir, "events")).filter(
        (F.col("database") != HEARTBEAT_DB) & (F.col("database") != "test")
    )
    topics = (
        cdc.select(
            "database",
            F.replace(
                F.col("table"), F.lit(REFRESH_SUFFIX), F.lit("")
            ).alias("table"),
        )
        .distinct()
        .withColumn("topic", F.concat_ws(".", "database", "table"))
        .withColumn(
            "record_fqn",
            F.concat_ws(".", F.lit("replication_handler"), "database", "table"),
        )
    )
    routed = topics.withColumn(
        "strategy",
        F.explode(F.array(*[F.lit(s) for s in SUBJECT_STRATEGIES])),
    ).withColumn(
        "subject",
        F.when(
            F.col("strategy") == "TopicNameStrategy",
            F.concat(F.col("topic"), F.lit("-value")),
        )
        .when(F.col("strategy") == "RecordNameStrategy", F.col("record_fqn"))
        .otherwise(F.concat_ws("-", "topic", "record_fqn")),
    )
    return routed.join(F.broadcast(latest), ["strategy", "subject"], "left").select(
        "strategy",
        "topic",
        "subject",
        "n_versions",
        "latest_schema_id",
        F.when(F.col("latest_schema_id").isNull(), F.lit("unregistered_schema"))
        .otherwise(F.lit("resolved"))
        .alias("status"),
    )


def _subjects_oracle() -> str:
    from mysql_streamer_spark.cdc.source import ORACLE_CDC_EVENTS_CTE

    return f"""
WITH {ORACLE_CDC_EVENTS_CTE.strip()}
, state AS ({registry_state_values_sql()})
, strategies AS (
  SELECT * FROM (VALUES ('TopicNameStrategy'), ('RecordNameStrategy'),
                        ('TopicRecordNameStrategy')) AS s(strategy)
)
, dim AS (
  SELECT st.strategy,
    CASE st.strategy
      WHEN 'TopicNameStrategy' THEN s.database || '.' || s."table" || '-value'
      WHEN 'RecordNameStrategy'
        THEN 'replication_handler.' || s.database || '.' || s."table"
      ELSE s.database || '.' || s."table"
           || '-replication_handler.' || s.database || '.' || s."table"
    END AS subject,
    s.schema_id,
    row_number() OVER (
      PARTITION BY st.strategy, s.database, s."table" ORDER BY s.schema_id
    ) AS subject_version
  FROM state s CROSS JOIN strategies st
)
, latest AS (
  SELECT strategy, subject,
         CAST(max(subject_version) AS INT) AS n_versions,
         CAST(max_by(schema_id, subject_version) AS INT) AS latest_schema_id
  FROM dim GROUP BY 1, 2
)
, topics AS (
  SELECT DISTINCT database,
         replace("table", '_data_pipeline_refresh', '') AS "table"
  FROM cdc WHERE database NOT IN ('yelp_heartbeat', 'test')
)
, routed AS (
  SELECT st.strategy,
    t.database || '.' || t."table" AS topic,
    CASE st.strategy
      WHEN 'TopicNameStrategy' THEN t.database || '.' || t."table" || '-value'
      WHEN 'RecordNameStrategy'
        THEN 'replication_handler.' || t.database || '.' || t."table"
      ELSE t.database || '.' || t."table"
           || '-replication_handler.' || t.database || '.' || t."table"
    END AS subject
  FROM topics t CROSS JOIN strategies st
)
SELECT r.strategy, r.topic, r.subject, l.n_versions, l.latest_schema_id,
  CASE WHEN l.latest_schema_id IS NULL THEN 'unregistered_schema'
       ELSE 'resolved' END AS status
FROM routed r
LEFT JOIN latest l ON r.strategy = l.strategy AND r.subject = l.subject
"""


SPECS.append(
    QuerySpec(
        "schema_registry_subjects",
        q_schema_registry_subjects,
        _subjects_oracle(),
    )
)
