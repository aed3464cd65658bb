"""cdc_type_matrix — the reference's FULL MySQL type surface, end-to-end.

The reference proves every type family it replicates in one integration
fixture (reference tests/integration/end_to_end_test.py:77-370: every int
width signed/unsigned/zerofill, DECIMAL/DEC/FIXED, FLOAT/DOUBLE incl. the
FLOAT(p>24) promotion, DATE/DATETIME(fsp)/TIMESTAMP(fsp)/TIME(fsp)/YEAR,
the CHAR/NATIONAL/TEXT spellings, BINARY/BLOB, ENUM, SET). This module is
the Spark-first equivalent as ONE oracle-checked query: the matrix table's
CREATE TABLE DDL is replayed through the real SchemaRegistry (parser ->
type mapper -> transformation map), deterministic per-row values derived
from the customer table are cast to the REGISTRY-prescribed Spark types,
the registry's wire transforms are applied, and the wire projection is
driven column-by-column by the registered struct — so a wrong mapping
(width, promotion, transform tag) changes real output values and the
DuckDB hash-match catches it.

Notably this matrix includes BIGINT(20) UNSIGNED at the top of its range
(-> Decimal(20,0)), which the reference's own fixture has commented OUT
(end_to_end_test.py:114 — their stack could not round-trip it); here it is
first-class.

Scale shape: one projection over the scan — every cast and transform is a
codegen'd column expression; no joins, no shuffles, no Python. At 100 TB
this is a map-only pass, which is exactly what a CDC typed-payload stage
must be.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_streamer_spark.queries.registry import QuerySpec


@dataclass(frozen=True)
class MatrixColumn:
    """One type-matrix column: its MySQL DDL type, the Spark-SQL value
    expression over ``k`` (producing the shape the registry transform
    expects), and the DuckDB expression producing the WIRE-form value."""

    name: str
    mysql_type: str
    spark_value: str
    duck_value: str


# Values are functions of k = c_custkey % 25 (so every SF exercises the
# same 25 value points across however many rows it has), pinned to the
# reference fixture's boundary values wherever they fit.
MATRIX: tuple[MatrixColumn, ...] = (
    # -- integer widths: signed/unsigned/zerofill ------------------------
    MatrixColumn("c_tinyint", "TINYINT", "127 - k % 2", "127 - k % 2"),
    MatrixColumn(
        "c_tinyint_signed", "TINYINT(3) SIGNED", "-128 + k % 2", "-128 + k % 2"
    ),
    MatrixColumn(
        "c_tinyint_unsigned", "TINYINT(3) UNSIGNED", "255 - k % 2", "255 - k % 2"
    ),
    MatrixColumn(
        "c_tinyint_zerofill",
        "TINYINT(3) UNSIGNED ZEROFILL",
        "5 + k % 2",
        "5 + k % 2",
    ),
    MatrixColumn("c_bool", "BOOL", "k % 2", "k % 2"),
    MatrixColumn("c_boolean", "BOOLEAN", "1 - k % 2", "1 - k % 2"),
    MatrixColumn("c_smallint", "SMALLINT", "32767 - k", "32767 - k"),
    MatrixColumn(
        "c_smallint_signed", "SMALLINT(5) SIGNED", "-32768 + k", "-32768 + k"
    ),
    MatrixColumn(
        "c_smallint_unsigned", "SMALLINT(5) UNSIGNED", "65535 - k", "65535 - k"
    ),
    MatrixColumn(
        "c_smallint_zerofill",
        "SMALLINT(3) UNSIGNED ZEROFILL",
        "5 + k",
        "5 + k",
    ),
    MatrixColumn("c_mediumint", "MEDIUMINT", "8388607 - k", "8388607 - k"),
    MatrixColumn(
        "c_mediumint_signed", "MEDIUMINT(7) SIGNED", "-8388608 + k", "-8388608 + k"
    ),
    MatrixColumn(
        "c_mediumint_unsigned",
        "MEDIUMINT(8) UNSIGNED",
        "16777215 - k",
        "16777215 - k",
    ),
    MatrixColumn("c_int", "INT", "2147483647 - k", "2147483647 - k"),
    MatrixColumn(
        "c_int_signed", "INT(10) SIGNED", "-2147483648 + k", "-2147483648 + k"
    ),
    MatrixColumn(
        "c_int_unsigned", "INT(11) UNSIGNED", "4294967295 - k", "4294967295 - k"
    ),
    MatrixColumn("c_integer", "INTEGER(3)", "3 + k", "3 + k"),
    MatrixColumn(
        "c_bigint", "BIGINT(19)", "23372854775807 - k", "23372854775807 - k"
    ),
    MatrixColumn(
        "c_bigint_signed",
        "BIGINT(19) SIGNED",
        "-9223372036854775807 - 1 + k",
        "-9223372036854775807 - 1 + k",
    ),
    # unsigned BIGINT exceeds long -> Decimal(20,0); wire form is the string
    MatrixColumn(
        "c_bigint_unsigned",
        "BIGINT(20) UNSIGNED",
        "CAST('18446744073709551615' AS DECIMAL(20,0)) - k",
        "CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) - k AS VARCHAR)",
    ),
    MatrixColumn("c_year", "YEAR", "2000 + k", "2000 + k"),
    MatrixColumn("c_year4", "YEAR(4)", "1901 + k", "1901 + k"),
    # -- exact decimals (wire form: full-scale string) -------------------
    MatrixColumn(
        "c_decimal",
        "DECIMAL(9, 2)",
        "concat(CAST(101 + k AS STRING), '.41')",
        "concat(CAST(101 + k AS VARCHAR), '.41')",
    ),
    MatrixColumn(
        "c_decimal_signed",
        "DECIMAL(12, 11) SIGNED",
        "concat('-3.1415926535', CAST(k % 10 AS STRING))",
        "concat('-3.1415926535', CAST(k % 10 AS VARCHAR))",
    ),
    MatrixColumn(
        "c_decimal_unsigned",
        "DECIMAL(2, 1) UNSIGNED",
        "concat('0.', CAST(k % 10 AS STRING))",
        "concat('0.', CAST(k % 10 AS VARCHAR))",
    ),
    MatrixColumn(
        "c_dec",
        "DEC(9, 3)",
        "concat(CAST(5 + k AS STRING), '.432')",
        "concat(CAST(5 + k AS VARCHAR), '.432')",
    ),
    MatrixColumn(
        "c_fixed",
        "FIXED(9, 3)",
        "concat(CAST(45 + k AS STRING), '.432')",
        "concat(CAST(45 + k AS VARCHAR), '.432')",
    ),
    MatrixColumn(
        "c_numeric",
        "NUMERIC(9, 2)",
        "concat(CAST(7 + k AS STRING), '.25')",
        "concat(CAST(7 + k AS VARCHAR), '.25')",
    ),
    # -- floats (values exactly representable in binary32, so the
    #    float -> double wire cast is bit-exact in both engines) ---------
    MatrixColumn(
        "c_float", "FLOAT", "3.5 + k", "CAST(CAST(3.5 + k AS REAL) AS DOUBLE)"
    ),
    MatrixColumn(
        "c_float_signed",
        "FLOAT(5, 3) SIGNED",
        "-2.25 - k",
        "CAST(CAST(-2.25 - k AS REAL) AS DOUBLE)",
    ),
    MatrixColumn(
        "c_float_unsigned",
        "FLOAT(5, 3) UNSIGNED",
        "2.25 + k",
        "CAST(CAST(2.25 + k AS REAL) AS DOUBLE)",
    ),
    MatrixColumn(
        "c_float_zerofill",
        "FLOAT(5, 3) UNSIGNED ZEROFILL",
        "24.0 + k",
        "CAST(CAST(24.0 + k AS REAL) AS DOUBLE)",
    ),
    MatrixColumn(
        "c_float5", "FLOAT(5)", "24.5 + k", "CAST(CAST(24.5 + k AS REAL) AS DOUBLE)"
    ),
    # FLOAT(p>24) is promoted to DOUBLE by MySQL itself; 24.01 is NOT
    # representable in binary32, so if the mapping failed to promote, the
    # float roundtrip would change the value and the hash would catch it.
    MatrixColumn("c_float30", "FLOAT(30)", "24.01 + k", "24.01 + k"),
    MatrixColumn("c_double", "DOUBLE", "3.14 + k", "3.14 + k"),
    MatrixColumn(
        "c_double_signed", "DOUBLE(5, 3) SIGNED", "-3.14 - k", "-3.14 - k"
    ),
    MatrixColumn(
        "c_double_unsigned", "DOUBLE(5, 3) UNSIGNED", "2.14 + k", "2.14 + k"
    ),
    MatrixColumn(
        "c_double_precision", "DOUBLE PRECISION", "3.14 + 2 * k", "3.14 + 2 * k"
    ),
    MatrixColumn("c_real", "REAL", "3.14 + 3 * k", "3.14 + 3 * k"),
    # -- temporal: both reference boundary eras, with and without fsp ----
    MatrixColumn(
        "c_date",
        "DATE",
        "date_add(DATE '1901-01-01', k)",
        "strftime(DATE '1901-01-01' + k, '%Y-%m-%d')",
    ),
    MatrixColumn(
        "c_date_hi",
        "DATE",
        "date_sub(DATE '2050-12-31', k)",
        "strftime(DATE '2050-12-31' - k, '%Y-%m-%d')",
    ),
    MatrixColumn(
        "c_datetime",
        "DATETIME",
        "timestampadd(SECOND, k, TIMESTAMP_NTZ '1970-01-01 00:00:01')",
        "strftime(TIMESTAMP '1970-01-01 00:00:01' + INTERVAL (k) SECOND,"
        " '%Y-%m-%dT%H:%M:%S.%f')",
    ),
    MatrixColumn(
        "c_datetime6",
        "DATETIME(6)",
        "timestampadd(MICROSECOND, -k, TIMESTAMP_NTZ '2038-01-19 03:14:07.999999')",
        "strftime(TIMESTAMP '2038-01-19 03:14:07.999999'"
        " - INTERVAL (k) MICROSECOND, '%Y-%m-%dT%H:%M:%S.%f')",
    ),
    # TIMESTAMP wire form: epoch microseconds (P6), so the oracle is pure
    # integer arithmetic — no cross-engine timezone surface at all.
    MatrixColumn(
        "c_timestamp",
        "TIMESTAMP",
        "timestampadd(SECOND, k, TIMESTAMP '1970-01-01 00:00:01')",
        "CAST(1000000 + k * 1000000 AS BIGINT)",
    ),
    MatrixColumn(
        "c_timestamp6",
        "TIMESTAMP(6)",
        "timestampadd(MICROSECOND, -k, TIMESTAMP '2038-01-19 03:14:07.999999')",
        "CAST(2147483647999999 - k AS BIGINT)",
    ),
    # TIME wire form: microseconds since midnight (long)
    MatrixColumn(
        "c_time",
        "TIME",
        "concat(lpad(CAST(k % 24 AS STRING), 2, '0'), ':59:59.',"
        " lpad(CAST(k AS STRING), 6, '0'))",
        "CAST((k % 24) * 3600 + 59 * 60 + 59 AS BIGINT) * 1000000 + k",
    ),
    MatrixColumn(
        "c_time6",
        "TIME(6)",
        "concat('23:59:59.', lpad(CAST(999999 - k AS STRING), 6, '0'))",
        "CAST(23 * 3600 + 59 * 60 + 59 AS BIGINT) * 1000000 + 999999 - k",
    ),
    # -- character family: every spelling the reference lists ------------
    MatrixColumn("c_char", "CHAR", "chr(97 + k % 26)", "chr(97 + k % 26)"),
    MatrixColumn(
        "c_character", "CHARACTER", "chr(65 + k % 26)", "chr(65 + k % 26)"
    ),
    MatrixColumn("c_nchar", "NCHAR", "chr(110 + k % 10)", "chr(110 + k % 10)"),
    MatrixColumn(
        "c_national_char", "NATIONAL CHAR", "chr(103 + k % 8)", "chr(103 + k % 8)"
    ),
    MatrixColumn("c_char0", "CHAR(0)", "''", "''"),
    MatrixColumn(
        "c_char10",
        "CHAR(10)",
        "lpad(CAST(k AS STRING), 10, '0')",
        "lpad(CAST(k AS VARCHAR), 10, '0')",
    ),
    MatrixColumn(
        "c_varchar",
        "VARCHAR(1000)",
        "concat('asdasdd-', CAST(k AS STRING))",
        "concat('asdasdd-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_varying",
        "CHARACTER VARYING(1000)",
        "concat('varying-', CAST(k AS STRING))",
        "concat('varying-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_nvarchar",
        "NVARCHAR(1000)",
        "concat('nv-', CAST(k AS STRING))",
        "concat('nv-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_national_varchar",
        "NATIONAL VARCHAR(1000)",
        "concat('natv-', CAST(k AS STRING))",
        "concat('natv-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_tinytext",
        "TINYTEXT",
        "concat('tt-', CAST(k AS STRING))",
        "concat('tt-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_text",
        "TEXT",
        "concat('text-', CAST(k AS STRING))",
        "concat('text-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_text100",
        "TEXT(100)",
        "concat('t100-', CAST(k AS STRING))",
        "concat('t100-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_mediumtext",
        "MEDIUMTEXT",
        "concat('mt-', CAST(k AS STRING))",
        "concat('mt-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_longtext",
        "LONGTEXT",
        "concat('lt-', CAST(k AS STRING))",
        "concat('lt-', CAST(k AS VARCHAR))",
    ),
    # -- binary family: UTF-8 string -> BinaryType -> decoded back on the
    #    wire, proving the bytes survive the typed round-trip ------------
    MatrixColumn(
        "c_binary",
        "BINARY(5)",
        "concat('he', lpad(CAST(k AS STRING), 3, '0'))",
        "concat('he', lpad(CAST(k AS VARCHAR), 3, '0'))",
    ),
    MatrixColumn(
        "c_varbinary",
        "VARBINARY(100)",
        "concat('vb-', CAST(k AS STRING))",
        "concat('vb-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_tinyblob",
        "TINYBLOB",
        "concat('tb-', CAST(k AS STRING))",
        "concat('tb-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_blob",
        "BLOB",
        "concat('bl-', CAST(k AS STRING))",
        "concat('bl-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_blob100",
        "BLOB(100)",
        "concat('b100-', CAST(k AS STRING))",
        "concat('b100-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_mediumblob",
        "MEDIUMBLOB",
        "concat('mb-', CAST(k AS STRING))",
        "concat('mb-', CAST(k AS VARCHAR))",
    ),
    MatrixColumn(
        "c_longblob",
        "LONGBLOB",
        "concat('lb-', CAST(k AS STRING))",
        "concat('lb-', CAST(k AS VARCHAR))",
    ),
    # -- enum / set -------------------------------------------------------
    MatrixColumn(
        "c_enum",
        "ENUM('ONE', 'TWO')",
        "CASE WHEN k % 2 = 0 THEN 'ONE' ELSE 'TWO' END",
        "CASE WHEN k % 2 = 0 THEN 'ONE' ELSE 'TWO' END",
    ),
    # SET decodes unordered; the wire transform sorts, so the deliberately
    # reversed array must come out 'ONE,TWO'
    MatrixColumn(
        "c_set",
        "SET('ONE', 'TWO')",
        "CASE WHEN k % 2 = 0 THEN array('TWO', 'ONE') ELSE array('TWO') END",
        "CASE WHEN k % 2 = 0 THEN 'ONE,TWO' ELSE 'TWO' END",
    ),
)

MATRIX_DATABASE = "db_1"
MATRIX_TABLE = "type_matrix"


def type_matrix_ddl() -> str:
    """The CREATE TABLE carrying the full type matrix — replayed through
    the real parser + registry, exactly like any other tracked DDL."""
    cols = ",\n  ".join(f"{c.name} {c.mysql_type}" for c in MATRIX)
    return (
        f"CREATE TABLE {MATRIX_DATABASE}.{MATRIX_TABLE} (\n"
        f"  pk BIGINT NOT NULL,\n  {cols},\n  PRIMARY KEY (pk)\n)"
    )


def _matrix_entry():
    """Fresh registry, one replayed statement -> the registered entry."""
    from mysql_streamer_spark.schema.registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.apply_statement(type_matrix_ddl())
    entry = reg.get(MATRIX_DATABASE, MATRIX_TABLE)
    assert entry is not None
    return entry


def _wire_projection(field: T.StructField, tag: str | None) -> F.Column:
    """WIRE form for one registered column, driven by the REGISTRY's type:
    decimals/dates travel as strings, floats widen to double, timestamps
    go to epoch µs (P6), binary decodes back to UTF-8, SET joins sorted —
    the same canonical forms the envelope family publishes."""
    col = F.col(field.name)
    if tag == "set":
        return F.array_join(col, ",")
    if tag in ("datetime", "time"):
        return col  # transform already produced the wire value
    dt = field.dataType
    if isinstance(dt, T.DecimalType):
        return col.cast("string")
    if isinstance(dt, T.FloatType):
        return col.cast("double")
    if isinstance(dt, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(col)
    if isinstance(dt, T.BinaryType):
        return col.cast("string")
    return col


def q_cdc_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL -> registry -> typed payload -> wire envelope for EVERY MySQL
    type family the reference replicates (see module docstring). The
    output schema, the per-column casts, the wire transforms, and the
    wire projections are all derived from the registered SchemaEntry —
    nothing about the types is restated by hand on the Spark side."""
    from mysql_streamer_spark.cdc.payload import apply_wire_transforms
    from mysql_streamer_spark.tables import load_table

    entry = _matrix_entry()
    spec_by = {c.name: c for c in MATRIX}
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pk"),
        (F.col("c_custkey") % 25).cast("int").alias("k"),
    )
    tmap = entry.transformation_map
    typed_cols = [F.col("pk")]
    for field in entry.struct.fields:
        if field.name == "pk":
            continue
        raw = F.expr(spec_by[field.name].spark_value)
        tag = tmap.get(field.name)
        # transform inputs keep their decoded shape (TIME arrives as the
        # binlog's 'HH:MM:SS.ffffff' string, SET as an unordered array);
        # everything else casts to the type the registry prescribes.
        if tag not in ("time", "set"):
            raw = raw.cast(field.dataType)
        typed_cols.append(raw.alias(field.name))
    typed = base.select(*typed_cols)
    wired = apply_wire_transforms(typed, tmap)
    out = [
        F.col("pk"),
        F.lit(entry.schema_id).alias("schema_id"),
        F.lit(entry.database).alias("database_name"),
        F.lit(entry.table).alias("table_name"),
        F.lit("insert").alias("message_type"),
    ]
    for field in entry.struct.fields:
        if field.name == "pk":
            continue
        out.append(_wire_projection(field, tmap.get(field.name)).alias(field.name))
    return wired.select(*out)


def _matrix_oracle() -> str:
    entry = _matrix_entry()  # pins schema_id to the replayed registration
    exprs = ",\n  ".join(f"{c.duck_value} AS {c.name}" for c in MATRIX)
    return f"""
SELECT c_custkey AS pk,
  {entry.schema_id} AS schema_id,
  '{MATRIX_DATABASE}' AS database_name,
  '{MATRIX_TABLE}' AS table_name,
  'insert' AS message_type,
  {exprs}
FROM (SELECT c_custkey, CAST(c_custkey % 25 AS INT) AS k FROM customer)
"""


SPECS = [QuerySpec("cdc_type_matrix", q_cdc_type_matrix, _matrix_oracle())]
