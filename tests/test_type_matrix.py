"""The full MySQL type matrix: parser + mapper + registry replay + wire.

Mirrors the reference's integration fixture (reference
tests/integration/end_to_end_test.py:77-370) — every type family it
replicates must parse, map, and survive the typed round-trip. The
value-level proof is the cdc_type_matrix oracle query; these tests pin
the structural contracts the query derives everything from.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mysql_streamer_spark.queries.type_matrix import (
    MATRIX,
    MATRIX_DATABASE,
    MATRIX_TABLE,
    _matrix_entry,
    type_matrix_ddl,
)
from mysql_streamer_spark.schema.mysql_types import mysql_type_to_spark


def test_every_matrix_type_maps():
    """Every MySQL type spelling in the matrix (all the spellings the
    reference fixture lists) parses and maps to a Spark type."""
    for col in MATRIX:
        mapped = mysql_type_to_spark(col.mysql_type)
        assert mapped.spark_type is not None, col.mysql_type


def test_matrix_ddl_replays_through_registry():
    entry = _matrix_entry()
    assert entry.database == MATRIX_DATABASE
    assert entry.table == MATRIX_TABLE
    # pk + every matrix column registered, in order
    names = [f.name for f in entry.struct.fields]
    assert names == ["pk"] + [c.name for c in MATRIX]
    # the wire transforms the registry prescribes for this table
    assert entry.transformation_map["c_set"] == "set"
    assert entry.transformation_map["c_time"] == "time"
    assert entry.transformation_map["c_time6"] == "time"
    assert entry.transformation_map["c_datetime"] == "datetime"
    assert entry.transformation_map["c_datetime6"] == "datetime"
    assert entry.transformation_map["c_timestamp"] == "timestamp"
    assert "c_date" not in entry.transformation_map


@pytest.mark.parametrize(
    ("name", "expected"),
    [
        # widths: unsigned promotes one level; BIGINT UNSIGNED -> decimal
        ("c_tinyint", T.ByteType()),
        ("c_tinyint_unsigned", T.ShortType()),
        ("c_smallint", T.ShortType()),
        ("c_smallint_unsigned", T.IntegerType()),
        ("c_mediumint_unsigned", T.LongType()),
        ("c_int", T.IntegerType()),
        ("c_int_unsigned", T.LongType()),
        ("c_bigint", T.LongType()),
        ("c_bigint_unsigned", T.DecimalType(20, 0)),
        # MySQL itself promotes FLOAT(p>24) to double
        ("c_float5", T.FloatType()),
        ("c_float30", T.DoubleType()),
        ("c_fixed", T.DecimalType(9, 3)),
        ("c_decimal_signed", T.DecimalType(12, 11)),
        # multi-word spellings
        ("c_double_precision", T.DoubleType()),
        ("c_national_varchar", T.StringType()),
        ("c_varying", T.StringType()),
        ("c_national_char", T.StringType()),
        ("c_character", T.StringType()),
        # families
        ("c_date", T.DateType()),
        ("c_datetime6", T.TimestampNTZType()),
        ("c_timestamp6", T.TimestampType()),
        ("c_time6", T.LongType()),
        ("c_year4", T.IntegerType()),
        ("c_binary", T.BinaryType()),
        ("c_longblob", T.BinaryType()),
        ("c_enum", T.StringType()),
        ("c_set", T.ArrayType(T.StringType())),
    ],
)
def test_registered_spark_type(name, expected):
    entry = _matrix_entry()
    by_name = {f.name: f.dataType for f in entry.struct.fields}
    assert by_name[name] == expected


def test_matrix_covers_reference_families():
    """The matrix carries at least one column per reference type family
    (and the reference's SIGNED/UNSIGNED/ZEROFILL axes on the int side)."""
    ddl = type_matrix_ddl().upper()
    for family in (
        "TINYINT",
        "SMALLINT",
        "MEDIUMINT",
        " INT",
        "BIGINT",
        "BOOL",
        "DECIMAL",
        "DEC(",
        "FIXED",
        "NUMERIC",
        "FLOAT",
        "DOUBLE",
        "DOUBLE PRECISION",
        "REAL",
        "DATE",
        "DATETIME",
        "DATETIME(6)",
        "TIMESTAMP",
        "TIMESTAMP(6)",
        "TIME",
        "TIME(6)",
        "YEAR",
        "CHAR",
        "NCHAR",
        "NATIONAL CHAR",
        "VARCHAR",
        "NVARCHAR",
        "NATIONAL VARCHAR",
        "CHARACTER VARYING",
        "TINYTEXT",
        "TEXT",
        "MEDIUMTEXT",
        "LONGTEXT",
        "BINARY",
        "VARBINARY",
        "TINYBLOB",
        "BLOB",
        "MEDIUMBLOB",
        "LONGBLOB",
        "ENUM",
        "SET",
        "UNSIGNED ZEROFILL",
        " SIGNED",
    ):
        assert family in ddl, f"matrix DDL missing {family}"


def test_matrix_wire_output_schema(spark, sf_dir):
    """The wire projection carries pk + envelope identity + one wire
    column per matrix column, with registry-driven wire types."""
    from mysql_streamer_spark.queries.type_matrix import q_cdc_type_matrix

    df = q_cdc_type_matrix(spark, str(sf_dir))
    assert df.columns[:5] == [
        "pk",
        "schema_id",
        "database_name",
        "table_name",
        "message_type",
    ]
    assert df.columns[5:] == [c.name for c in MATRIX]
    wire = dict(df.dtypes)
    assert wire["c_bigint_unsigned"] == "string"  # decimal travels as string
    assert wire["c_float"] == "double"  # float widens for hashing
    assert wire["c_float30"] == "double"
    assert wire["c_date"] == "string"
    assert wire["c_datetime6"] == "string"  # ISO-8601
    assert wire["c_timestamp6"] == "bigint"  # epoch µs
    assert wire["c_time6"] == "bigint"  # µs since midnight
    assert wire["c_binary"] == "string"  # decoded back
    assert wire["c_set"] == "string"  # sorted, comma-joined
