"""MySQL column type -> Spark DataType mapping (SURVEY.md §1.2).

The reference derives schemas dynamically from ``SHOW CREATE TABLE`` /
``SHOW COLUMNS`` on its shadow tracker DB (schema_tracker.py:83-113) and
hands MySQL type strings to its Avro converter; here the same type strings
map onto Spark types. The wire-transform quirks the reference applies per
row (message_builder.py:90-106) are encoded as the ``wire_transform`` tag so
the payload-transform step (cdc) can apply the equivalent column expression:

- ``set``       : MySQL SET decodes to a Python set -> sorted list
- ``timestamp`` : naive -> UTC-aware (Spark TimestampType, session UTC)
- ``datetime``  : kept wall-clock (TimestampNTZ; ISO string on the wire)
- ``time``      : TIME(fsp) -> microseconds since midnight (long)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

_TYPE_RE = re.compile(
    r"""^\s*
    (?P<name>[a-zA-Z]+(?:\s+(?:precision|char|varchar|varying)\b)?)  # base name, incl. 'double precision' / 'national char' / 'character varying'
    \s*(?:\(\s*(?P<args>[^)]*)\s*\))?   # optional (p[,s]) / (len) / enum values
    (?:\s+(?P<tail>.*))?$               # unsigned / zerofill / charset noise
    """,
    re.VERBOSE | re.IGNORECASE,
)


@dataclass(frozen=True)
class MappedType:
    spark_type: T.DataType
    #: wire-transform tag, see module docstring; None = pass through
    wire_transform: str | None = None


def mysql_type_to_spark(type_str: str) -> MappedType:
    """Map a MySQL column type string (as in DDL / SHOW COLUMNS) to Spark.

    Handles signed/unsigned/zerofill integer widths, DECIMAL(p,s), the
    temporal family with fsp, string/binary families, ENUM and SET.
    """
    m = _TYPE_RE.match(type_str)
    if not m:
        raise ValueError(f"unparseable MySQL type: {type_str!r}")
    name = m.group("name").strip().lower()
    args = m.group("args")
    tail = (m.group("tail") or "").lower()
    unsigned = "unsigned" in tail

    def dec_args() -> tuple[int, int]:
        if not args:
            return (10, 0)
        parts = [p.strip() for p in args.split(",")]
        p = int(parts[0])
        s = int(parts[1]) if len(parts) > 1 else 0
        return (p, s)

    if name in ("tinyint", "bool", "boolean"):
        # tinyint(1) is conventionally bool, but the reference passes ints
        return MappedType(T.ShortType() if unsigned else T.ByteType())
    if name == "smallint":
        return MappedType(T.IntegerType() if unsigned else T.ShortType())
    if name in ("mediumint", "int", "integer"):
        return MappedType(T.LongType() if unsigned else T.IntegerType())
    if name == "bigint":
        # unsigned BIGINT exceeds long range -> DecimalType(20,0)
        return MappedType(T.DecimalType(20, 0) if unsigned else T.LongType())
    if name == "year":
        return MappedType(T.IntegerType())
    if name in ("decimal", "dec", "numeric", "fixed"):
        p, s = dec_args()
        return MappedType(T.DecimalType(p, s))
    if name == "float":
        # FLOAT(p>24) is promoted to double by MySQL itself
        if args and "," not in args and int(args) > 24:
            return MappedType(T.DoubleType())
        return MappedType(T.FloatType())
    if name in ("double", "real", "double precision"):
        return MappedType(T.DoubleType())
    if name == "date":
        return MappedType(T.DateType())
    if name == "datetime":
        return MappedType(T.TimestampNTZType(), wire_transform="datetime")
    if name == "timestamp":
        return MappedType(T.TimestampType(), wire_transform="timestamp")
    if name == "time":
        return MappedType(T.LongType(), wire_transform="time")
    if name in (
        "char",
        "character",
        "varchar",
        "tinytext",
        "text",
        "mediumtext",
        "longtext",
        "nchar",
        "nvarchar",
        "national char",
        "national varchar",
        "character varying",
    ):
        return MappedType(T.StringType())
    if name in ("binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob", "bit"):
        return MappedType(T.BinaryType())
    if name == "enum":
        return MappedType(T.StringType())
    if name == "set":
        return MappedType(T.ArrayType(T.StringType()), wire_transform="set")
    if name == "json":
        return MappedType(T.StringType())
    raise ValueError(f"unsupported MySQL type: {type_str!r}")
