"""P2 — payload type transforms, applied to data.

The reference transforms each decoded binlog value per its column type
before publishing (util/message_builder.py:90-106, map built from SHOW
COLUMNS in schema_wrapper.py:146-162):

- SET       : Python set -> list            (here: sorted array — a set has
              no order; sorting makes the wire value deterministic)
- TIMESTAMP : naive -> UTC-aware            (here: TimestampType, session UTC)
- DATETIME  : -> ISO-8601 string            (here: fixed 6-digit fraction)
- TIME      : timedelta -> µs since 00:00   (here: parse 'HH:MM:SS.ffffff')

Here the transformation_map comes from the SchemaRegistry (the table's DDL
decides which transforms apply — the r1 gap was that the map was built but
never applied to any data), and each transform is a pure column expression:
the whole step stays in whole-stage codegen, per-row Python never runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ISO-8601 with fixed 6-digit microseconds (DuckDB strftime '%f' parity).
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
TIME_FMT = "HH:mm:ss.SSSSSS"


def _time_string_to_micros(col: str) -> Column:
    """'HH:MM:SS.ffffff' -> microseconds since midnight (long)."""
    return (
        (
            F.substring(col, 1, 2).cast("long") * 3600
            + F.substring(col, 4, 2).cast("long") * 60
            + F.substring(col, 7, 2).cast("long")
        )
        * 1_000_000
        + F.substring(col, 10, 6).cast("long")
    )


#: wire-transform tag (schema/mysql_types.py) -> column-expression builder
WIRE_TRANSFORMS = {
    "set": lambda c: F.array_sort(F.col(c)),
    "timestamp": lambda c: F.col(c),  # session tz pinned UTC = already aware
    "datetime": lambda c: F.date_format(F.col(c), ISO_FMT),
    "time": _time_string_to_micros,
}


def apply_wire_transforms(df: DataFrame, transformation_map: dict[str, str]) -> DataFrame:
    """Apply the registry's per-column transforms to whichever mapped
    columns are present (absent columns are simply not in this payload)."""
    for col, tag in transformation_map.items():
        if col in df.columns:
            df = df.withColumn(col, WIRE_TRANSFORMS[tag](col))
    return df


def synthesize_typed_payload(df: DataFrame) -> DataFrame:
    """Deterministic typed columns for the CDC fixture (FIXTURES.md §F2
    families: DECIMAL, DATE, DATETIME, TIME, SET), derived from the event
    row so the DuckDB oracle reproduces them exactly.

    The DECIMAL goes through an exact integer-cents -> string -> decimal
    path because a double->decimal cast's rounding mode is engine-private.
    """
    cents = F.floor(F.col("payload_val") * 100 + F.lit(0.5)).cast("long")
    amount_str = F.concat(
        (cents / 100).cast("long").cast("string"),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
    )
    tags_raw = F.expr(
        "filter(array("
        "CASE WHEN event_id % 2 = 0 THEN 'c' END, "
        "CASE WHEN payload_k % 2 = 0 THEN 'a' END, "
        "CASE WHEN pk % 3 = 0 THEN 'b' END), x -> x IS NOT NULL)"
    )
    return (
        df.withColumn("amount", amount_str.cast("decimal(12,2)"))
        .withColumn("event_date", F.to_date("timestamp"))
        .withColumn("created_dt", F.col("timestamp"))
        .withColumn("wake_time", F.date_format("timestamp", TIME_FMT))
        .withColumn("tags", tags_raw)
    )
