"""P2 payload-transform tests (reference util/message_builder.py:90-106
semantics: SET->list, DATETIME->ISO, TIME->µs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_streamer_spark.cdc.payload import (
    WIRE_TRANSFORMS,
    apply_wire_transforms,
    _time_string_to_micros,
)


def test_time_string_to_micros(spark):
    df = spark.createDataFrame(
        [("00:00:00.000000",), ("08:03:07.179575",), ("23:59:59.999999",)],
        "t string",
    )
    out = [r.us for r in df.select(_time_string_to_micros("t").alias("us")).collect()]
    assert out == [
        0,
        (8 * 3600 + 3 * 60 + 7) * 1_000_000 + 179575,
        86_400_000_000 - 1,
    ]


def test_transforms_follow_the_map(spark):
    df = spark.createDataFrame(
        [(["b", "a"], "07:00:00.000001")], "tags array<string>, wake string"
    )
    # only columns named in the map are touched
    out = apply_wire_transforms(df, {"tags": "set", "absent_col": "time"}).collect()[0]
    assert out.tags == ["a", "b"]
    assert out.wake == "07:00:00.000001"
    out2 = apply_wire_transforms(df, {"wake": "time"}).collect()[0]
    assert out2.wake == 7 * 3600 * 1_000_000 + 1
    assert out2.tags == ["b", "a"]


def test_datetime_transform_is_iso_fixed_fraction(spark):
    df = spark.createDataFrame([("2024-03-05 01:02:03",)], "c string").select(
        F.col("c").cast("timestamp").alias("c")
    )
    out = df.select(WIRE_TRANSFORMS["datetime"]("c").alias("v")).collect()[0].v
    assert out == "2024-03-05T01:02:03.000000"
