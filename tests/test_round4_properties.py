"""Property-style checks for the round-4 operators: Morton-code
bijectivity over the full grid, and Debezium encode→decode losslessness
on adversarial rows (extreme doubles, JSON-hostile identifiers)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_morton_code_is_a_bijection_on_the_grid(spark):
    """Every (x, y) cell of the 256x256 grid must map to a DISTINCT
    Morton code in [0, 65536) — interleaving that lost bits would assign
    rows to wrong files silently."""
    from mysql_streamer_spark.queries.analytics import ZORDER_BITS, _morton_sql

    grid = 2 ** ZORDER_BITS
    df = spark.range(grid * grid).select(
        (F.col("id") % grid).alias("x"), (F.col("id") / grid).cast("long").alias("y")
    )
    codes = df.select(F.expr(_morton_sql("x", "y", "div")).alias("m"))
    row = codes.agg(
        F.countDistinct("m").alias("n"),
        F.min("m").alias("lo"),
        F.max("m").alias("hi"),
    ).collect()[0]
    assert row.n == grid * grid
    assert row.lo == 0 and row.hi == grid * grid - 1


def test_debezium_roundtrip_is_lossless_on_adversarial_rows(spark):
    """encode(parse(x)) == x for rows with extreme doubles, nulls, and
    JSON-hostile identifier characters (quotes, backslashes, unicode)."""
    from mysql_streamer_spark.connectors.kafka import (
        cdc_to_debezium_json,
        debezium_to_cdc,
    )

    ts = datetime.datetime(2024, 3, 1, 12, 34, 56, 789123)
    rows = []
    hostile_tables = ['t"quoted"', "t\\back\\slash", "t_unicodé_表"]
    vals = [0.0, -0.0, 1e308, 5e-324, 123.456, -1.0 / 3.0]
    for i, v in enumerate(vals):
        rows.append(
            (
                i,
                "db_0",
                hostile_tables[i % len(hostile_tables)],
                ["create", "update", "delete"][i % 3],
                ts,
                "binlog.000001",
                4 + i,
                0,
                1000 + i,
                None if i % 2 else i,
                v,
                (v - 1.0) if i % 3 == 1 else None,
            )
        )
    cdc = spark.createDataFrame(
        rows,
        "event_id long, database string, `table` string, message_type string, "
        "timestamp timestamp, log_file string, log_pos long, offset int, "
        "pk long, payload_k int, payload_val double, before_val double",
    )
    back = debezium_to_cdc(cdc_to_debezium_json(cdc))
    got = {r.event_id: r for r in back.collect()}
    for r in cdc.collect():
        g = got[r.event_id]
        assert g.database == r.database
        assert g.table == r.table
        assert g.message_type == r.message_type
        assert g.timestamp == r.timestamp  # µs preserved via ts_us
        assert g.log_file == r.log_file and g.log_pos == r.log_pos
        assert g.pk == r.pk and g.payload_k == r.payload_k
        # double -> string -> double must be value-exact (incl. -0.0 sign
        # collapse is NOT acceptable: compare bit patterns via repr)
        assert repr(g.payload_val) == repr(r.payload_val)
        if r.message_type == "update":
            assert repr(g.before_val) == repr(r.before_val)
