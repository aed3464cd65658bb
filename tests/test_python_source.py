"""The pluggable Python DataSource (connectors/python_source.py) must be
indistinguishable from the built-in parquet scan."""

from __future__ import annotations


def test_python_source_matches_load_table(spark, sf_dir):
    from mysql_streamer_spark.connectors.python_source import (
        events_from_python_source,
    )
    from mysql_streamer_spark.tables import load_table

    via_source = events_from_python_source(spark, sf_dir)
    direct = load_table(spark, sf_dir, "events")
    assert via_source.schema == direct.schema
    a = {tuple(r) for r in via_source.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b


def test_python_source_registration_is_idempotent(spark, sf_dir):
    from mysql_streamer_spark.connectors.python_source import (
        register_binlog_source,
    )

    register_binlog_source(spark)
    register_binlog_source(spark)  # second call must be a no-op
