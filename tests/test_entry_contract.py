"""Smoke-check the driver contract: entry() runs, queries() all return
DataFrames whose columns match the oracle declarations."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "schema_id" in df.columns


def test_every_query_runs(spark, sf_dir):
    qs = entrymod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_oracles_subset_of_queries():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs
