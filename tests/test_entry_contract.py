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


def test_every_query_has_an_oracle():
    """The gate is only as strong as its coverage: every registered query
    must carry a DuckDB oracle (none are rows-only any more)."""
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles == qs, f"missing oracles: {qs - oracles}"
