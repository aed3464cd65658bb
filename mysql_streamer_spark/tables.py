"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Columns that must surface as a (naive) timestamp regardless of how the
#: driver materialized them. Some testdata generations store these as parquet
#: TIMESTAMP(NANOS) — Spark has no nanosecond timestamp type, so those are
#: read as long (spark.sql.legacy.parquet.nanosAsLong) and truncated to
#: microseconds, matching DuckDB's ns->us truncation; newer generations store
#: TIMESTAMP(MICROS) directly, which needs no conversion. The loader adapts
#: to the actual parquet type so both generations hash-match the oracle.
_TIMESTAMP_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


#: (applicationId, sf_dir, name) -> DataFrame. A DataFrame is an immutable
#: logical plan, so reusing it across queries is safe and skips the
#: parquet-footer schema read (~0.3-0.8 s of py4j/IO per load) that every
#: query in a 100+-query session would otherwise repeat.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    cache_key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _PLAN_CACHE.get(cache_key)
    if cached is not None:
        return cached
    ts_cols = _TIMESTAMP_COLUMNS.get(name, ())
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the NTZ->TIMESTAMP normalization below reads wall-clock values in
        # the SESSION timezone; the oracle's naive timestamps mean UTC, so
        # pin it here — the driver harness builds its own SparkSession and
        # must get the same values as our tuned session
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    dtypes = dict(df.dtypes)
    for c in ts_cols:
        if dtypes.get(c) == "bigint":  # TIMESTAMP(NANOS) read as ns-since-epoch
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            # normalize to TIMESTAMP (session tz is pinned UTC, so the cast
            # is value-preserving): watermarks/windows require TIMESTAMP,
            # and the DuckDB oracle's naive timestamps mean UTC
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    _PLAN_CACHE[cache_key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API paths)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-by-key repartition ahead of hash-heavy per-row map work, ONLY
    when the planned scan parallelism is below the session's cores.

    The local fixtures are ONE parquet split per table, so a md5/shingle
    pass would otherwise run in a single task; the exchange costs one pass
    over a tiny frame and unlocks every core. At cluster scale the input
    already arrives in >= cores splits and spread is now a structural
    NO-OP (r10: it used to emit the exchange unconditionally and rely on
    AQE to keep it cheap — at 100 TB that is a full shuffle of the payload
    for nothing; the partition-count guard removes it outright, guide
    §2.4). Use only in front of compute-bound projections — never to
    'fix' an aggregation (those repartition on their own keys)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, key)
