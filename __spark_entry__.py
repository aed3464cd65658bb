"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mysql_streamer_spark/``; queries are registered in
``mysql_streamer_spark/queries/`` as QuerySpec(name, fn, oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_utc(spark: SparkSession) -> None:
    # Timestamp columns must collect identically to DuckDB's UTC-naive ones.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # A vanilla session defaults to 200 shuffle partitions; AQE coalesces
    # batch shuffles but STREAMING state partitioning is fixed at this
    # number per checkpoint — size it to the local machine like our tuned
    # session does.
    try:
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(8, cores)))
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full CDC envelope pipeline on sf0.001 (SURVEY.md §7
    phase 0 — source -> filters -> transforms -> envelope)."""
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline

    _ensure_utc(spark)
    return envelope_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mysql_streamer_spark.queries import all_specs

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for spec in all_specs():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _ensure_utc(spark)
                return fn(spark, sf_dir)

            return run

        out[spec.name] = make(spec.fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from mysql_streamer_spark.queries import all_specs

    return {spec.name: spec.oracle for spec in all_specs() if spec.oracle is not None}
