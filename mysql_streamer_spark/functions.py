"""SQL-function API surface: the engine's text primitives registered as
SQL UDFs (``CREATE TEMPORARY FUNCTION ... RETURN <expr>``), so SQL-first
users call the same logic the DataFrame layer uses.

These are SQL MACROS, not Python UDFs: Catalyst inlines the body into the
calling plan, so they stay inside whole-stage codegen with zero
serialization cost — the function surface adds API, not a slow path. Every
body is generated from the same constants as the Column builders in
``mysql_streamer_spark.text``, so the three surfaces (DataFrame, SQL
function, DuckDB oracle) cannot drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mysql_streamer_spark import text as tx

_W_LEN, _W_DIV, _W_INFO = tx.QUALITY_WEIGHTS
_Q_HI, _Q_LO = tx.QUALITY_THRESHOLDS


def _stopword_list_sql() -> str:
    return ",".join(f"'{w}'" for w in tx.ALL_STOPWORDS)


#: name -> (signature + body). Pure SQL expressions only.
SQL_FUNCTIONS: dict[str, str] = {
    "mss_tokens": (
        f"(t STRING) RETURNS ARRAY<STRING> RETURN split(t, '{tx.TOKEN_DELIM}')"
    ),
    "mss_stopword_hits": (
        "(toks ARRAY<STRING>) RETURNS INT RETURN "
        f"size(filter(toks, t -> t IN ({_stopword_list_sql()})))"
    ),
    "mss_quality_score": (
        "(n_tokens INT, n_distinct INT, stop_hits INT) RETURNS DOUBLE RETURN "
        f"least(1.0D, CAST(n_tokens AS DOUBLE) / {tx.QUALITY_TOKEN_TARGET}D)"
        f" * {_W_LEN}D"
        f" + (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * {_W_DIV}D"
        f" + (1.0D - CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
        f" * {_W_INFO}D"
    ),
    "mss_quality_class": (
        "(score DOUBLE) RETURNS STRING RETURN "
        f"CASE WHEN score >= {_Q_HI}D THEN 'high' "
        f"WHEN score >= {_Q_LO}D THEN 'medium' ELSE 'low' END"
    ),
}


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration of every SQL macro in this session."""
    for name, body in SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
