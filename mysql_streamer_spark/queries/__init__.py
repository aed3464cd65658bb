"""Query registry: every implemented operator exposed as a (spark, sf_dir)
-> DataFrame callable plus (where SQL-expressible) a DuckDB oracle string.

``__spark_entry__.py`` aggregates ALL_SPECS into the driver contract
(queries() / oracle_sql()).
"""

from __future__ import annotations

from mysql_streamer_spark.queries.registry import QuerySpec, collect


def all_specs() -> list[QuerySpec]:
    from mysql_streamer_spark.queries import cdc

    modules = [cdc]
    try:
        from mysql_streamer_spark.queries import analytics

        modules.append(analytics)
    except ImportError:
        pass
    try:
        from mysql_streamer_spark.queries import textops

        modules.append(textops)
    except ImportError:
        pass
    try:
        from mysql_streamer_spark.queries import dedup

        modules.append(dedup)
    except ImportError:
        pass
    try:
        from mysql_streamer_spark.queries import similarity

        modules.append(similarity)
    except ImportError:
        pass
    return collect(modules)
