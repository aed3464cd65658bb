"""Query registry: every implemented operator exposed as a (spark, sf_dir)
-> DataFrame callable plus (where SQL-expressible) a DuckDB oracle string.

``__spark_entry__.py`` aggregates ALL_SPECS into the driver contract
(queries() / oracle_sql()).
"""

from __future__ import annotations

from mysql_streamer_spark.queries.registry import QuerySpec, collect


def all_specs() -> list[QuerySpec]:
    from mysql_streamer_spark.queries import (
        cdc,
        dedup,
        schema_registry,
        similarity,
        textops,
    )

    modules = [cdc, schema_registry, textops, dedup, similarity]
    # families still under construction register themselves when present
    for optional in ("analytics", "multimodal", "streaming_q"):
        try:
            modules.append(
                __import__(
                    f"mysql_streamer_spark.queries.{optional}", fromlist=[optional]
                )
            )
        except ImportError:
            pass
    return collect(modules)
