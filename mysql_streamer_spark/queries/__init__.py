"""Query registry: every implemented operator exposed as a (spark, sf_dir)
-> DataFrame callable plus (where SQL-expressible) a DuckDB oracle string.

``__spark_entry__.py`` aggregates ALL_SPECS into the driver contract
(queries() / oracle_sql()). Imports are deliberately unconditional: a
missing module is a build break, not a silently smaller engine.
"""

from __future__ import annotations

from mysql_streamer_spark.queries.registry import QuerySpec, collect


def all_specs() -> list[QuerySpec]:
    from mysql_streamer_spark.queries import (
        analytics,
        cdc,
        dedup,
        multimodal,
        pipeline,
        relational,
        schema_registry,
        similarity,
        streaming_q,
        textops,
    )

    return collect(
        [
            cdc,
            schema_registry,
            textops,
            dedup,
            similarity,
            pipeline,
            analytics,
            relational,
            multimodal,
            streaming_q,
        ]
    )
