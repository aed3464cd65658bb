"""As-of (point-in-time) join: for every left row, attach the most recent
right row at-or-before the left row's timestamp within the same key group.

The reference's heartbeat searcher (``components/heartbeat_searcher.py``)
answers the single-point form of this question — "the binlog position in
effect at timestamp T"; this operator is the distributed set form (every
left row gets its own T), which Spark lacks as a built-in.

Scale design: the naive formulations are a range join (``l.ts >= r.ts``
theta-join — O(n·m) without a range-join optimizer) or a per-row sort-merge
search. Instead we union the two sides with a side tag and compute a
running ``last(payload, ignoreNulls)`` over one window partitioned by the
join keys and ordered by ``(ts, side)``. That is exactly ONE shuffle on the
keys (the partitioning a downstream keyed sink would reuse), no row
explosion, and skew is bounded by the hottest single key group. The right
payload travels as one struct so a NULL field inside a matched row can't
splice values from different right rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """Backward as-of join (DuckDB ``ASOF LEFT JOIN`` semantics).

    Every left row keeps its columns and gains ``right_cols`` plus
    ``right_ts_alias`` (the matched right row's timestamp) from the latest
    right row with ``right.ts <= left.ts`` and equal ``keys``; NULLs when
    no right row precedes it. ``right`` must be unique per ``(keys, ts)``
    — pre-aggregate it otherwise (ties inside ``right`` would make the
    match order-dependent in any engine).
    """
    keyset = set(keys) | {ts}
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keyset]
    left_cols = [c for c in left.columns if c not in keyset]

    payload = F.struct(
        F.col(ts).alias(right_ts_alias),
        *[F.col(c) for c in right_cols],
    )
    tagged_right = right.select(
        *keys,
        F.col(ts).alias(ts),
        F.lit(0).alias("_side"),
        payload.alias("_asof_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    tagged_left = left.select(
        *keys,
        F.col(ts).alias(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_right.schema["_asof_payload"].dataType).alias(
            "_asof_payload"
        ),
        *left_cols,
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_asof_payload", ignorenulls=True).over(w)
    return (
        tagged_right.unionByName(tagged_left)
        .withColumn("_m", matched)
        .filter(F.col("_side") == 1)
        .select(
            *keys,
            ts,
            *left_cols,
            F.col(f"_m.{right_ts_alias}").alias(right_ts_alias),
            *[F.col(f"_m.{c}").alias(c) for c in right_cols],
        )
    )
