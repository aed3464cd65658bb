"""Skew-resistant aggregation shapes.

AQE splits skewed SHUFFLE JOIN partitions, but two common shapes stay
skew-exposed at 100 TB:

- ``row_number() = 1`` windows: every row of a hot key lands in ONE task
  and sorts there. ``latest_by_key`` computes the same answer as one hash
  aggregate with map-side partial combine (``max_by`` is algebraic), so a
  hot key reduces locally on every input partition first.
- ``collect_list`` on a hot key: not algebraic, one reducer gets the whole
  key. ``salted_collect_list`` splits each key across ``n_salts`` partial
  collectors and flattens — two small shuffles instead of one hot one.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Iterable[str],
    order_col: str,
    payload_cols: Iterable[str],
) -> DataFrame:
    """Latest row per key by ``order_col`` (must be unique per key, e.g. a
    transaction id). Output columns: keys + payload_cols + order_col."""
    keys, payload_cols = list(keys), list(payload_cols)
    picked = F.max_by(F.struct(order_col, *payload_cols), F.col(order_col)).alias("p")
    agg = df.groupBy(*keys).agg(picked)
    return agg.select(*keys, f"p.{order_col}", *(f"p.{c}" for c in payload_cols))


def salted_collect_list(
    df: DataFrame, keys: Iterable[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """collect_list per key in two phases through a salt column; element
    order is NOT defined (collect_list never defines one anyway)."""
    keys = list(keys)
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.col(value_col).cast("string")), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.collect_list(value_col).alias("_part")
    )
    return (
        partial.groupBy(*keys)
        .agg(F.flatten(F.collect_list("_part")).alias(f"{value_col}_list"))
    )
