"""Range (interval-containment) join: left rows matched to intervals with
``start <= left.ts < end`` — the second custom temporal operator Spark has
no built-in for (the first is ``asof.asof_join``).

Scale design: expressed directly, this is a theta-join — Catalyst can only
plan it as BroadcastNestedLoop (fine for a tiny interval side, O(n·m)
otherwise). The bucketed form turns it into an equi-join: each interval
explodes to the fixed-width time buckets it covers, each left row computes
its single bucket, and the join key is the bucket (plus any equi keys).
A (row, interval) pair can only meet in the row's own bucket, so the output
needs NO distinct — explode fan-out is ``ceil(interval_len / bucket)`` per
interval, and the shuffle key is uniform time, with AQE skew-split covering
hot buckets. ``bucket_seconds`` trades explode fan-out (long intervals)
against per-bucket density (short ones); set it near the median interval
length.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: int = 300,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner join of ``left`` to every interval containing its timestamp
    (half-open ``[start, end)``), optionally also equi-matched on ``keys``.
    Empty/inverted intervals (``end <= start``) match nothing.
    """
    bucket_us = bucket_seconds * 1_000_000

    def _bucket(col: F.Column) -> F.Column:
        return F.floor(F.unix_micros(col) / F.lit(bucket_us))

    iv = (
        intervals.filter(F.col(end) > F.col(start))
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    _bucket(F.col(start)),
                    # end is exclusive: the last covered instant is end - 1µs
                    _bucket(F.col(end) - F.expr("INTERVAL 1 MICROSECOND")),
                )
            ),
        )
    )
    lt = left.withColumn("_bucket", _bucket(F.col(left_ts)))
    cond = [lt["_bucket"] == iv["_bucket"]] + [lt[k] == iv[k] for k in keys]
    matched = lt.join(iv, cond).filter(
        (lt[left_ts] >= iv[start]) & (lt[left_ts] < iv[end])
    )
    drop = [iv["_bucket"], lt["_bucket"]] + [iv[k] for k in keys]
    for c in drop:
        matched = matched.drop(c)
    return matched
