"""asof_join edge cases: equal-timestamp inclusion, no-predecessor NULLs,
and the struct payload guarantee (a NULL field in the matched right row
must not splice in a value from an older right row)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mysql_streamer_spark.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_match_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:05"), "l1"),
            (1, _ts("2024-01-01 00:00:01"), "l0"),  # before any right row
            (2, _ts("2024-01-01 00:00:10"), "l2"),
        ],
        "k long, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:03"), "r3"),
            (1, _ts("2024-01-01 00:00:05"), "r5"),  # equal ts -> must match
            (2, _ts("2024-01-01 00:00:09"), "r9"),
        ],
        "k long, ts timestamp, rval string",
    )
    rows = {
        (r.k, r.lval): (r.rval, r.asof_ts)
        for r in asof_join(left, right, keys=["k"]).collect()
    }
    assert rows[(1, "l1")] == ("r5", _ts("2024-01-01 00:00:05"))
    assert rows[(1, "l0")] == (None, None)
    assert rows[(2, "l2")] == ("r9", _ts("2024-01-01 00:00:09"))


def test_asof_null_field_does_not_splice_rows(spark):
    """Matched right row has rval=NULL; the result must keep that NULL, not
    reach back to the older right row's non-NULL rval."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:09"))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:01"), "old"),
            (1, _ts("2024-01-01 00:00:05"), None),
        ],
        "k long, ts timestamp, rval string",
    )
    row = asof_join(left, right, keys=["k"]).collect()[0]
    assert row.asof_ts == _ts("2024-01-01 00:00:05")
    assert row.rval is None
