"""bucketed_range_join semantics: half-open boundaries, multi-bucket
intervals produce no duplicate pairs, equi-key variant, empty intervals."""

from __future__ import annotations

import datetime as dt

from mysql_streamer_spark.rangejoin import bucketed_range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _left(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def _iv(spark, rows, extra=""):
    return spark.createDataFrame(
        rows, f"iv_id long, start_ts timestamp, end_ts timestamp{extra}"
    )


def test_half_open_boundaries(spark):
    iv = _iv(spark, [(1, _ts("2024-01-01 00:10:00"), _ts("2024-01-01 00:20:00"))])
    left = _left(
        spark,
        [
            (1, _ts("2024-01-01 00:10:00")),  # == start -> in
            (2, _ts("2024-01-01 00:19:59.999999")),  # last µs -> in
            (3, _ts("2024-01-01 00:20:00")),  # == end -> out
            (4, _ts("2024-01-01 00:09:59")),  # before -> out
        ],
    )
    got = {
        r.event_id
        for r in bucketed_range_join(left, iv, bucket_seconds=60).collect()
    }
    assert got == {1, 2}


def test_multi_bucket_interval_no_duplicates(spark):
    # 25-minute interval over 5-minute buckets: 6 exploded buckets, but each
    # matching row must appear exactly once
    iv = _iv(spark, [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:25:00"))])
    left = _left(
        spark,
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=i)) for i in range(30)],
    )
    rows = bucketed_range_join(left, iv, bucket_seconds=300).collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == list(range(25))  # 0..24 in, each exactly once


def test_equi_keys_restrict_matches(spark):
    iv = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"), 7),
            (2, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"), 8),
        ],
        "iv_id long, start_ts timestamp, end_ts timestamp, user_id long",
    )
    left = spark.createDataFrame(
        [(100, _ts("2024-01-01 00:30:00"), 7)],
        "event_id long, ts timestamp, user_id long",
    )
    rows = bucketed_range_join(left, iv, keys=["user_id"]).collect()
    assert [(r.event_id, r.iv_id) for r in rows] == [(100, 1)]


def test_empty_interval_matches_nothing(spark):
    iv = _iv(spark, [(1, _ts("2024-01-01 00:10:00"), _ts("2024-01-01 00:10:00"))])
    left = _left(spark, [(1, _ts("2024-01-01 00:10:00"))])
    assert bucketed_range_join(left, iv).collect() == []
