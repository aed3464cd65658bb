"""applyInPandasWithState sessionizer: cross-batch state continuation and
agreement with the batch sessionization plan."""

from __future__ import annotations

import pandas as pd
import pytest

from mysql_streamer_spark.streaming.stateful import (
    GAP_MINUTES,
    run_session_stream,
)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    df.coalesce(1).write.mode("append").parquet(path)


T0 = pd.Timestamp("2024-01-01 00:00:00")


def _ts(minutes):
    return (T0 + pd.Timedelta(minutes=minutes)).to_pydatetime()


def test_sessions_close_across_micro_batches(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # batch 1: user 1 has an open session; user 2 completes one + opens one
    _write_events(
        spark,
        src,
        [
            (0, _ts(0), 1),
            (1, _ts(10), 1),
            (2, _ts(0), 2),
            (3, _ts(90), 2),  # gap 90 min -> closes (0..0), opens (90..)
        ],
    )
    # batch 2 (later file): user 1's session continues then closes via gap
    _write_events(
        spark,
        src,
        [
            (4, _ts(20), 1),          # continues session (0,10,20)
            (5, _ts(20 + GAP_MINUTES + 1), 1),  # closes it, opens new
        ],
    )
    run_session_stream(spark, src, out, ckpt, max_files_per_trigger=1)
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(out).collect()
    }

    def us(minutes):
        return int((T0 + pd.Timedelta(minutes=minutes)).value // 1000)

    assert (2, us(0), us(0), 1) in got, "session closed by in-batch gap"
    assert (1, us(0), us(20), 3) in got, "session continued ACROSS batches"
    # open sessions (user 1 @51min, user 2 @90min) are withheld in state
    assert len(got) == 2


def test_stream_sessions_match_batch_plan_for_closed_sessions(spark, sf_dir, tmp_path):
    """Emitted sessions == batch sessionization minus each user's final
    (still-open) session."""
    import os

    from mysql_streamer_spark.queries.analytics import q_analytics_sessions
    from mysql_streamer_spark.tables import table_path
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    os.makedirs(src)
    os.symlink(table_path(sf_dir, "events"), f"{src}/events.parquet")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_session_stream(spark, src, out, ckpt)
    got = {
        (r.user_id, r.session_start_us, r.n_events)
        for r in spark.read.parquet(out).collect()
    }

    batch = q_analytics_sessions(spark, sf_dir)
    w = Window.partitionBy("user_id")
    closed = (
        batch.withColumn("last_sess", F.max("session_id").over(w))
        .filter(F.col("session_id") < F.col("last_sess"))
        .select(
            "user_id",
            (F.unix_micros("session_start")).alias("session_start_us"),
            "n_events",
        )
    )
    expected = {
        (r.user_id, r.session_start_us, r.n_events) for r in closed.collect()
    }
    assert got == expected


@pytest.mark.parametrize("gap_exceeded", [True, False])
def test_gap_boundary_is_strict(spark, tmp_path, gap_exceeded):
    src = str(tmp_path / f"src_{gap_exceeded}")
    out, ckpt = (
        str(tmp_path / f"{d}_{gap_exceeded}") for d in ("out", "ckpt")
    )
    delta = GAP_MINUTES + (1 if gap_exceeded else 0)
    _write_events(spark, src, [(0, _ts(0), 7), (1, _ts(delta), 7)])
    # force a second batch so any closed session flushes
    _write_events(spark, src, [(2, _ts(500), 7)])
    run_session_stream(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    n_closed_before_500 = sum(1 for r in rows if r.n_events in (1, 2) and r.session_start_us < 10**18)
    if gap_exceeded:
        assert any(r.n_events == 1 for r in rows), "exactly-gap+1 splits"
    else:
        assert any(r.n_events == 2 for r in rows), "exactly-gap stays one session"


def test_state_survives_a_full_restart(spark, tmp_path):
    """Run, STOP, run again with the same checkpoint: the open session in
    the state store continues across processes, not just micro-batches
    (the reference's unclean-shutdown recovery for stateful operators)."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_events(spark, src, [(0, _ts(0), 5), (1, _ts(10), 5)])
    run_session_stream(spark, src, out, ckpt)  # run 1 drains, session open

    # new data arrives AFTER the first run terminated
    _write_events(spark, src, [(2, _ts(20), 5), (3, _ts(200), 5)])
    run_session_stream(spark, src, out, ckpt)  # run 2 resumes from ckpt

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    (r,) = rows

    def us(minutes):
        return int((T0 + pd.Timedelta(minutes=minutes)).value // 1000)

    # the closed session spans BOTH runs: events at 0, 10 (run 1) + 20 (run 2)
    assert (r.user_id, r.session_start_us, r.session_end_us, r.n_events) == (
        5, us(0), us(20), 3,
    )
