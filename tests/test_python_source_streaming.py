"""Streaming form of the pluggable source: offset tracking, checkpointed
restart, and exactly-once delivery through an idempotent per-batch sink —
the custom-source analogue of the file-source failure_recovery tests."""

from __future__ import annotations

import pytest


def _run_stream(spark, sf_dir, out, ckpt, fail_after=None, partitioned=False):
    from mysql_streamer_spark.connectors.python_source import (
        stream_events_from_python_source,
    )

    df = stream_events_from_python_source(
        spark, sf_dir, batch_rows=300, partitioned=partitioned
    )
    seen = {"n": 0}

    def handle(batch_df, batch_id):
        # idempotent sink: a replayed batch overwrites its own batch-id
        # directory instead of appending a duplicate
        batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")
        seen["n"] += 1
        if fail_after is not None and seen["n"] >= fail_after:
            raise RuntimeError("injected crash")

    q = (
        df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        exc = q.exception()
        q.stop()
    if exc is not None:
        raise RuntimeError(str(exc))
    return seen["n"]


def _read_out(spark, out):
    return spark.read.option("basePath", out).parquet(f"{out}/batch_id=*")


def test_stream_clean_run_delivers_everything_once(spark, sf_dir, tmp_path):
    from mysql_streamer_spark.tables import load_table

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    n_batches = _run_stream(spark, sf_dir, out, ckpt)
    expected = load_table(spark, sf_dir, "events")
    n_expected = expected.count()
    assert n_batches >= (n_expected + 299) // 300
    got = _read_out(spark, out)
    assert got.count() == n_expected
    assert got.select("event_id").distinct().count() == n_expected


def test_stream_crash_restart_is_exactly_once(spark, sf_dir, tmp_path):
    from mysql_streamer_spark.tables import load_table

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, sf_dir, out, ckpt, fail_after=1)

    expected = load_table(spark, sf_dir, "events")
    n_expected = expected.count()
    partial = _read_out(spark, out).count()
    assert 0 < partial < n_expected

    # restart from the SAME checkpoint: Spark replays the uncommitted
    # offset range via readBetweenOffsets, then drains the rest
    _run_stream(spark, sf_dir, out, ckpt)
    got = _read_out(spark, out)
    assert got.count() == n_expected, "lost or duplicated events"
    assert got.select("event_id").distinct().count() == n_expected
    # value-level equality with the batch path
    direct = expected.select("event_id", "ts", "user_id")
    via = got.select("event_id", "ts", "user_id")
    assert via.exceptAll(direct).count() == 0
    assert direct.exceptAll(via).count() == 0


def test_stream_reader_handles_int64_nanos_ts(tmp_path):
    """The legacy generation surfaces ts as plain int64 NANOS; the
    streaming reader must divide to µs exactly like the batch reader
    (previously only timestamp[ns] was converted and int64 passed through
    1000x too large)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_streamer_spark.connectors.python_source import (
        BinlogEventsStreamReader,
    )

    path = str(tmp_path / "events_int64.parquet")
    ns = 1_700_000_000_000_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([ns, ns + 2_000], pa.int64()),
                "user_id": pa.array([7, 8], pa.int64()),
                "event_type": pa.array(["a", "b"], pa.string()),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array(["{}", "{}"], pa.string()),
            }
        ),
        path,
    )
    rows = BinlogEventsStreamReader({"path": path})._rows(0, 2)
    assert [r[1] for r in rows] == [ns // 1000, (ns + 2_000) // 1000]


def test_partitioned_stream_delivers_everything_once(spark, sf_dir, tmp_path):
    """The executor-parallel streamReader drains the feed with the same
    exactly-once set semantics as the paced simple reader."""
    from mysql_streamer_spark.tables import load_table

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    n_batches = _run_stream(spark, sf_dir, out, ckpt, partitioned=True)
    assert n_batches >= 1
    expected = load_table(spark, sf_dir, "events")
    n_expected = expected.count()
    got = _read_out(spark, out)
    assert got.count() == n_expected
    assert got.select("event_id").distinct().count() == n_expected
    direct = expected.select("event_id", "ts", "user_id")
    via = got.select("event_id", "ts", "user_id")
    assert via.exceptAll(direct).count() == 0
    assert direct.exceptAll(via).count() == 0


def test_partitioned_stream_crash_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Crash mid-batch, restart from the checkpoint: Spark re-issues
    partitions() with the WAL's exact offsets (the reader holds no pacing
    state, so replay is a pure function of the files) and the idempotent
    sink absorbs the overwrite."""
    import pytest as _pytest

    from mysql_streamer_spark.tables import load_table

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with _pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, sf_dir, out, ckpt, fail_after=1, partitioned=True)
    _run_stream(spark, sf_dir, out, ckpt, partitioned=True)
    expected = load_table(spark, sf_dir, "events")
    n_expected = expected.count()
    got = _read_out(spark, out)
    assert got.count() == n_expected, "lost or duplicated events"
    assert got.select("event_id").distinct().count() == n_expected


def test_partitioned_reader_splits_ranges_and_prunes_row_groups(sf_dir):
    """Driver-side unit contract: partitions() tiles [start, end) into
    per-file row ranges capped at partitionrows, and read() returns
    exactly the requested slice."""
    import os

    import pyarrow as pa

    from mysql_streamer_spark.connectors.python_source import (
        BinlogEventsPartitionedStreamReader,
    )

    path = os.path.join(sf_dir, "events.parquet")
    r = BinlogEventsPartitionedStreamReader(
        {"path": path, "partitionrows": "100"}
    )
    total = r.latestOffset()["row"]
    assert total > 0 and r.initialOffset() == {"files": [], "row": 0}
    # v1 {"row": N} offsets (pre-manifest checkpoints) still tile correctly
    parts = r.partitions({"row": 50}, {"row": 450})
    assert sum(p.end_row - p.start_row for p in parts) == 400
    assert all(p.end_row - p.start_row <= 100 for p in parts)
    rows = pa.Table.from_batches(
        [b for p in parts for b in r.read(p)]
    )
    assert rows.num_rows == 400
    # empty range -> one sentinel partition, zero rows
    empty = r.partitions({"row": 10}, {"row": 10})
    assert len(empty) == 1 and list(r.read(empty[0])) == []


def test_partitioned_reader_offsets_carry_manifest_and_reject_mutation(tmp_path):
    """ADVICE r5: offsets were bare row counts over files sorted by name,
    so a late file sorting BEFORE existing ones silently remapped
    committed offsets. Offsets now carry the per-file manifest; any
    non-append-only change to the feed fails loudly at the next trigger
    instead of duplicating/dropping rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from mysql_streamer_spark.connectors.python_source import (
        BinlogEventsPartitionedStreamReader,
    )

    def _write(name: str, n: int, base: int) -> None:
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(base, base + n), pa.int64()),
                    "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)], pa.int64()),
                    "user_id": pa.array([1] * n, pa.int64()),
                    "event_type": pa.array(["insert"] * n),
                    "value": pa.array([1.0] * n, pa.float64()),
                    "props": pa.array(["{}"] * n),
                }
            ),
            str(tmp_path / name),
        )

    _write("part-bb.parquet", 10, 0)
    r = BinlogEventsPartitionedStreamReader({"path": str(tmp_path)})
    first = r.latestOffset()
    assert first["files"] == [["part-bb.parquet", 10]] and first["row"] == 10

    # append-only growth (a file sorting AFTER) is the legal mutation
    _write("part-cc.parquet", 5, 10)
    second = r.latestOffset()
    assert second["files"] == [["part-bb.parquet", 10], ["part-cc.parquet", 5]]
    parts = r.partitions(first, second)
    assert sum(p.end_row - p.start_row for p in parts) == 5

    # a file arriving that sorts BEFORE committed ones must fail loudly
    _write("part-aa.parquet", 3, 100)
    with pytest.raises(ValueError, match="non-append-only"):
        r.latestOffset()
    # and partitions() against the stale manifest refuses too (fresh
    # reader instance = the restart case, no in-memory last manifest)
    r2 = BinlogEventsPartitionedStreamReader({"path": str(tmp_path)})
    with pytest.raises(ValueError, match="non-append-only"):
        r2.partitions(first, second)
