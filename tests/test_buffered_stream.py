"""S5 peek/pop buffered iterator (connectors/buffered.py): the deque-
buffered lookahead semantics of the reference's
base_binlog_stream_reader_wrapper.py:22-49, and the one decision that
still needs it under micro-batching — transaction-atomic batch cuts."""

from __future__ import annotations

import pytest

from mysql_streamer_spark.connectors.buffered import (
    PeekPopEventStream,
    take_batch_atomic,
)


def _feed(rows):
    def fetch(start, n):
        return rows[start : start + n]

    return fetch


def test_peek_does_not_consume_pop_does():
    s = PeekPopEventStream(_feed(list(range(10))), start_row=0, refill_rows=3)
    assert s.peek() == 0
    assert s.peek() == 0  # repeated peek is idempotent
    assert s.pop() == 0
    assert s.peek() == 1
    assert s.pop() == 1


def test_refills_in_bounded_chunks():
    calls = []

    def fetch(start, n):
        calls.append((start, n))
        rows = list(range(10))[start : start + n]
        return rows

    s = PeekPopEventStream(fetch, start_row=0, refill_rows=4)
    assert [s.pop() for _ in range(10)] == list(range(10))
    # lookahead never asked for more than refill_rows at a time, and the
    # cursor advanced monotonically — no re-reads, no tail materialization
    assert all(n == 4 for _, n in calls)
    assert [c[0] for c in calls] == sorted({c[0] for c in calls})


def test_peek_none_and_pop_raises_at_end_of_stream():
    s = PeekPopEventStream(_feed([7]), start_row=0, refill_rows=2)
    assert s.pop() == 7
    assert s.peek() is None
    with pytest.raises(StopIteration):
        s.pop()


def test_start_row_offsets_the_cursor():
    s = PeekPopEventStream(_feed(list(range(10))), start_row=6, refill_rows=4)
    assert list(s) == [6, 7, 8, 9]


def test_atomic_batch_extends_to_txn_boundary():
    # txn = value div 5; min_rows=3 lands mid-txn 0 -> extend through 4
    s = PeekPopEventStream(_feed(list(range(12))), start_row=0, refill_rows=4)
    batch = take_batch_atomic(s, min_rows=3, txn_of=lambda r: r // 5)
    assert batch == [0, 1, 2, 3, 4]
    # the boundary event was peeked, not consumed
    assert s.peek() == 5


def test_atomic_batch_no_extension_when_cut_is_aligned():
    s = PeekPopEventStream(_feed(list(range(12))), start_row=0, refill_rows=4)
    batch = take_batch_atomic(s, min_rows=5, txn_of=lambda r: r // 5)
    assert batch == [0, 1, 2, 3, 4]


def test_atomic_batch_rejects_nonpositive_min_rows():
    s = PeekPopEventStream(_feed([1, 2, 3]), start_row=0)
    with pytest.raises(ValueError, match="min_rows"):
        take_batch_atomic(s, min_rows=0, txn_of=lambda r: r)


def test_txn_atomic_with_partitioned_reader_is_a_contract_error(spark):
    from mysql_streamer_spark.connectors.python_source import (
        stream_events_from_python_source,
    )

    with pytest.raises(ValueError, match="paced-reader"):
        stream_events_from_python_source(
            spark, "/root/testdata/sf0.001", partitioned=True, txn_atomic=True
        )


def test_atomic_batch_short_at_end_of_stream():
    s = PeekPopEventStream(_feed(list(range(7))), start_row=5, refill_rows=4)
    batch = take_batch_atomic(s, min_rows=10, txn_of=lambda r: r // 5)
    assert batch == [5, 6]
    assert s.peek() is None


def test_atomic_batches_partition_the_stream_without_splitting_txns():
    rows = list(range(103))
    s = PeekPopEventStream(_feed(rows), start_row=0, refill_rows=16)
    batches = []
    while True:
        b = take_batch_atomic(s, min_rows=17, txn_of=lambda r: r // 5)
        if not b:
            break
        batches.append(b)
    assert [r for b in batches for r in b] == rows  # exact partition
    for b in batches[:-1]:
        assert (b[-1] + 1) % 5 == 0  # every interior cut on a txn boundary


def test_stream_reader_txn_atomic_offsets_and_replay(tmp_path):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from mysql_streamer_spark.connectors.python_source import (
        BinlogEventsStreamReader,
    )

    n = 1003
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)], pa.int64()),
            "user_id": pa.array([i % 97 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(tbl, path)

    rdr = BinlogEventsStreamReader(
        {"path": path, "batchrows": "217", "txnatomic": "true"}
    )
    off = rdr.initialOffset()
    spans = []
    while True:
        rows, nxt = rdr.read(off)
        rows = list(rows)
        if not rows:
            break
        spans.append((off["row"], nxt["row"], rows))
        off = nxt
    # exact cover, in order
    assert [r[0] for _, _, rows in spans for r in rows] == list(range(n))
    # every interior cut is a transaction boundary (217 is not)
    for _, end, _ in spans[:-1]:
        assert end % 5 == 0
    # offset-range replay reproduces the identical batch (exactly-once
    # recovery contract: readBetweenOffsets is pure)
    start, end, rows = spans[1]
    replay = list(rdr.readBetweenOffsets({"row": start}, {"row": end}))
    assert replay == rows
