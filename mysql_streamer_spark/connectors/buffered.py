"""Peek/pop buffered event stream (reference S5).

The reference wraps every binlog stream reader in a deque-buffered
peek/pop interface (replication_handler/components/
base_binlog_stream_reader_wrapper.py:22-49): ``peek()`` looks at the
next event WITHOUT consuming it, ``pop()`` consumes it, and both refill
the deque from the underlying stream on demand. The reference needs the
lookahead to make consume-or-stop decisions it cannot make from already-
consumed events alone — most importantly "is the next event part of the
transaction I am currently emitting?".

Spark's micro-batching subsumes most of that event loop, but the ONE
decision that still genuinely requires single-event lookahead survives
the translation: where to CUT a micro-batch so that no upstream
transaction is split across two batches (a consumer applying each batch
atomically must never see half a transaction). ``take_batch_atomic``
implements exactly that: drain at least ``min_rows`` events, then keep
popping while ``peek()`` shows the next event committing in the same
transaction as the last one taken.

The buffer refills in bounded chunks (``refill_rows``), mirroring the
reference's ``_refill_current_events`` contract — the wrapper never
materializes the tail of the stream, only the lookahead window.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Callable, Iterator, Sequence
from typing import Any

#: Fixture transaction model (shared with queries/cdc.py TXN_EVENTS):
#: TXN_EVENTS consecutive event_ids commit as one upstream transaction.
DEFAULT_TXN_EVENTS = 5


class PeekPopEventStream:
    """Deque-buffered lookahead over a pull-based row feed.

    ``fetch(start, n)`` returns up to ``n`` rows beginning at absolute
    row index ``start`` (fewer only at end-of-stream). The wrapper owns
    the read cursor; callers interact purely through peek/pop, as in the
    reference wrapper.
    """

    def __init__(
        self,
        fetch: Callable[[int, int], Sequence[Any]],
        start_row: int,
        refill_rows: int = 256,
    ):
        if refill_rows <= 0:
            raise ValueError("refill_rows must be positive")
        self._fetch = fetch
        self._cursor = start_row
        self._refill_rows = refill_rows
        self._buf: deque[Any] = deque()
        self._exhausted = False

    def _refill(self) -> None:
        """Pull one bounded chunk into the buffer (the reference's
        ``_refill_current_events``); sets the exhausted flag at EOS
        instead of blocking forever (the fixture feed is finite)."""
        if self._exhausted:
            return
        rows = self._fetch(self._cursor, self._refill_rows)
        if not rows:
            self._exhausted = True
            return
        self._cursor += len(rows)
        self._buf.extend(rows)
        if len(rows) < self._refill_rows:
            self._exhausted = True

    def peek(self) -> Any | None:
        """Next event without taking it out of the stream (reference
        ``peek``); None only at end-of-stream."""
        while not self._buf and not self._exhausted:
            self._refill()
        return self._buf[0] if self._buf else None

    def pop(self) -> Any:
        """Take the next event out of the stream (reference ``pop``)."""
        while not self._buf and not self._exhausted:
            self._refill()
        if not self._buf:
            raise StopIteration("stream exhausted")
        return self._buf.popleft()

    def __iter__(self) -> Iterator[Any]:
        while self.peek() is not None:
            yield self.pop()


def take_batch_atomic(
    stream: PeekPopEventStream,
    min_rows: int,
    txn_of: Callable[[Any], int],
) -> list[Any]:
    """Drain one transaction-atomic micro-batch.

    Pops at least ``min_rows`` events (or everything, at end-of-stream),
    then extends the batch while the PEEKED next event belongs to the
    same transaction as the last event taken — the lookahead decision
    the reference's peek() exists for: the cut cannot be placed without
    inspecting an event that must NOT be consumed if it opens a new
    transaction.
    """
    if min_rows <= 0:
        raise ValueError("min_rows must be positive")
    batch: list[Any] = []
    while len(batch) < min_rows:
        if stream.peek() is None:
            return batch
        batch.append(stream.pop())
    last_txn = txn_of(batch[-1])
    while True:
        nxt = stream.peek()
        if nxt is None or txn_of(nxt) != last_txn:
            return batch
        batch.append(stream.pop())
