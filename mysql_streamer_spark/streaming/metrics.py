"""Streaming metrics (R8): the reference emits per-event-type counters and
a replication-delay gauge with a Sensu alert above
``max_delay_allowed_in_seconds`` (batch/parse_replication_stream_internal.
py:47-88, simple_binlog_stream_reader_wrapper.py:81-124). The Spark-native
form is a StreamingQueryListener over micro-batch progress events:
rows/batch, processing rate, and batch duration come from the engine;
threshold breaches surface as flagged observations instead of a Sensu
client.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

#: Reference alert threshold (failure_recovery_test.py:148).
MAX_DELAY_ALLOWED_SECONDS = 600


@dataclass
class BatchMetric:
    batch_id: int
    num_input_rows: int
    duration_ms: int
    alert: bool


@dataclass
class MetricsCollector:
    """Accumulated per-batch metrics for one streaming run."""

    max_batch_seconds: float = MAX_DELAY_ALLOWED_SECONDS
    batches: list[BatchMetric] = field(default_factory=list)

    @property
    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)

    @property
    def alerts(self) -> list[BatchMetric]:
        return [b for b in self.batches if b.alert]


class EnvelopeStreamListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener``; detach with
    ``removeListener`` when the run ends."""

    def __init__(self, collector: MetricsCollector) -> None:
        self.collector = collector

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration = p.durationMs.get("triggerExecution", 0)
        self.collector.batches.append(
            BatchMetric(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=duration,
                alert=duration / 1000.0 > self.collector.max_batch_seconds,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
