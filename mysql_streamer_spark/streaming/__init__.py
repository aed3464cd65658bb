"""Structured Streaming execution plane: checkpointed micro-batch runs with
an idempotent sink (T4/T6/T8/R2/R3)."""

from mysql_streamer_spark.streaming.runner import (  # noqa: F401
    load_events_stream,
    run_envelope_stream,
    read_sink,
)
