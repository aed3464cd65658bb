"""Streaming-plane correctness query: run the CHECKPOINTED Structured
Streaming form of the envelope pipeline end-to-end (readStream ->
foreachBatch -> idempotent sink), then return the sink contents. The oracle
is the exact same SQL as the batch ``cdc_envelope`` — the streaming plane
must produce byte-identical messages to the batch plan.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from mysql_streamer_spark.queries.cdc import _ENVELOPE_SELECT, _ORACLE_PIPELINE_CTES
from mysql_streamer_spark.queries.registry import QuerySpec
from mysql_streamer_spark.streaming import read_sink, run_envelope_stream
from mysql_streamer_spark.tables import table_path


def q_streaming_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = tempfile.mkdtemp(prefix="mss_stream_")
    # the file stream source wants a directory; link the table in
    src = f"{work}/src"
    os.makedirs(src)
    os.symlink(table_path(sf_dir, "events"), f"{src}/events.parquet")
    run_envelope_stream(
        spark, src, f"{work}/out", f"{work}/ckpt", max_files_per_trigger=1
    )
    return read_sink(spark, f"{work}/out")


SPECS = [
    QuerySpec(
        "streaming_envelope",
        q_streaming_envelope,
        _ORACLE_PIPELINE_CTES + _ENVELOPE_SELECT,
    ),
]
