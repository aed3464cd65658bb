"""Connector layer: live sources/sinks behind the same CDC-shape interface
the parquet fixtures use (S1/S8/K1/K2). No live services exist in the test
sandbox, so these are exercised by format/interface tests on in-memory
frames; the parquet path stays the correctness gate."""

from mysql_streamer_spark.connectors.jdbc import (  # noqa: F401
    jdbc_snapshot,
    snapshot_options,
)
from mysql_streamer_spark.connectors.kafka import (  # noqa: F401
    DEBEZIUM_VALUE_SCHEMA,
    debezium_to_cdc,
    kafka_cdc_stream,
)
from mysql_streamer_spark.connectors.sinks import (  # noqa: F401
    envelope_to_kafka_records,
    write_dry_run,
    write_kafka,
)
