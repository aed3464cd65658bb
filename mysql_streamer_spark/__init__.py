"""mysql_streamer_spark — a PySpark-native CDC + analytics engine.

A from-scratch rebuild of the capabilities of Yelp/mysql_streamer
(``replication_handler``, Apache-2.0) on Apache Spark: the reference is a
MySQL-binlog CDC stream processor (source -> filter -> transform -> envelope
-> exactly-once sink, plus a DDL/schema-registry control plane); this package
re-expresses that dataflow with the Spark DataFrame / Structured Streaming
API, and layers the analytics + training-data-pipeline operators a large
Spark deployment needs on top of the CDC tables.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, UTC, Arrow).
- ``tables``     : loaders for the driver's synthetic parquet tables.
- ``cdc``        : the reference's data plane — envelope builder, filters,
                   payload/type transforms, changelog mode, positions.
- ``schema``     : the reference's control plane — MySQL DDL classifier,
                   schema registry, MySQL->Spark type mapping.
- ``state``      : checkpoint/state tables + position lookup (recovery).
- ``streaming``  : Structured Streaming form of the pipeline (exactly-once).
- ``operators``  : analytics operators (latest-state, as-of join, top-k,
                   sessionization, dedup family, similarity search).
- ``functions``  : column-level function library (text stats, vectors).
- ``multimodal`` : binary-column (image/audio) plumbing with stubbed codecs.

Everything here derives from public knowledge only: the Apache Spark API and
the archived Yelp/mysql_streamer reference (studied for behavior, not code).
"""

__version__ = "0.1.0"
