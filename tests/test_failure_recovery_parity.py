"""Failure-recovery parity battery: every scenario shape in the
reference's tests/integration/failure_recovery_test.py mapped one-to-one
onto the Spark stack (Python streaming source, manifest/per-batch sinks,
state table, DDL barrier), in one place — the previously piecemeal
coverage folded into a single battery (VERDICT r8 #6).

| reference scenario (failure_recovery_test.py) | here |
|---|---|
| :227 stop after N events, restart, publish once | test_stop_restart_publishes_once |
| :349 saved topic/offset state exactly describes durable data | test_saved_offsets_describe_durable_sink |
| :493 unclean shutdown DURING a schema event | test_unclean_shutdown_during_schema_event |
| :621 table rename handling | test_rename_unregisters_old_name |
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from mysql_streamer_spark.cdc.pipeline import envelope_pipeline, envelope_pipeline_df


def _run_python_source_stream_with_manifest_sink(
    spark, sf_dir, work, fail_after=None, batch_rows=300
):
    """The envelope pipeline from the pluggable Python source, each
    micro-batch committed through the two-phase-commit MANIFEST sink into
    its own batch_id dir (idempotent on replay). Returns batches done."""
    from mysql_streamer_spark.connectors.python_source import (
        register_binlog_source,
        stream_events_from_python_source,
    )

    register_binlog_source(spark)
    env = envelope_pipeline_df(
        stream_events_from_python_source(spark, sf_dir, batch_rows=batch_rows)
    )
    done = [0]

    def process(batch_df, batch_id):
        if fail_after is not None and done[0] >= fail_after:
            raise RuntimeError(f"injected crash before batch {batch_id}")
        batch_df.write.format("binlog_events").option(
            "path", f"{work}/out/batch_id={batch_id}"
        ).mode("overwrite").save()
        done[0] += 1

    q = (
        env.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{work}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return done[0]


def _manifest_rows(work):
    """Sum of committed rows across every batch dir, asserting the
    torn-write contract on each manifest along the way."""
    total = 0
    out = f"{work}/out"
    for d in sorted(os.listdir(out)):
        manifest = json.load(open(os.path.join(out, d, "_MANIFEST.json")))
        assert manifest["committed"] is True
        for s in manifest["shards"]:
            assert os.path.exists(os.path.join(out, d, s["file"]))
        assert not os.path.exists(os.path.join(out, d, "_staging"))
        total += manifest["total_rows"]
    return total


@pytest.mark.parametrize("fail_after", [1, 2])
def test_stop_restart_publishes_once(spark, sf_dir, tmp_path, fail_after):
    """Reference :227-347: halt the service after a subset of events,
    restart, assert every change published EXACTLY once — here over the
    Python streaming source with the 2PC manifest sink, so the claim is
    checked at the manifest level (committed rows) AND the value level
    (multiset equality with the batch envelope)."""
    work = str(tmp_path)
    with pytest.raises(Exception, match="injected crash"):
        _run_python_source_stream_with_manifest_sink(
            spark, str(sf_dir), work, fail_after=fail_after
        )
    partial = _manifest_rows(work)
    expected = envelope_pipeline(spark, str(sf_dir))
    n_expected = expected.count()
    assert 0 < partial < n_expected

    _run_python_source_stream_with_manifest_sink(spark, str(sf_dir), work)
    assert _manifest_rows(work) == n_expected
    got = spark.read.json(f"{work}/out/*/*.jsonl")
    assert got.count() == n_expected
    # exactly-once at the key level: the idempotency key is unique
    assert got.select("cluster_name", "txn_order").distinct().count() == n_expected


def test_saved_offsets_describe_durable_sink(spark, sf_dir, tmp_path):
    """Reference :349-491: on failure, the state table holds the correct
    topic+offset info — asserted exactly: the saved per-topic high-water
    marks and counts equal what is DURABLY in the sink at crash time (no
    phantom progress), and after restart the totals land exactly once."""
    from mysql_streamer_spark.streaming import read_sink, run_envelope_stream
    from mysql_streamer_spark.streaming.state_table import (
        load_state,
        load_topic_offsets,
    )
    from mysql_streamer_spark.tables import load_table

    src = str(tmp_path / "events_src")
    load_table(spark, str(sf_dir), "events").repartition(4).write.parquet(src)
    out, ckpt, state = (str(tmp_path / d) for d in ("out", "ckpt", "state"))

    with pytest.raises(Exception, match="injected crash"):
        run_envelope_stream(
            spark,
            src,
            out,
            ckpt,
            max_files_per_trigger=1,
            fail_after_batches=2,
            state_dir=state,
        )
    durable = read_sink(spark, out)
    saved = load_topic_offsets(spark, state)
    by_topic = {
        r.topic: (r.max_txn_order, r.n_messages)
        for r in saved.groupBy("topic")
        .agg(
            F.max("max_txn_order").alias("max_txn_order"),
            F.sum("n_messages").alias("n_messages"),
        )
        .collect()
    }
    actual = {
        r.topic: (r.max_txn_order, r.n)
        for r in durable.withColumn(
            "topic", F.concat_ws(".", "database_name", "table_name")
        )
        .groupBy("topic")
        .agg(F.max("txn_order").alias("max_txn_order"), F.count("*").alias("n"))
        .collect()
    }
    assert by_topic == actual, "state table out of sync with durable sink"
    pos, batch_id, clean = load_state(spark, state, "refresh_primary")
    assert batch_id == 1 and clean is False

    run_envelope_stream(
        spark, src, out, ckpt, max_files_per_trigger=1, state_dir=state
    )
    expected = envelope_pipeline_df(spark.read.parquet(src))
    got = read_sink(spark, out)
    assert got.count() == expected.count()
    assert (
        got.select("cluster_name", "txn_order").distinct().count() == got.count()
    )


def test_unclean_shutdown_during_schema_event(spark, sf_dir, tmp_path):
    """Reference :493-619: crash WHILE handling an ALTER (after the schema
    checkpoint, before the data write), restart, assert the schema event
    is REPROCESSED idempotently and no data event is missed or doubled."""
    from mysql_streamer_spark.queries.schema_registry import (
        q_cdc_schema_version_routing,
    )
    from mysql_streamer_spark.streaming.ddl_barrier import (
        run_ddl_barrier_stream,
        stage_barrier_feed,
    )
    from mysql_streamer_spark.streaming.runner import read_sink

    src, out, ckpt, state = (
        str(tmp_path / d) for d in ("src", "out", "ckpt", "state")
    )
    stage_barrier_feed(spark, str(sf_dir), src)
    with pytest.raises(Exception, match="mid-DDL"):
        run_ddl_barrier_stream(
            spark, src, out, ckpt, state, fail_after_batches=1, fail_mode="mid_ddl"
        )
    # the schema event checkpointed but its data never landed
    crashed_state = json.load(open(os.path.join(state, "after-1.json")))
    assert not os.path.exists(os.path.join(out, "batch_id=1"))

    run_ddl_barrier_stream(spark, src, out, ckpt, state)
    # idempotent reprocess: replaying the schema event left state identical
    replayed_state = json.load(open(os.path.join(state, "after-1.json")))
    assert replayed_state == crashed_state
    got = (
        read_sink(spark, out)
        .groupBy("database", "table", "version", "schema_id")
        .agg(F.count("*").alias("n_events"))
    )
    want = q_cdc_schema_version_routing(spark, str(sf_dir)).select(
        "database", "table", "version", "schema_id", "n_events"
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_rename_unregisters_old_name(spark, sf_dir, tmp_path):
    """Reference :621-745: after RENAME TABLE old TO new, the old name is
    unregistered (events still arriving under it resolve to NO schema id —
    the cache-reset window of schema_event_handler.py:115-121) and the new
    name carries the history."""
    from mysql_streamer_spark.schema.bootstrap import bootstrap_registry

    reg = bootstrap_registry()
    tables = set(reg.tables())
    assert ("db_1", "error_archive") in tables
    assert ("db_1", "error") not in tables
    # the rename is scoped: db_0's error table is untouched
    assert ("db_0", "error") in tables

    env = envelope_pipeline(spark, str(sf_dir))
    old_name = env.filter(
        (F.col("database_name") == "db_1") & (F.col("table_name") == "error")
    )
    n_old = old_name.count()
    assert n_old > 0, "fixture must still emit events under the old name"
    assert old_name.filter(F.col("schema_id").isNotNull()).count() == 0
