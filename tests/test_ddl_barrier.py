"""Streaming DDL barrier: mid-stream ALTERs route subsequent rows to the
new schema id, across AND within micro-batches, and recovery from a crash
in the schema-event window converges to the batch as-of semantics
(reference schema_event_handler.py:66-113, 183-203)."""

import pytest

from mysql_streamer_spark.queries.schema_registry import (
    q_cdc_schema_version_routing,
)
from mysql_streamer_spark.streaming.ddl_barrier import (
    run_ddl_barrier_stream,
    stage_barrier_feed,
)
from mysql_streamer_spark.streaming.runner import read_sink


def _routed_agg(spark, out):
    from pyspark.sql import functions as F

    return (
        read_sink(spark, out)
        .groupBy("database", "table", "version", "schema_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def _as_set(df):
    return {
        (r.database, r.table, r.version, r.schema_id, r.n_events, r.first_ts, r.last_ts)
        for r in df.collect()
    }


def test_barrier_matches_batch_asof_routing(spark, sf_dir, tmp_path):
    src, out, ckpt, state = (
        str(tmp_path / d) for d in ("src", "out", "ckpt", "state")
    )
    n_files = stage_barrier_feed(spark, sf_dir, src)
    assert n_files == 6
    n_batches = run_ddl_barrier_stream(spark, src, out, ckpt, state)
    assert n_batches == n_files  # maxFilesPerTrigger=1: one batch per file
    got = _as_set(_routed_agg(spark, out))
    want = _as_set(q_cdc_schema_version_routing(spark, str(sf_dir)))
    assert got == want
    # multiple versions of the same table actually appear — the ALTERs
    # landed mid-stream and split the routing
    multi = {(db, t) for db, t, v, *_ in got if v > 1}
    assert multi, "no version>1 routing: the DDL barrier was never exercised"


def test_barrier_recovers_from_crash_mid_ddl(spark, sf_dir, tmp_path):
    """Crash AFTER the schema-event checkpoint but BEFORE the data write
    (the reference's unclean-shutdown-during-schema-events scenario),
    then restart: deterministic replay + idempotent state application +
    per-batch-id sink overwrite converge to the exact batch result."""
    src, out, ckpt, state = (
        str(tmp_path / d) for d in ("src", "out", "ckpt", "state")
    )
    stage_barrier_feed(spark, sf_dir, src)
    with pytest.raises(Exception, match="injected crash mid-DDL"):
        run_ddl_barrier_stream(
            spark, src, out, ckpt, state, fail_after_batches=2, fail_mode="mid_ddl"
        )
    # the crashed batch checkpointed its state but wrote no data
    import os

    state_ids = sorted(
        int(f[len("after-") : -len(".json")])
        for f in os.listdir(state)
        if f.startswith("after-")
    )
    assert state_ids == [0, 1, 2]
    assert not os.path.exists(os.path.join(out, "batch_id=2"))

    run_ddl_barrier_stream(spark, src, out, ckpt, state)
    got = _as_set(_routed_agg(spark, out))
    want = _as_set(q_cdc_schema_version_routing(spark, str(sf_dir)))
    assert got == want


def test_barrier_recovers_from_crash_before_batch(spark, sf_dir, tmp_path):
    src, out, ckpt, state = (
        str(tmp_path / d) for d in ("src", "out", "ckpt", "state")
    )
    stage_barrier_feed(spark, sf_dir, src)
    with pytest.raises(Exception, match="injected crash before"):
        run_ddl_barrier_stream(spark, src, out, ckpt, state, fail_after_batches=3)
    run_ddl_barrier_stream(spark, src, out, ckpt, state)
    got = _as_set(_routed_agg(spark, out))
    want = _as_set(q_cdc_schema_version_routing(spark, str(sf_dir)))
    assert got == want
