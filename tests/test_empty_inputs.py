"""SF-0 robustness sweep: every registered query must run (and return an
empty or summary result, not crash) when every input table is EMPTY — the
cold-start / quiet-partition case a production pipeline hits on day one
and at every idle window. Streaming queries are exercised via their batch
building blocks elsewhere; the file-source staging requires at least one
row, so they are skipped here."""

from __future__ import annotations

import os

import pytest

from mysql_streamer_spark.tables import TABLE_NAMES, load_table

_SKIP = {
    # file-stream staging needs a non-empty source directory semantics
    "streaming_changelog",
    "streaming_envelope",
    "streaming_windowed_counts",
    "streaming_stateful_sessions",
    "streaming_dedup_replay",
    "streaming_interval_join",
    "streaming_upsert_state",
    "streaming_session_window",
    # an all-empty feed never fires a micro-batch, so the sink directory
    # is never created; the batch form is covered via cdc_python_source_envelope
    "streaming_python_source",
    # same staging constraint: the query splits the source via duckdb COPY
    # into per-batch files, which an empty spark-written directory breaks;
    # the profile merge itself is covered by test_transform_with_state_profiles
    "streaming_transform_with_state",
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """Every fixture table with its real schema and zero rows."""
    out = str(tmp_path_factory.mktemp("sf0"))
    for t in TABLE_NAMES:
        if t == "events":
            # keep ts as the raw nanos-long so load_table's div-1000
            # conversion applies to the empty fixture exactly as it does
            # to the driver's parquet
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(0)
        else:
            df = load_table(spark, sf_dir, t).limit(0)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def test_every_query_survives_empty_inputs(spark, empty_sf_dir):
    from mysql_streamer_spark.queries import all_specs

    failures = []
    for spec in all_specs():
        if spec.name in _SKIP:
            continue
        try:
            n = spec.fn(spark, empty_sf_dir).count()
            assert n >= 0
        except Exception as exc:  # noqa: BLE001 - collecting a report
            failures.append((spec.name, repr(exc)[:200]))
        finally:
            spark.catalog.clearCache()
    assert failures == []
