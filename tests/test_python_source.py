"""The pluggable Python DataSource (connectors/python_source.py) must be
indistinguishable from the built-in parquet scan."""

from __future__ import annotations


def test_python_source_matches_load_table(spark, sf_dir):
    from mysql_streamer_spark.connectors.python_source import (
        events_from_python_source,
    )
    from mysql_streamer_spark.tables import load_table

    via_source = events_from_python_source(spark, sf_dir)
    direct = load_table(spark, sf_dir, "events")
    assert via_source.schema == direct.schema
    a = {tuple(r) for r in via_source.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b


def test_python_source_registration_is_idempotent(spark, sf_dir):
    from mysql_streamer_spark.connectors.python_source import (
        register_binlog_source,
    )

    register_binlog_source(spark)
    register_binlog_source(spark)  # second call must be a no-op


# ---------------------------------------------------------------------------
# the WRITE half: two-phase-commit JSONL sink
# ---------------------------------------------------------------------------


def test_python_writer_commits_manifest_and_roundtrips(spark, sf_dir, tmp_path):
    import json
    import os

    from mysql_streamer_spark.connectors.python_source import (
        register_binlog_source,
    )
    from mysql_streamer_spark.tables import load_table

    register_binlog_source(spark)
    out = str(tmp_path / "sink")
    df = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    df.write.format("binlog_events").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["committed"] is True
    assert manifest["total_rows"] == df.count()
    assert sum(s["rows"] for s in manifest["shards"]) == df.count()
    # no torn state: staging swept away entirely, every manifest shard present
    assert not os.path.exists(os.path.join(out, "_staging"))
    for s in manifest["shards"]:
        assert os.path.exists(os.path.join(out, s["file"]))

    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back.count() == df.count()
    a = {(r.event_id, r.user_id, r.event_type, round(r.value, 9)) for r in df.collect()}
    b = {(r.event_id, r.user_id, r.event_type, round(r.value, 9)) for r in back.collect()}
    assert a == b


def test_python_writer_append_merges_manifest_generations(
    spark, sf_dir, tmp_path
):
    """Two append jobs into the same directory: the second commit must MERGE
    its shards into the existing manifest, not replace it — otherwise the
    first generation's files silently vanish from the manifest."""
    import json
    import os

    from mysql_streamer_spark.connectors.python_source import (
        register_binlog_source,
    )
    from mysql_streamer_spark.tables import load_table

    register_binlog_source(spark)
    out = str(tmp_path / "sink")
    full = load_table(spark, sf_dir, "events").select("event_id")
    n = full.count()
    full.write.format("binlog_events").option("path", out).mode("append").save()
    full.limit(7).coalesce(1).write.format("binlog_events").option(
        "path", out
    ).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == n + 7
    on_disk = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert on_disk == sorted(s["file"] for s in manifest["shards"])
    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back.count() == n + 7


def test_python_writer_staging_sweep_is_job_scoped(spark, sf_dir, tmp_path):
    """The staging sweep is scoped to THIS job's shards: a foreign staged
    shard (a concurrent writer's in-flight work, now plausible since
    append mode merges generations) must SURVIVE the commit — and must
    never leak into the manifest."""
    import json
    import os

    from mysql_streamer_spark.connectors.python_source import (
        register_binlog_source,
    )
    from mysql_streamer_spark.tables import load_table

    register_binlog_source(spark)
    out = str(tmp_path / "sink")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    foreign = os.path.join(staging, "part-deadbeef-0.jsonl")
    with open(foreign, "w") as fh:
        fh.write('{"event_id": -1}\n')

    df = load_table(spark, sf_dir, "events").select("event_id").limit(5)
    df.coalesce(1).write.format("binlog_events").option("path", out).mode(
        "append"
    ).save()

    assert os.path.exists(foreign), "another job's staged shard survives"
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 5
    assert all("deadbeef" not in s["file"] for s in manifest["shards"])


def test_python_writer_sweep_scoping_unit(tmp_path):
    """_sweep_staging removes exactly this writer's orphaned attempt
    shards, leaves a concurrent writer's shards, and drops the directory
    only once it is fully empty."""
    import os

    from mysql_streamer_spark.connectors.python_source import (
        ManifestJsonlWriter,
    )

    out = str(tmp_path / "sink")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    w = ManifestJsonlWriter({"path": out}, None, overwrite=False)
    mine = os.path.join(staging, f"part-{w.job_token}-attempt1.jsonl")
    theirs = os.path.join(staging, "part-otherjob-attempt1.jsonl")
    for p in (mine, theirs):
        with open(p, "w") as fh:
            fh.write("{}\n")

    w._sweep_staging()
    assert not os.path.exists(mine), "own speculative shard swept"
    assert os.path.exists(theirs), "foreign shard untouched"
    assert os.path.isdir(staging), "dir kept while foreign work remains"

    os.remove(theirs)
    w._sweep_staging()
    assert not os.path.exists(staging), "empty staging dir removed"


def test_python_writer_overwrite_replaces_previous_generation(
    spark, sf_dir, tmp_path
):
    import json
    import os

    from mysql_streamer_spark.connectors.python_source import (
        register_binlog_source,
    )
    from mysql_streamer_spark.tables import load_table

    register_binlog_source(spark)
    out = str(tmp_path / "sink")
    full = load_table(spark, sf_dir, "events").select("event_id")
    full.write.format("binlog_events").option("path", out).mode("append").save()
    small = full.limit(10)
    small.write.format("binlog_events").option("path", out).mode(
        "overwrite"
    ).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 10
    on_disk = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert sorted(on_disk) == sorted(s["file"] for s in manifest["shards"])
    assert spark.read.json(os.path.join(out, "*.jsonl")).count() == 10


def test_python_writer_abort_leaves_no_visible_data(spark, sf_dir, tmp_path):
    import os

    import pytest
    from pyspark.sql import functions as F

    from mysql_streamer_spark.connectors.python_source import (
        register_binlog_source,
    )
    from mysql_streamer_spark.tables import load_table

    register_binlog_source(spark)
    out = str(tmp_path / "sink")

    @F.udf("long")
    def boom(x):
        raise RuntimeError("injected task failure")

    df = load_table(spark, sf_dir, "events").select(boom("event_id").alias("x"))
    with pytest.raises(Exception):
        df.write.format("binlog_events").option("path", out).mode(
            "append"
        ).save()
    # no manifest, no committed shards — a manifest-requiring reader sees
    # nothing
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))
    assert not [f for f in os.listdir(out) if f.endswith(".jsonl")]
