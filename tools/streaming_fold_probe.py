"""Streaming commit-lag vs volume probe (VERDICT r9 #7): run the two
registry-integrated streaming queries' stream halves at sf0.1 and at a
k-fold sf_dir, recording PER-BATCH progress (input rows, trigger/addBatch
durations) from StreamingQuery.recentProgress — the evidence that the
DDL-barrier / publish overhead stays control-plane while data grows 10x.

Usage: python tools/streaming_fold_probe.py [SF_DIR ...]
       (default: /root/testdata/sf0.1 /tmp/bigfold)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _progress_summary(progress) -> dict:
    rows = []
    for p in progress:
        d = p.get("durationMs", {})
        rows.append(
            {
                "input_rows": p.get("numInputRows", 0),
                "trigger_ms": d.get("triggerExecution"),
                "add_batch_ms": d.get("addBatch"),
            }
        )
    # drop the empty tail trigger (0 rows) if present
    data = [r for r in rows if r["input_rows"]]
    trig = [r["trigger_ms"] for r in data if r["trigger_ms"] is not None]
    return {
        "n_batches": len(data),
        "total_rows": sum(r["input_rows"] for r in data),
        "trigger_ms_median": statistics.median(trig) if trig else None,
        "trigger_ms_max": max(trig) if trig else None,
        "per_batch": data,
    }


def probe_ddl_barrier(spark, sf_dir: str) -> dict:
    from mysql_streamer_spark.streaming.ddl_barrier import (
        FEED_SCHEMA,
        DdlBarrierHandler,
        stage_barrier_feed,
    )

    work = tempfile.mkdtemp(prefix="mss_fold_barrier_")
    src, out, ckpt, state = (
        f"{work}/src",
        f"{work}/out",
        f"{work}/ckpt",
        f"{work}/state",
    )
    stage_barrier_feed(spark, sf_dir, src)
    handler = DdlBarrierHandler(out, state)
    stream = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    return _progress_summary(progress)


def probe_confluent_publish(spark, sf_dir: str) -> dict:
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline_df
    from mysql_streamer_spark.connectors.avro_wire import payload_to_confluent
    from mysql_streamer_spark.connectors.python_source import (
        stream_events_from_python_source,
    )

    work = tempfile.mkdtemp(prefix="mss_fold_publish_")
    out, ckpt = f"{work}/out", f"{work}/ckpt"
    env = envelope_pipeline_df(
        stream_events_from_python_source(spark, sf_dir, partitioned=True)
    )
    wire = payload_to_confluent(env)

    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

    q = (
        wire.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    return _progress_summary(progress)


def main() -> int:
    from mysql_streamer_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/bigfold"]
    spark = get_spark("streaming_fold_probe")
    results = {}
    for sf_dir in sf_dirs:
        for name, probe in (
            ("streaming_ddl_barrier", probe_ddl_barrier),
            ("streaming_confluent_publish", probe_confluent_publish),
        ):
            s = probe(spark, sf_dir)
            results[f"{name}@{sf_dir}"] = s
            compact = {k: v for k, v in s.items() if k != "per_batch"}
            print(json.dumps({"probe": name, "sf_dir": sf_dir, **compact}), flush=True)
    with open("/tmp/streaming_fold_probe.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print("detail: /tmp/streaming_fold_probe.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
