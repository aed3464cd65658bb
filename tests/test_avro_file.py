"""Avro Object Container File framing (connectors/avro_file.py): spec-pinned
header/blocks plus the distributed write/read roundtrip."""

from __future__ import annotations

import io
import zlib

import pytest

from mysql_streamer_spark.connectors.avro_file import (
    MAGIC,
    _decode_meta_map,
    read_ocf,
    write_ocf,
)
from mysql_streamer_spark.connectors.avro_wire import TRANSACTION_ID_SCHEMA

_RECS = [
    {"cluster_name": f"c{i}", "log_file": f"binlog.{i:06d}", "log_pos": 4 + i}
    for i in range(10)
]
_SCHEMA_JSON = '{"type":"record"}'  # metadata payload only; reader uses the dict


def _file(codec: str) -> bytes:
    fh = io.BytesIO()
    n = write_ocf(iter(_RECS), TRANSACTION_ID_SCHEMA, _SCHEMA_JSON, fh, codec=codec, sync_seed="t")
    assert n == len(_RECS)
    return fh.getvalue()


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(codec):
    raw = _file(codec)
    assert raw[:4] == MAGIC  # the spec's magic: 'Obj' 0x01
    assert read_ocf(raw, TRANSACTION_ID_SCHEMA) == _RECS


def test_ocf_header_metadata_layout():
    raw = _file("deflate")
    meta, pos = _decode_meta_map(raw, 4)
    assert meta["avro.schema"] == _SCHEMA_JSON.encode()
    assert meta["avro.codec"] == b"deflate"
    sync = raw[pos : pos + 16]
    assert len(sync) == 16 and raw.endswith(sync)  # every block ends in sync


def test_ocf_deflate_is_raw_deflate():
    """The codec must be headerless DEFLATE (wbits=-15), not zlib-wrapped —
    a zlib header would break real Avro readers."""
    raw = _file("deflate")
    _, pos = _decode_meta_map(raw, 4)
    pos += 16  # sync
    # first block: count, size, body
    from mysql_streamer_spark.connectors.avro_wire import read_long

    count, pos = read_long(raw, pos)
    size, pos = read_long(raw, pos)
    body = raw[pos : pos + size]
    assert count == len(_RECS)
    zlib.decompress(body, wbits=-15)  # raw deflate decodes
    with pytest.raises(zlib.error):
        zlib.decompress(body)  # ...and zlib-wrapped does NOT


def test_ocf_corrupt_sync_detected():
    raw = bytearray(_file("null"))
    raw[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bytes(raw), TRANSACTION_ID_SCHEMA)


def test_spark_envelope_ocf_roundtrip(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline
    from mysql_streamer_spark.connectors.avro_file import (
        read_envelope_avro_files,
        write_envelope_avro_files,
    )

    env = envelope_pipeline(spark, sf_dir)
    out = str(tmp_path / "ocf")
    write_envelope_avro_files(env.repartition(4), out)
    import os

    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(parts) == 4  # one OCF per partition
    decoded = read_envelope_avro_files(spark, out).withColumn(
        "timestamp", F.timestamp_micros("ts_us")
    )
    assert decoded.filter(~F.col("meta_ok")).count() == 0
    cols = env.columns
    assert env.select(*cols).exceptAll(decoded.select(*cols)).count() == 0
    assert decoded.select(*cols).exceptAll(env.select(*cols)).count() == 0


def test_spark_envelope_ocf_empty_feed_keeps_readable_sink(spark, sf_dir, tmp_path):
    """An empty feed can plan to ZERO partitions (AQE coalesces the spread
    exchange away) — the sink must still leave >= 1 OCF so the glob reader
    resolves, and the roundtrip must return 0 rows (r10 regression test)."""
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline
    from mysql_streamer_spark.connectors.avro_file import (
        read_envelope_avro_files,
        write_envelope_avro_files,
    )

    env = envelope_pipeline(spark, sf_dir).filter("schema_id < 0")  # empty
    out = str(tmp_path / "ocf_empty")
    write_envelope_avro_files(env, out)
    import os

    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(parts) >= 1  # header-only OCF keeps the reader's glob valid
    assert read_envelope_avro_files(spark, out).count() == 0


def test_write_ocf_rejects_unknown_codec():
    fh = io.BytesIO()
    with pytest.raises(ValueError, match="unsupported avro codec"):
        write_ocf(iter(_RECS), TRANSACTION_ID_SCHEMA, _SCHEMA_JSON, fh, codec="snappy")
