"""Differential pins for the fused secure-wire kernels
(connectors/secure_wire.py) against the composed operators they fuse
(cdc/encryption.py ciphers + connectors/avro_wire.py secure codec).

The fusion is an optimization-round change: it halves the Python stage
boundaries on the encrypted-publish paths. These tests are the guarantee
the round's contract demands — the fused kernels produce EXACTLY the
composed operators' bytes and rows, so no declared query's results can
move."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mysql_streamer_spark.cdc.encryption import (
    EncryptionConfig,
    decrypt_envelope,
    decrypt_envelope_with_ring,
    encrypt_envelope,
    encrypt_envelope_with_ring,
    load_key_ring,
    resource_key_location,
)
from mysql_streamer_spark.cdc.pipeline import envelope_pipeline
from mysql_streamer_spark.connectors.avro_wire import (
    avro_to_secure_envelope,
    secure_envelope_to_avro,
)
from mysql_streamer_spark.connectors.secure_wire import (
    _prev_iv_py,
    avro_open_secure_envelope,
    restore_opened_payloads,
    seal_to_avro,
)


@pytest.fixture(scope="module")
def env(spark, sf_dir):
    return envelope_pipeline(spark, sf_dir)


@pytest.fixture(scope="module")
def cfg():
    return EncryptionConfig("AES_MODE_CBC-1", resource_key_location())


def test_prev_iv_python_matches_jvm(spark):
    """_prev_iv_py must equal unhex(md5(hex(iv))) under Spark's hex
    semantics for arbitrary IV bytes (incl. bytes that force both hex
    digit cases and a zero lead byte)."""
    ivs = [os.urandom(16) for _ in range(8)] + [
        bytes(16),
        bytes.fromhex("00ff10abcdef0123456789aa55e01b7c"),
    ]
    df = spark.createDataFrame([(iv,) for iv in ivs], "iv binary").select(
        "iv", F.unhex(F.md5(F.hex(F.col("iv")))).alias("jvm_prev")
    )
    for row in df.collect():
        assert bytes(row.jvm_prev) == _prev_iv_py(bytes(row.iv))


def test_seal_to_avro_bytes_match_composed(env, cfg):
    """Publish side, single key: fused wire bytes == composed wire bytes,
    bit for bit (deterministic IV mode makes the comparison exact)."""
    composed = sorted(
        bytes(r.value)
        for r in secure_envelope_to_avro(encrypt_envelope(env, cfg)).collect()
    )
    fused = sorted(bytes(r.value) for r in seal_to_avro(env, cfg).collect())
    assert fused == composed
    assert len(fused) == env.count()


def test_seal_to_avro_ring_bytes_match_composed(env):
    """Publish side, key ring: rows route to per-row key generations
    identically in both stacks."""
    loc = resource_key_location()
    ring = load_key_ring(loc)
    assert len(ring) >= 2, "fixture key dir must hold two generations"
    etype = F.when(
        F.coalesce(F.col("pk"), F.lit(0)) % 2 == 0, F.lit("AES_MODE_CBC-1")
    ).otherwise(F.lit("AES_MODE_CBC-2"))
    composed = sorted(
        bytes(r.value)
        for r in secure_envelope_to_avro(
            encrypt_envelope_with_ring(env, loc, etype)
        ).collect()
    )
    fused = sorted(
        bytes(r.value) for r in seal_to_avro(env, ring, etype).collect()
    )
    assert fused == composed


def _normalize(rows):
    return sorted(
        tuple(str(v) for v in r) for r in (row.asDict().values() for row in rows)
    )


def test_fused_roundtrip_rows_match_composed(env, cfg):
    """Consume side: fused decode+open -> restore == composed decode ->
    decrypt, value-equal row for row (and both equal the plaintext
    envelope on the payload columns)."""
    wire = seal_to_avro(env, cfg)
    fused = restore_opened_payloads(
        avro_open_secure_envelope(wire, cfg)
        .withColumn("timestamp", F.timestamp_micros("ts_us"))
        .drop("ts_us")
    )
    landed = avro_to_secure_envelope(wire)
    composed = decrypt_envelope(
        landed.withColumn("timestamp", F.timestamp_micros("ts_us")).drop("ts_us"),
        cfg,
    )
    assert set(fused.columns) == set(composed.columns)
    cols = sorted(fused.columns)
    f_rows = _normalize(fused.select(*cols).collect())
    c_rows = _normalize(composed.select(*cols).collect())
    assert f_rows == c_rows
    # and the payload columns survive the full encrypt->wire->decrypt trip
    base = _normalize(
        env.select("pk", "payload_k", "payload_val", "txn_order").collect()
    )
    got = _normalize(
        fused.select("pk", "payload_k", "payload_val", "txn_order").collect()
    )
    assert got == base


def test_fused_ring_roundtrip_matches_composed(env):
    """Key-rotation consume: the fused open picks the key each message's
    encryption_type names, exactly like decrypt_envelope_with_ring."""
    loc = resource_key_location()
    ring = load_key_ring(loc)
    etype = F.when(
        F.coalesce(F.col("pk"), F.lit(0)) % 2 == 0, F.lit("AES_MODE_CBC-1")
    ).otherwise(F.lit("AES_MODE_CBC-2"))
    wire = seal_to_avro(env, ring, etype)
    fused = restore_opened_payloads(
        avro_open_secure_envelope(wire, ring)
        .withColumn("timestamp", F.timestamp_micros("ts_us"))
        .drop("ts_us")
    )
    mixed = encrypt_envelope_with_ring(env, loc, etype)
    composed = decrypt_envelope_with_ring(mixed, loc)
    cols = sorted(set(fused.columns) & set(composed.columns))
    assert _normalize(fused.select(*cols).collect()) == _normalize(
        composed.select(*cols).collect()
    )


def test_fused_open_rejects_tampered_ciphertext(spark, env, cfg):
    """A flipped wire byte inside the ciphertext must fail HMAC-first in
    the fused kernel, same as the composed _open. (r11, ADVICE r10: the
    old byte-at--24 flip landed inside the trailing meta ARRAY, so the
    failure was an Avro/Unicode decode error and the broad regex passed
    without ever exercising HMAC verification.)"""
    from mysql_streamer_spark.connectors.avro_wire import (
        SECURE_ENVELOPE_SCHEMA,
        compile_decoder,
        compile_encoder,
    )

    raw = [bytes(r.value) for r in seal_to_avro(env.limit(4), cfg).collect()]
    rec, _ = compile_decoder(SECURE_ENVELOPE_SCHEMA)(raw[0], 0)
    # compute the exact byte length of the trailing meta array with the
    # compiled field encoder, then flip a byte 5 BEFORE it: that byte is
    # ciphertext (previous_payload's tail when present, else payload's —
    # both carry in-field trailing HMAC tags over IV || ct)
    meta_suffix = bytearray()
    compile_encoder(SECURE_ENVELOPE_SCHEMA["fields"][-1]["type"])(
        rec["meta"], meta_suffix
    )
    flip = len(raw[0]) - len(meta_suffix) - 5
    bad = raw[0][:flip] + bytes([raw[0][flip] ^ 0xFF]) + raw[0][flip + 1 :]
    wire = spark.createDataFrame([(bad,)], "value binary")
    with pytest.raises(Exception, match="HMAC|authentication"):
        avro_open_secure_envelope(wire, cfg).collect()


def test_fused_open_unknown_key_fails_loudly(spark, env, cfg):
    """A message naming an encryption_type outside the consumer's ring
    must raise the no-key-in-ring error, not decrypt to garbage."""
    wire = seal_to_avro(env.limit(4), cfg)
    with pytest.raises(Exception, match="no key in ring"):
        avro_open_secure_envelope(
            wire, {"AES_MODE_CBC-9": b"\x00" * 32}
        ).collect()
