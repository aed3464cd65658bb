"""AES-CBC envelope encryption (cdc/encryption.py): the reference's
encrypted-publish contract (end_to_end_test.py:551-600) — config parsing,
key derivation, lossless roundtrip, tamper/ wrong-key failure, and the
redaction+encryption composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def config():
    from mysql_streamer_spark.cdc.encryption import (
        EncryptionConfig,
        resource_key_location,
    )

    return EncryptionConfig("AES_MODE_CBC-1", resource_key_location())


def _envelope(spark, sf_dir):
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline

    return envelope_pipeline(spark, sf_dir)


def test_encryption_type_parses_algo_and_key_id(config):
    assert config.algorithm == "AES_MODE_CBC"
    assert config.key_id == 1


def test_unknown_algorithm_rejected():
    from mysql_streamer_spark.cdc.encryption import EncryptionConfig

    with pytest.raises(ValueError, match="unsupported"):
        EncryptionConfig("ROT13_MODE_X-1", "/tmp").algorithm
    with pytest.raises(ValueError, match="ALGO-KEYID"):
        EncryptionConfig("AES_MODE_CBC", "/tmp").key_id  # no key id


def test_key_is_32_bytes_and_deterministic(config):
    k1, k2 = config.load_key(), config.load_key()
    assert k1 == k2 and len(k1) == 32


def test_roundtrip_restores_every_payload_column(spark, sf_dir, config):
    from mysql_streamer_spark.cdc.encryption import (
        decrypt_envelope,
        encrypt_envelope,
    )

    env = _envelope(spark, sf_dir).cache()
    cols = [
        "txn_order",
        "pk",
        "payload_k",
        "payload_val",
        "previous_payload_val",
    ]
    restored = decrypt_envelope(encrypt_envelope(env, config), config)
    orig = {r.txn_order: r for r in env.select(*cols).collect()}
    back = {r.txn_order: r for r in restored.select(*cols).collect()}
    env.unpersist()
    assert orig.keys() == back.keys() and len(orig) > 0
    for k in orig:
        assert orig[k] == back[k]


def test_published_form_has_no_plaintext_payload(spark, sf_dir, config):
    from mysql_streamer_spark.cdc.encryption import encrypt_envelope

    published = encrypt_envelope(_envelope(spark, sf_dir), config)
    assert {"pk", "payload_k", "payload_val", "previous_payload_val"}.isdisjoint(
        published.columns
    )
    row = published.filter(F.col("payload_ciphertext").isNotNull()).first()
    assert row.encryption_type == "AES_MODE_CBC-1"
    assert len(row.initialization_vector) == 16
    assert len(row.payload_ciphertext) % 16 == 0 and len(row.payload_ciphertext) > 0
    # ciphertext must not contain the canonical-JSON field markers
    assert b'"pk"' not in row.payload_ciphertext


def test_wrong_key_fails_loudly_not_garbage(spark, sf_dir, config, tmp_path):
    from mysql_streamer_spark.cdc.encryption import (
        EncryptionConfig,
        decrypt_envelope,
        encrypt_envelope,
    )

    (tmp_path / "key-1.key").write_text("a different key entirely")
    wrong = EncryptionConfig("AES_MODE_CBC-1", str(tmp_path))
    published = encrypt_envelope(_envelope(spark, sf_dir), config)
    with pytest.raises(Exception) as ei:
        decrypt_envelope(published, wrong).collect()
    # encrypt-then-MAC: the wrong key fails HMAC verification BEFORE any
    # unpadding runs — an authentication error, not a padding oracle
    assert "authentication failed" in str(ei.value)


def test_tampered_ciphertext_fails_authentication(spark, sf_dir, config):
    """ADVICE r5: unauthenticated CBC is malleable — a flipped bit in a
    non-final block used to decrypt to garbage JSON that from_json nulled
    out silently. With encrypt-then-MAC every bit flip (and truncation)
    must fail loudly at tag verification."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.cdc.encryption import (
        decrypt_envelope,
        encrypt_envelope,
    )

    published = encrypt_envelope(_envelope(spark, sf_dir), config)
    # overwrite the FIRST block (far from the trailing tag bytes)
    flipped = published.withColumn(
        "payload_ciphertext",
        F.concat(F.lit(bytes(16)), F.expr("substring(payload_ciphertext, 17)")),
    )
    with pytest.raises(Exception, match="authentication failed"):
        decrypt_envelope(flipped, config).collect()
    # truncation (tag sheared off) also fails loudly, never unpads
    truncated = published.withColumn(
        "payload_ciphertext", F.expr("substring(payload_ciphertext, 1, 16)")
    )
    with pytest.raises(Exception, match="Invalid ciphertext"):
        decrypt_envelope(truncated, config).collect()


def test_random_iv_mode_roundtrips_and_is_unpredictable(spark, sf_dir, config, tmp_path):
    """iv_mode='random': os.urandom IVs — no two messages share an IV,
    the IV is not the deterministic derivation, and the roundtrip through
    a MATERIALIZED published frame (parquet, as a real publish would) is
    lossless."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.cdc.encryption import (
        _message_iv,
        decrypt_envelope,
        encrypt_envelope,
    )

    env = _envelope(spark, sf_dir).cache()
    published = encrypt_envelope(env, config, iv_mode="random")
    out = str(tmp_path / "published")
    published.write.mode("overwrite").parquet(out)
    landed = spark.read.parquet(out)
    n = landed.count()
    assert landed.select("initialization_vector").distinct().count() == n
    # and none equals the deterministic derivation for its own row
    det = landed.withColumn("det_iv", _message_iv(landed.columns))
    assert det.filter(F.col("initialization_vector") == F.col("det_iv")).count() == 0
    cols = ["txn_order", "pk", "payload_k", "payload_val", "previous_payload_val"]
    orig = {r.txn_order: r for r in env.select(*cols).collect()}
    back = {
        r.txn_order: r for r in decrypt_envelope(landed, config).select(*cols).collect()
    }
    env.unpersist()
    assert orig.keys() == back.keys() and len(orig) > 0
    for k in orig:
        assert orig[k] == back[k]


def test_deterministic_iv_is_scoped_by_cluster(spark):
    """ADVICE r5 (medium): binlog positions repeat across clusters, so two
    clusters sharing a key MUST derive different IVs at the same
    (log_file, log_pos, offset) — otherwise CBC reuses a (key, IV) pair
    on different plaintexts and leaks shared-prefix structure."""
    from mysql_streamer_spark.cdc.encryption import IV_SCOPE_COLUMNS, _message_iv

    assert "cluster_name" in IV_SCOPE_COLUMNS
    rows = [
        ("cluster_a", "db", "t", "binlog.000001", 4, 0),
        ("cluster_b", "db", "t", "binlog.000001", 4, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "cluster_name string, database_name string, table_name string,"
        " log_file string, log_pos long, offset long",
    )
    ivs = [r.iv for r in df.select(_message_iv(df.columns).alias("iv")).collect()]
    assert ivs[0] != ivs[1]


def test_extreme_doubles_survive_the_json_cipher_path(spark, config):
    """The plaintext is canonical JSON, so payload_val must roundtrip
    exactly through to_json -> AES -> from_json for every double shape:
    subnormals, near-overflow, negative zero, long mantissas."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.cdc.encryption import (
        decrypt_envelope,
        encrypt_envelope,
    )

    vals = [
        0.0,
        -0.0,
        5e-324,            # smallest subnormal
        2.2250738585072014e-308,
        1.7976931348623157e308,
        -1.7976931348623157e308,
        0.1,
        1 / 3,
        123456789.123456789,
        -2.718281828459045,
        None,
    ]
    rows = [(i, v) for i, v in enumerate(vals)]
    env = spark.createDataFrame(rows, "pk long, payload_val double").select(
        "pk",
        F.lit(1).alias("payload_k"),
        "payload_val",
        F.lit(None).cast("double").alias("previous_payload_val"),
        F.lit("binlog.000001").alias("log_file"),
        F.col("pk").alias("log_pos"),
        F.lit(0).alias("offset"),
    )
    back = decrypt_envelope(encrypt_envelope(env, config), config)
    got = {r.pk: r.payload_val for r in back.collect()}
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] is None
        else:
            assert got[i] == v and str(got[i]) == str(v), (i, v, got[i])


def test_prev_payload_uses_distinct_iv(spark, sf_dir, config):
    """CBC must never encrypt two plaintexts under one (key, IV): the
    previous-payload ciphertext derives its own IV from the carried one,
    so equal-prefix plaintexts cannot produce equal-prefix ciphertexts."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.cdc.encryption import (
        _aes_cbc_encrypt_udf,
        _message_iv,
        _prev_iv,
        encrypt_envelope,
    )

    # the derived IV differs from the message IV on every row
    env = _envelope(spark, sf_dir)
    same = (
        env.select(_message_iv().alias("iv"))
        .select((F.col("iv") == _prev_iv(F.col("iv"))).alias("eq"))
        .filter("eq")
        .count()
    )
    assert same == 0
    # identical plaintext under the two IVs yields different ciphertext
    enc = _aes_cbc_encrypt_udf(config.load_key())
    pt = F.lit("identical plaintext").cast("binary")
    row = (
        env.limit(1)
        .select(_message_iv().alias("iv"))
        .select(
            enc(pt, F.col("iv")).alias("a"),
            enc(pt, _prev_iv(F.col("iv"))).alias("b"),
        )
        .collect()[0]
    )
    assert row.a != row.b


def test_key_rotation_mixed_stream_decrypts_by_message_key(spark, sf_dir):
    """A stream spanning a key rotation: half the messages encrypted
    under key-1, half under key-2. The ring decrypt restores every row
    with the key its own encryption_type names; a single-key decrypt of
    the mixed stream must fail."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mysql_streamer_spark.cdc.encryption import (
        EncryptionConfig,
        decrypt_envelope,
        decrypt_envelope_with_ring,
        encrypt_envelope,
        load_key_ring,
        resource_key_location,
    )

    loc = resource_key_location()
    ring = load_key_ring(loc)
    assert set(ring) >= {"AES_MODE_CBC-1", "AES_MODE_CBC-2"}

    env = _envelope(spark, sf_dir).cache()
    # txn_order is always even by construction (offset 0, pos a multiple
    # of 4) — split on pk parity for a genuinely mixed stream
    old = env.filter(F.coalesce(F.col("pk"), F.lit(0)) % 2 == 0)
    new = env.filter(F.coalesce(F.col("pk"), F.lit(0)) % 2 == 1)
    mixed = encrypt_envelope(
        old, EncryptionConfig("AES_MODE_CBC-1", loc)
    ).unionByName(encrypt_envelope(new, EncryptionConfig("AES_MODE_CBC-2", loc)))

    restored = decrypt_envelope_with_ring(mixed, loc)
    cols = ["txn_order", "pk", "payload_k", "payload_val", "previous_payload_val"]
    orig = {r.txn_order: r for r in env.select(*cols).collect()}
    back = {r.txn_order: r for r in restored.select(*cols).collect()}
    assert orig.keys() == back.keys() and len(orig) > 0
    for k in orig:
        assert orig[k] == back[k]
    # both key generations actually present in the published stream
    types = {r.encryption_type for r in mixed.select("encryption_type").distinct().collect()}
    assert types == {"AES_MODE_CBC-1", "AES_MODE_CBC-2"}
    # a single-key consumer cannot read across the rotation
    with _pytest.raises(Exception):
        decrypt_envelope(mixed, EncryptionConfig("AES_MODE_CBC-1", loc)).collect()
    env.unpersist()


def test_key_ring_rejects_unknown_encryption_type(spark, sf_dir, config, tmp_path):
    from pyspark.sql import functions as F

    from mysql_streamer_spark.cdc.encryption import (
        decrypt_envelope_with_ring,
        encrypt_envelope,
    )

    published = encrypt_envelope(_envelope(spark, sf_dir), config)
    # a ring that only knows key-9 must refuse AES_MODE_CBC-1 messages
    (tmp_path / "key-9.key").write_text("some other key")
    with pytest.raises(Exception) as ei:
        decrypt_envelope_with_ring(published, str(tmp_path)).collect()
    assert "no key in ring" in str(ei.value)


def test_redaction_then_encryption_compose(spark, sf_dir, config):
    """The reference applies PII policy AND encryption to the same stream
    (the golden test's table is the pii-bearing one): redact first, then
    encrypt the redacted envelope — decrypting must give back exactly the
    redacted rows, with redacted values still suppressed."""
    from mysql_streamer_spark.cdc.encryption import (
        _aes_cbc_decrypt_udf,
        _aes_cbc_encrypt_udf,
        _message_iv,
    )
    from mysql_streamer_spark.queries.cdc import q_cdc_pii_redaction

    redacted = q_cdc_pii_redaction(spark, sf_dir).cache()
    key = config.load_key()
    enc, dec = _aes_cbc_encrypt_udf(key), _aes_cbc_decrypt_udf(key)
    iv = F.unhex(F.md5(F.col("txn_order").cast("string")))
    wire = redacted.select(
        "txn_order",
        "is_redacted",
        iv.alias("iv"),
        enc(
            F.to_json(F.struct("pk_token", "payload_k", "payload_val")).cast(
                "binary"
            ),
            iv,
        ).alias("ct"),
    )
    back = wire.select(
        "txn_order",
        "is_redacted",
        F.from_json(
            dec(F.col("ct"), F.col("iv")).cast("string"),
            "pk_token string, payload_k int, payload_val double",
        ).alias("p"),
    )
    joined = (
        redacted.select("txn_order", "pk_token", "payload_val", "is_redacted")
        .join(
            back.select(
                "txn_order",
                F.col("p.pk_token").alias("rt_pk_token"),
                F.col("p.payload_val").alias("rt_payload_val"),
            ),
            "txn_order",
        )
        .cache()
    )
    assert joined.count() > 0
    assert joined.filter(F.col("pk_token") != F.col("rt_pk_token")).count() == 0
    mismatch = joined.filter(
        ~(
            (F.col("payload_val") == F.col("rt_payload_val"))
            | (F.col("payload_val").isNull() & F.col("rt_payload_val").isNull())
        )
    ).count()
    assert mismatch == 0
    # redacted rows stay redacted through the cipher roundtrip
    leaked = joined.filter(
        F.col("is_redacted") & F.col("rt_payload_val").isNotNull()
    ).count()
    assert leaked == 0
    redacted.unpersist()
    joined.unpersist()
