"""AES-CBC payload encryption for the published envelope.

The reference's integration suite exercises encrypted publish with
``encryption_type='AES_MODE_CBC-1'`` and a key directory holding
``key-{id}.key`` files (tests/integration/end_to_end_test.py:551-600,
acceptance/configs/data_pipeline/key-1.key); the cipher itself lives in
the proprietary clientlib, so only the behavioral contract is public:

- ``encryption_type`` names algorithm+mode and a numeric key id;
- the payload (and previous payload) travel encrypted, while the
  envelope's routing/position fields stay plaintext;
- consumers holding the same key decrypt transparently and see the exact
  original payload — the golden test's ``_verify_messages`` compares
  decrypted ``payload_data`` by value.

This module implements that contract Spark-first:

- key material: ``key-{id}.key`` contents, run through SHA-256 to derive
  the 32-byte AES-256 key (a published KDF step, since the public key
  file is an arbitrary text blob, not a raw 32-byte key);
- per-message IV: the CBC initialization vector is carried next to the
  ciphertext (the standard CBC contract). Two modes:
  ``iv_mode="random"`` (the production default posture: 16 bytes of
  ``os.urandom`` per message, unpredictable, generated executor-side in
  the same Arrow batch pass) and ``iv_mode="deterministic"`` (opt-in,
  used by the test oracle so the roundtrip is reproducible): the IV is
  ``md5`` over the FULL message identity — cluster_name, database_name,
  table_name, log_file, log_pos, offset — computed JVM-side. The scope
  columns matter: binlog positions are only unique within one cluster
  (every MySQL server has a binlog.000001), so an IV keyed on position
  alone would reuse (key, IV) pairs across clusters sharing a key,
  leaking shared-prefix structure under CBC. Deterministic IVs remain
  predictable by design — that is why they are the opt-in, not the
  default;
- integrity: encrypt-then-MAC. Every ciphertext carries a trailing
  HMAC-SHA256 tag over (IV || ciphertext) under a MAC key derived from
  the encryption key; decrypt verifies the tag (constant-time compare)
  BEFORE touching the padding, so bit-flipped ciphertexts and truncations
  fail loudly as authentication errors rather than decrypting to garbage
  JSON or exposing a padding oracle;
- the serialized plaintext is the canonical JSON of the payload struct
  (``to_json``, JVM-side), padded with PKCS#7;
- the cipher itself runs in a VECTORIZED pandas UDF over (payload, iv)
  binary columns — Arrow batch transfer, one Python call per batch, the
  same justified Python path as the Avro kernel. Map-only: no shuffle,
  no collect, embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

import functools
import hashlib
import re
from dataclasses import dataclass
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENCRYPTION_TYPE_RE = re.compile(r"^(?P<algo>[A-Za-z0-9_]+)-(?P<key_id>\d+)$")

#: payload fields that travel encrypted (everything the reference's
#: payload_data/previous_payload_data carry in this engine's envelope)
PAYLOAD_FIELDS = ("pk", "payload_k", "payload_val")
PREVIOUS_PAYLOAD_FIELDS = ("payload_k", "previous_payload_val")


@dataclass(frozen=True)
class EncryptionConfig:
    """The reference's (encryption_type, key_location) pair."""

    encryption_type: str
    key_location: str

    @property
    def algorithm(self) -> str:
        return _parse(self.encryption_type)[0]

    @property
    def key_id(self) -> int:
        return _parse(self.encryption_type)[1]

    def load_key(self) -> bytes:
        """key-{id}.key contents -> 32-byte AES-256 key via SHA-256."""
        raw = (Path(self.key_location) / f"key-{self.key_id}.key").read_bytes()
        return hashlib.sha256(raw).digest()


def resource_key_location() -> str:
    """The repo's committed synthetic key directory (mirrors the
    reference's acceptance/configs/data_pipeline/ fixture layout)."""
    return str(Path(__file__).resolve().parents[1] / "resources" / "keys")


def _parse(encryption_type: str) -> tuple[str, int]:
    m = _ENCRYPTION_TYPE_RE.match(encryption_type)
    if not m:
        raise ValueError(
            f"encryption_type {encryption_type!r} is not ALGO-KEYID "
            "(e.g. 'AES_MODE_CBC-1')"
        )
    algo = m.group("algo")
    if algo != "AES_MODE_CBC":
        raise ValueError(f"unsupported encryption algorithm {algo!r}")
    return algo, int(m.group("key_id"))


_MAC_TAG_BYTES = 32  # HMAC-SHA256
_MAC_KEY_INFO = b"::mss-hmac-sha256-v1"


@functools.lru_cache(maxsize=64)
def _mac_key(key: bytes) -> bytes:
    """MAC key derived from (never equal to) the encryption key, so a
    cipher break cannot be parlayed into forgeries and vice versa.
    Cached: _seal/_open call this per ROW inside the cipher UDFs, and a
    key ring holds a handful of keys — one sha256 per key per worker,
    not one per message."""
    return hashlib.sha256(key + _MAC_KEY_INFO).digest()


def _cbc(key: bytes, data: bytes, iv: bytes, encrypt: bool) -> bytes:
    """One raw AES-CBC+PKCS#7 operation — the single cipher kernel the
    seal/open pair wraps (so a padding/mode change happens in exactly one
    place). The imports stay function-local-but-cached (sys.modules) so
    the module imports cleanly where cryptography is absent; only actually
    using the cipher requires it."""
    from cryptography.hazmat.primitives import padding
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    cipher = Cipher(algorithms.AES(key), modes.CBC(bytes(iv)))
    if encrypt:
        padder = padding.PKCS7(128).padder()
        padded = padder.update(bytes(data)) + padder.finalize()
        c = cipher.encryptor()
        return c.update(padded) + c.finalize()
    c = cipher.decryptor()
    padded = c.update(bytes(data)) + c.finalize()
    unpadder = padding.PKCS7(128).unpadder()
    return unpadder.update(padded) + unpadder.finalize()


def _seal(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Encrypt-then-MAC: AES-CBC ciphertext || HMAC-SHA256(IV || ct)."""
    import hmac as _hmac

    ct = _cbc(key, data, iv, encrypt=True)
    tag = _hmac.new(_mac_key(key), bytes(iv) + ct, hashlib.sha256).digest()
    return ct + tag


def _open(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Verify the trailing HMAC tag (constant-time) BEFORE unpadding —
    a flipped bit or truncation fails here as an authentication error,
    never as a padding oracle or silent garbage JSON."""
    import hmac as _hmac

    data = bytes(data)
    if len(data) < _MAC_TAG_BYTES + 16:
        raise ValueError(
            "Invalid ciphertext: shorter than one AES block plus the "
            "HMAC-SHA256 tag — truncated or not sealed by this module"
        )
    ct, tag = data[:-_MAC_TAG_BYTES], data[-_MAC_TAG_BYTES:]
    want = _hmac.new(_mac_key(key), bytes(iv) + ct, hashlib.sha256).digest()
    if not _hmac.compare_digest(tag, want):
        raise ValueError(
            "Invalid ciphertext: HMAC authentication failed "
            "(tampered message or wrong key)"
        )
    return _cbc(key, ct, iv, encrypt=False)


def _aes_cbc_encrypt_udf(key: bytes):
    @F.pandas_udf("binary")
    def enc(data: pd.Series, iv: pd.Series) -> pd.Series:
        return pd.Series(
            None if d is None else _seal(key, d, v) for d, v in zip(data, iv)
        )

    return enc


def _aes_cbc_decrypt_udf(key: bytes):
    @F.pandas_udf("binary")
    def dec(data: pd.Series, iv: pd.Series) -> pd.Series:
        return pd.Series(
            None if d is None else _open(key, d, v) for d, v in zip(data, iv)
        )

    return dec


def _aes_cbc_keyring_udf(key_ring: dict[str, bytes], encrypt: bool):
    """Cipher with the key EACH MESSAGE names in its encryption_type —
    the key-rotation contract the reference's ``key-{id}.key`` directory
    layout implies: a consumer holds every historical key and a mixed
    stream (messages written before and after a rotation) decrypts
    transparently. An encryption_type not in the ring fails loudly."""

    @F.pandas_udf("binary")
    def run(data: pd.Series, iv: pd.Series, etype: pd.Series) -> pd.Series:
        out = []
        for d, v, t in zip(data, iv, etype):
            if d is None:
                out.append(None)
                continue
            key = key_ring.get(t)
            if key is None:
                raise ValueError(f"no key in ring for encryption_type {t!r}")
            out.append(_seal(key, d, v) if encrypt else _open(key, d, v))
        return pd.Series(out)

    return run


def _aes_cbc_keyring_decrypt_udf(key_ring: dict[str, bytes]):
    return _aes_cbc_keyring_udf(key_ring, encrypt=False)


#: every column that scopes a message's identity. cluster_name is
#: load-bearing: binlog positions repeat across clusters (every server
#: has a binlog.000001), so two clusters sharing a key MUST NOT derive
#: the same IV for different plaintexts; database/table further scope
#: multi-source topologies that reuse position counters.
IV_SCOPE_COLUMNS = (
    "cluster_name",
    "database_name",
    "table_name",
    "log_file",
    "log_pos",
    "offset",
)


def _message_iv(columns: "list[str] | None" = None) -> "F.Column":
    """Deterministic 16-byte per-message IV from the FULL message identity
    (cluster + database + table + binlog position — unique per message
    across a shared-key fleet by construction), computed JVM-side.
    ``columns`` narrows the scope to the columns a synthetic frame
    actually has (tests); real envelopes always carry all six."""
    cols = (
        IV_SCOPE_COLUMNS
        if columns is None
        else tuple(c for c in IV_SCOPE_COLUMNS if c in columns)
    )
    return F.unhex(
        F.md5(
            F.concat_ws(
                ":",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                    for c in cols
                ],
            )
        )
    )


def _random_iv_udf():
    """16 bytes of os.urandom per message — unpredictable, the default
    CBC posture for production. Marked nondeterministic so Catalyst never
    collapses or re-derives it; a published frame must be materialized
    (written to its sink) before consumption, which is the publish
    contract anyway."""

    @F.pandas_udf("binary")
    def riv(anchor: pd.Series) -> pd.Series:
        import os as _os

        return pd.Series(_os.urandom(16) for _ in range(len(anchor)))

    return riv.asNondeterministic()


def _prev_iv(iv: "F.Column") -> "F.Column":
    """Distinct IV for the previous-payload ciphertext, derived from the
    carried message IV (md5 of its hex) so BOTH sides compute it without
    a second wire field. A (key, IV) pair must never encrypt two
    different plaintexts under CBC — same-IV pairs leak shared-prefix
    structure — so the two ciphertexts in one message use distinct IVs."""
    return F.unhex(F.md5(F.hex(iv)))


def encrypt_envelope(
    env: DataFrame, config: EncryptionConfig, iv_mode: str = "deterministic"
) -> DataFrame:
    """Envelope -> published form with encrypted payloads.

    Replaces the plaintext payload columns with ``payload_ciphertext`` /
    ``previous_payload_ciphertext`` (AES-CBC + HMAC over the
    canonical-JSON serialization) plus the ``encryption_type`` and
    ``initialization_vector`` the consumer needs. Routing and position
    columns stay plaintext, as in the reference (partition routing must
    work without the key).

    ``iv_mode``: "deterministic" derives the IV from the full message
    identity (IV_SCOPE_COLUMNS — reproducible, used by the test oracle);
    "random" draws os.urandom per message (unpredictable — prefer it in
    production; requires the published frame to be materialized before
    consumption, which publishing does by definition)."""
    return _encrypt_with_ring(
        env,
        {config.encryption_type: config.load_key()},
        F.lit(config.encryption_type),
        iv_mode=iv_mode,
    )


def encrypt_envelope_with_ring(
    env: DataFrame,
    key_location: str,
    encryption_type_col: "F.Column",
    iv_mode: str = "deterministic",
) -> DataFrame:
    """Encrypt each row under the key generation a per-row COLUMN names
    (e.g. a rollout where new rows take the rotated key while a backfill
    still writes the old one) — one pipeline, one pass, no per-key
    branch-and-union."""
    return _encrypt_with_ring(
        env, load_key_ring(key_location), encryption_type_col, iv_mode=iv_mode
    )


def _encrypt_with_ring(
    env: DataFrame,
    ring: dict[str, bytes],
    etype_col: "F.Column",
    iv_mode: str = "deterministic",
) -> DataFrame:
    enc = _aes_cbc_keyring_udf(ring, encrypt=True)
    if iv_mode == "deterministic":
        iv = _message_iv(env.columns)
    elif iv_mode == "random":
        iv = _random_iv_udf()(F.lit(1))
    else:
        raise ValueError(f"iv_mode must be 'deterministic' or 'random', got {iv_mode!r}")
    payload_json = F.to_json(F.struct(*[F.col(c) for c in PAYLOAD_FIELDS]))
    # previous payload exists only for updates — NULL rides through as NULL
    prev_json = F.when(
        F.col("previous_payload_val").isNotNull(),
        F.to_json(F.struct(*[F.col(c) for c in PREVIOUS_PAYLOAD_FIELDS])),
    )
    return (
        env.withColumn("encryption_type", etype_col)
        .withColumn("initialization_vector", iv)
        .withColumn(
            "payload_ciphertext",
            enc(
                payload_json.cast("binary"),
                F.col("initialization_vector"),
                F.col("encryption_type"),
            ),
        )
        .withColumn(
            "previous_payload_ciphertext",
            enc(
                prev_json.cast("binary"),
                _prev_iv(F.col("initialization_vector")),
                F.col("encryption_type"),
            ),
        )
        .drop("pk", "payload_k", "payload_val", "previous_payload_val")
    )


def load_key_ring(key_location: str) -> dict[str, bytes]:
    """Every ``key-{id}.key`` under key_location -> {encryption_type: key}.
    The ring is what a long-lived consumer holds across key rotations."""
    ring: dict[str, bytes] = {}
    for path in sorted(Path(key_location).glob("key-*.key")):
        m = re.match(r"key-(\d+)\.key$", path.name)
        if not m:
            continue
        ring[f"AES_MODE_CBC-{m.group(1)}"] = hashlib.sha256(
            path.read_bytes()
        ).digest()
    if not ring:
        raise ValueError(f"no key-*.key files under {key_location!r}")
    return ring


def decrypt_envelope_with_ring(published: DataFrame, key_location: str) -> DataFrame:
    """Key-rotation-aware decrypt: each message is decrypted with the key
    its own ``encryption_type`` column names, so a stream spanning a key
    rotation (old messages under key N, new under key N+1) restores
    transparently. Same vectorized map-only shape as decrypt_envelope."""
    return _decrypt_with_ring(published, load_key_ring(key_location))


def _decrypt_with_ring(published: DataFrame, ring: dict[str, bytes]) -> DataFrame:
    dec = _aes_cbc_keyring_decrypt_udf(ring)
    payload = dec(
        F.col("payload_ciphertext"),
        F.col("initialization_vector"),
        F.col("encryption_type"),
    ).cast("string")
    prev = dec(
        F.col("previous_payload_ciphertext"),
        _prev_iv(F.col("initialization_vector")),
        F.col("encryption_type"),
    ).cast("string")
    return _restore_payload_columns(published, payload, prev)


def decrypt_envelope(published: DataFrame, config: EncryptionConfig) -> DataFrame:
    """Inverse of encrypt_envelope: the consumer-side transparent decrypt
    — the single-key special case of the ring (a one-entry ring holding
    the configured key). A mismatched key or a tampered/truncated
    ciphertext surfaces as an HMAC authentication error BEFORE any
    unpadding runs, a message naming a DIFFERENT encryption_type than
    the config's as a no-key-in-ring error — never silent garbage, and
    no padding-oracle surface."""
    return _decrypt_with_ring(
        published, {config.encryption_type: config.load_key()}
    )


def _restore_payload_columns(published: DataFrame, payload, prev) -> DataFrame:
    payload_schema = "pk long, payload_k int, payload_val double"
    prev_schema = "payload_k int, previous_payload_val double"
    return (
        published.withColumn("__p", F.from_json(payload, payload_schema))
        .withColumn("__q", F.from_json(prev, prev_schema))
        .withColumn("pk", F.col("__p.pk"))
        .withColumn("payload_k", F.col("__p.payload_k"))
        .withColumn("payload_val", F.col("__p.payload_val"))
        .withColumn("previous_payload_val", F.col("__q.previous_payload_val"))
        .drop(
            "__p",
            "__q",
            "payload_ciphertext",
            "previous_payload_ciphertext",
            "encryption_type",
            "initialization_vector",
        )
    )
