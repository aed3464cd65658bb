"""Vector/similarity primitives over the ``embeddings`` table
(``embedding: array<float>``, 64-dim, unit-norm).

Numeric discipline — why everything is integer-quantized:

Float summation order is engine-private (DuckDB may vectorize a list_sum,
Spark folds sequentially), so a raw double cosine can differ in the last
ulp between the engine and the oracle and flake a value-hash gate. Instead
every component is quantized once: ``q = floor(double(x) * SCALE)`` —
float->double widening, one IEEE multiply and floor are bit-identical
everywhere — and dot products / norms are then EXACT 64-bit integer sums,
order-independent by construction. The final ``dot / (sqrt(na)*sqrt(nb))``
is a deterministic function of exact integers. Quantization error at
SCALE=1e6 on unit vectors is ~1e-6 per component — far below any ranking
that matters.

LSH design: ``N_TABLES`` independent hash tables, each hashing the sign
pattern of ``PLANES_PER_TABLE`` fixed random hyperplanes (components ±1,
derived deterministically from md5 in Python and inlined as literals — no
per-row hashing). Candidate generation is OR-amplified: a pair meets if it
shares a bucket in ANY table. All bucket work is map-only; candidates meet
in an equi-join on (table_id, bucket) — never an all-pairs product.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIM = 64
SCALE = 1_000_000
N_TABLES = 4
PLANES_PER_TABLE = 4
N_PLANES = N_TABLES * PLANES_PER_TABLE


def _hyperplane(p: int) -> list[int]:
    """±1 components for plane ``p``, deterministic via md5(p:d)."""
    out = []
    for d in range(DIM):
        h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
        out.append(1 if int(h[0], 16) % 2 == 0 else -1)
    return out


HYPERPLANES: list[list[int]] = [_hyperplane(p) for p in range(N_PLANES)]


# ---------------------------------------------------------------------------
# quantization + norms
# ---------------------------------------------------------------------------

def quantized_col(emb: str = "embedding") -> Column:
    return F.expr(
        f"transform({emb}, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    )


def quantized_sql(emb: str = "embedding") -> str:
    return (
        f"list_transform({emb}, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    )


def norm_sq_col(qv: str = "qv") -> Column:
    return F.expr(f"aggregate({qv}, CAST(0 AS BIGINT), (acc, v) -> acc + v * v)")


def norm_sq_sql(qv: str = "qv") -> str:
    return f"CAST(list_sum(list_transform({qv}, v -> v * v)) AS BIGINT)"


def dot_col(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> {a}[i] * {b}[i])) AS BIGINT)"
    )


def cosine_col(a: str, b: str, na: str, nb: str) -> Column:
    return dot_col(a, b).cast("double") / (
        F.sqrt(F.col(na).cast("double")) * F.sqrt(F.col(nb).cast("double"))
    )


def cosine_sql(a: str, b: str, na: str, nb: str) -> str:
    return (
        f"CAST({dot_sql(a, b)} AS DOUBLE) "
        f"/ (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"
    )


# ---------------------------------------------------------------------------
# LSH buckets
# ---------------------------------------------------------------------------

def _plane_literal_spark(p: int) -> str:
    return "array(" + ",".join(str(v) for v in HYPERPLANES[p]) + ")"


def _plane_literal_duck(p: int) -> str:
    return "[" + ",".join(str(v) for v in HYPERPLANES[p]) + "]"


def bucket_col(table: int, qv: str = "qv") -> Column:
    """The 4-bit sign-pattern bucket of hash table ``table`` (map-only)."""
    bits = []
    for j in range(PLANES_PER_TABLE):
        p = table * PLANES_PER_TABLE + j
        dot = (
            f"aggregate(zip_with({qv}, {_plane_literal_spark(p)}, (x, y) -> x * y), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {2**j} ELSE 0 END)")
    return F.expr(" + ".join(bits))


def bucket_sql(table: int, qv: str = "qv") -> str:
    bits = []
    for j in range(PLANES_PER_TABLE):
        p = table * PLANES_PER_TABLE + j
        dot = (
            f"CAST(list_sum(list_transform(generate_series(1, {DIM}), "
            f"i -> {qv}[i] * ({_plane_literal_duck(p)})[i])) AS BIGINT)"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {2**j} ELSE 0 END)")
    return " + ".join(bits)


def with_quantized(df: DataFrame, emb: str = "embedding") -> DataFrame:
    return df.withColumn("qv", quantized_col(emb)).withColumn(
        "nrm", norm_sq_col("qv")
    )


def lsh_bucket_table(df: DataFrame) -> DataFrame:
    """(vec_id, qv, nrm, table_id, bucket) — one row per vector per table."""
    d = with_quantized(df)
    for t in range(N_TABLES):
        d = d.withColumn(f"bucket_{t}", bucket_col(t))
    stack_args = ", ".join(f"{t}, bucket_{t}" for t in range(N_TABLES))
    return d.select(
        "vec_id",
        "qv",
        "nrm",
        F.expr(f"stack({N_TABLES}, {stack_args}) AS (table_id, bucket)"),
    )


def lsh_buckets_sql_cte(source: str = "embeddings") -> str:
    """CTEs ``qe`` (quantized) and ``buckets`` (per-table rows)."""
    selects = " UNION ALL ".join(
        f"SELECT vec_id, qv, nrm, {t} AS table_id, {bucket_sql(t)} AS bucket FROM qe"
        for t in range(N_TABLES)
    )
    return f"""
qe AS (
  SELECT vec_id, {quantized_sql("embedding")} AS qv,
         {norm_sq_sql(quantized_sql("embedding"))} AS nrm
  FROM {source}
), buckets AS ({selects})"""
