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
#: 8 tables x 8 planes: 256 buckets per table keeps bucket size ~n/256 (4
#: planes gave 16 buckets — bucket population grows as n/16, so candidate
#: pairs grow ~n^2/32 and at large n EVERY bucket trips the mega-bucket
#: guard, collapsing recall). For the 0.9-cosine near-dup threshold,
#: P[share a bucket in >=1 of 8 tables] = 1-(1-(1-acos(.9)/pi)^8)^8 ~ 0.94
#: — same recall as the old 4x4 layout at ~8x fewer candidate pairs.
N_TABLES = 8
PLANES_PER_TABLE = 8
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

def _planes_2d_spark() -> str:
    rows = ",".join(
        "array(" + ",".join(str(v) for v in plane) + ")" for plane in HYPERPLANES
    )
    return f"array({rows})"


def _planes_2d_duck() -> str:
    rows = ",".join(
        "[" + ",".join(str(v) for v in plane) + "]" for plane in HYPERPLANES
    )
    return f"[{rows}]"


def plane_dots_col(qv: str = "qv") -> Column:
    """All N_PLANES hyperplane dot products in ONE nested higher-order
    expression over the constant plane matrix (Catalyst constant-folds the
    2D literal). One compiled lambda instead of N_PLANES unrolled folds —
    unrolling made whole-stage codegen compile time the dominant cost of
    every LSH query, ~seconds per plan."""
    return F.expr(
        f"transform({_planes_2d_spark()}, p -> "
        f"aggregate(zip_with({qv}, p, (x, y) -> x * CAST(y AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v))"
    )


def bucket_from_dots_col(table: int, dots: str = "dots") -> Column:
    """Sign-pattern bucket of hash table ``table`` from the dots array
    (element_at is 1-based)."""
    bits = [
        f"(CASE WHEN element_at({dots}, {table * PLANES_PER_TABLE + j + 1}) >= 0 "
        f"THEN {2**j} ELSE 0 END)"
        for j in range(PLANES_PER_TABLE)
    ]
    return F.expr(" + ".join(bits))


def plane_dots_sql(qv: str = "qv") -> str:
    return (
        f"list_transform({_planes_2d_duck()}, p -> "
        f"CAST(list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> {qv}[i] * p[i])) AS BIGINT))"
    )


def bucket_from_dots_sql(table: int, dots: str = "dots") -> str:
    bits = [
        f"(CASE WHEN {dots}[{table * PLANES_PER_TABLE + j + 1}] >= 0 "
        f"THEN {2**j} ELSE 0 END)"
        for j in range(PLANES_PER_TABLE)
    ]
    return " + ".join(bits)


def with_quantized(df: DataFrame, emb: str = "embedding") -> DataFrame:
    return df.withColumn("qv", quantized_col(emb)).withColumn(
        "nrm", norm_sq_col("qv")
    )


def lsh_bucket_table(df: DataFrame) -> DataFrame:
    """(vec_id, qv, nrm, table_id, bucket) — one row per vector per table.
    All plane dots compute once into ``dots``; each table's bucket is a
    4-expression bit pack over that array."""
    d = with_quantized(df).withColumn("dots", plane_dots_col())
    for t in range(N_TABLES):
        d = d.withColumn(f"bucket_{t}", bucket_from_dots_col(t))
    stack_args = ", ".join(f"{t}, bucket_{t}" for t in range(N_TABLES))
    return d.select(
        "vec_id",
        "qv",
        "nrm",
        F.expr(f"stack({N_TABLES}, {stack_args}) AS (table_id, bucket)"),
    )


def lsh_id_bucket_table(df: DataFrame) -> DataFrame:
    """(vec_id, table_id, bucket) via an Arrow-batched numpy kernel.

    Bit-identical to the SQL form (proven by tests/test_similarity.py):
    float32 -> float64 widening, one IEEE multiply and floor, then exact
    int64 matmul against the same ±1 plane matrix. The matmul is the right
    production kernel — the SQL higher-order fold pays ~1 lambda call per
    (plane, dim) element, which at DIM*N_PLANES=4096 element-ops per vector
    dominates the whole LSH family; BLAS does the block in vectorized
    native code. Map-only: each Arrow batch yields its id->bucket rows,
    nothing widens, nothing shuffles here.
    """
    import numpy as np
    import pandas as pd

    planes_t = np.array(HYPERPLANES, dtype=np.int64).T  # (DIM, N_PLANES)
    weights = 2 ** np.arange(PLANES_PER_TABLE, dtype=np.int64)

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qv = np.floor(emb * SCALE).astype(np.int64)
            signs = (qv @ planes_t) >= 0  # (n, N_PLANES)
            frames = []
            for t in range(N_TABLES):
                bits = signs[:, t * PLANES_PER_TABLE : (t + 1) * PLANES_PER_TABLE]
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "table_id": np.int32(t),
                            "bucket": (bits * weights).sum(axis=1).astype(np.int32),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return df.select("vec_id", "embedding").mapInPandas(
        project, "vec_id long, table_id int, bucket int"
    )


def lsh_buckets_sql_cte(source: str = "embeddings") -> str:
    """CTEs ``qe`` (quantized), ``qd`` (+plane dots) and ``buckets``."""
    selects = " UNION ALL ".join(
        f"SELECT vec_id, qv, nrm, {t} AS table_id, "
        f"{bucket_from_dots_sql(t)} AS bucket FROM qd"
        for t in range(N_TABLES)
    )
    return f"""
qe AS (
  SELECT vec_id, {quantized_sql("embedding")} AS qv,
         {norm_sq_sql(quantized_sql("embedding"))} AS nrm
  FROM {source}
), qd AS (
  SELECT vec_id, qv, nrm, {plane_dots_sql("qv")} AS dots FROM qe
), buckets AS ({selects})"""
