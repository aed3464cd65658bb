"""Similarity-search tests: quantized cosine accuracy and LSH-ANN recall
against the brute-force baseline."""

from __future__ import annotations

import math

from mysql_streamer_spark.queries.similarity import (
    q_sim_bruteforce_topk,
    q_sim_lsh_ann,
)
from mysql_streamer_spark import vectors as vx


def test_quantized_cosine_close_to_true_cosine(spark, sf_dir):
    from mysql_streamer_spark.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").limit(2).collect()
    a, b = rows[0].embedding, rows[1].embedding
    true_cos = sum(x * y for x, y in zip(a, b)) / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )
    qa = [math.floor(float(x) * vx.SCALE) for x in a]
    qb = [math.floor(float(x) * vx.SCALE) for x in b]
    qcos = sum(x * y for x, y in zip(qa, qb)) / (
        math.sqrt(sum(x * x for x in qa)) * math.sqrt(sum(y * y for y in qb))
    )
    assert abs(true_cos - qcos) < 1e-4


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r.query_id, r.cand_id) for r in q_sim_bruteforce_topk(spark, sf_dir).collect()
    }
    approx = {(r.query_id, r.cand_id) for r in q_sim_lsh_ann(spark, sf_dir).collect()}
    assert approx, "ANN returned nothing"
    recall = len(exact & approx) / len(exact)
    # OR-amplified 4x4 LSH on random unit vectors: recall is modest by
    # design; the point is bounded candidate generation + a sane floor.
    assert recall >= 0.2, f"recall {recall:.2f} suspiciously low"


def test_hyperplanes_deterministic():
    assert vx.HYPERPLANES == [vx._hyperplane(p) for p in range(vx.N_PLANES)]
    assert all(len(h) == vx.DIM and set(h) <= {-1, 1} for h in vx.HYPERPLANES)


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    from mysql_streamer_spark.queries.similarity import q_sim_ivf_ann

    exact = {
        (r.query_id, r.cand_id) for r in q_sim_bruteforce_topk(spark, sf_dir).collect()
    }
    approx = {(r.query_id, r.cand_id) for r in q_sim_ivf_ann(spark, sf_dir).collect()}
    assert approx
    recall = len(exact & approx) / len(exact)
    # nprobe=2 of 10 cells on random unit vectors: a sanity floor, not SLA
    assert recall >= 0.15, f"recall {recall:.2f} suspiciously low"


def test_arrow_bucket_kernel_bit_identical_to_sql(spark, sf_dir):
    """The numpy matmul projection (lsh_id_bucket_table) and the SQL
    higher-order form (lsh_bucket_table) must assign every vector the SAME
    bucket in every hash table — same quantization (float->double widening,
    one multiply, floor) and the same exact int64 dot products."""
    from mysql_streamer_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sql_form = {
        (r.vec_id, r.table_id): r.bucket
        for r in vx.lsh_bucket_table(emb)
        .select("vec_id", "table_id", "bucket")
        .collect()
    }
    arrow_form = {
        (r.vec_id, r.table_id): r.bucket
        for r in vx.lsh_id_bucket_table(emb).collect()
    }
    assert sql_form == arrow_form


def test_kmeans_lloyd_monotone_and_total(spark, sf_dir):
    """Every vector gets exactly one cluster, ids come from the seed set,
    and two Lloyd rounds never increase total within-cluster distance
    versus the seed assignment (Lloyd monotonicity)."""
    from mysql_streamer_spark.queries.similarity import (
        KMEANS_K,
        kmeans_assignments,
        _emb,
    )
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    seed = kmeans_assignments(emb, iters=0)
    two = kmeans_assignments(emb, iters=2)
    n = emb.count()
    assert seed.count() == n and two.count() == n
    assert two.select("cluster_id").distinct().count() <= KMEANS_K
    cost0 = seed.agg(F.sum("dist2")).collect()[0][0]
    cost2 = two.agg(F.sum("dist2")).collect()[0][0]
    assert cost2 <= cost0


def test_mips_reduction_ranks_by_inner_product(spark, sf_dir):
    """The augmented-cosine ranking agrees with the exact-dot ranking up
    to the floor-quantized augmentation component: recall@K >= the pinned
    contract for every query, and a rank-1 exact-dot candidate is never
    pushed out of the augmented top-K."""
    from mysql_streamer_spark.queries.similarity import (
        MIPS_RECALL_MIN,
        q_sim_mips_topk,
    )

    rows = q_sim_mips_topk(spark, sf_dir).collect()
    assert len(rows) == 50  # N_QUERY x TOP_K
    by_q = {}
    for r in rows:
        assert r.recall_ok and r.recall_at_k >= MIPS_RECALL_MIN
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        # the exact top-1 must appear somewhere in the augmented top-K
        top1 = rs[0].exact_cand
        assert top1 in {r.mips_cand for r in rs}, q
        # exact-dot column is consistent: non-increasing down the exact ranks
        dots = [r.exact_dot for r in rs]
        assert dots == sorted(dots, reverse=True)


def test_mmr_greedy_trajectory_properties(spark, sf_dir):
    """MMR invariants that hold by construction: rank-1 is the pure
    cosine top-1 (empty selected set), selections never repeat, the
    marginal score is non-increasing down the trajectory (maxsim only
    grows and the candidate set only shrinks), and maxsim is 0 at rank 1
    and a genuine cosine (in [-1, 1]) afterwards."""
    from mysql_streamer_spark.queries.similarity import (
        MMR_K,
        MMR_LAMBDA,
        q_sim_bruteforce_topk,
        q_sim_mmr_rerank,
    )

    mmr_rows = q_sim_mmr_rerank(spark, sf_dir).collect()
    top1 = {
        r.query_id: r.cand_id
        for r in q_sim_bruteforce_topk(spark, sf_dir).collect()
        if r.rnk == 1
    }
    by_q = {}
    for r in mmr_rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(top1)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.sel_rank)
        assert len(rs) == MMR_K
        assert len({r.cand_id for r in rs}) == MMR_K
        assert rs[0].cand_id == top1[q]
        assert rs[0].maxsim == 0.0
        assert abs(rs[0].score - MMR_LAMBDA * rs[0].rel) < 1e-12
        scores = [r.score for r in rs]
        assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:]))
        for r in rs[1:]:
            assert -1.0 - 1e-12 <= r.maxsim <= 1.0 + 1e-12


def test_ivf_imbalance_audit_is_consistent(spark, sf_dir):
    """List sizes sum to the corpus, shares sum to 1, exactly one largest
    cell unless tied, and the integer balanced verdict agrees with the
    float skew factor it summarizes."""
    from mysql_streamer_spark.queries.similarity import (
        IVF_SKEW_LIMIT,
        q_sim_ivf_imbalance,
    )

    rows = q_sim_ivf_imbalance(spark, sf_dir).collect()
    assert rows
    total = rows[0].total
    assert sum(r.n_vecs for r in rows) == total
    assert all(r.n_cells == len(rows) for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert any(r.is_largest for r in rows)
    for r in rows:
        assert r.balanced == (r.n_vecs * r.n_cells <= IVF_SKEW_LIMIT * total)
        assert abs(r.skew_vs_uniform - r.share * r.n_cells) < 1e-9


def test_random_projection_exact_and_unbiased(spark, sf_dir):
    """The sign matrix is a reproducible public constant; per-pair
    projected distances recompute exactly in Python from it; and the
    P-normalized distortion ratio concentrates around 1 (JL): the sample
    mean over all audited pairs lands well inside the acceptance band."""
    import hashlib
    import math

    from mysql_streamer_spark.queries import similarity as S
    from mysql_streamer_spark import vectors as vx
    from mysql_streamer_spark.tables import load_table

    rows = S.q_sim_random_projection(spark, sf_dir).collect()
    assert len(rows) == S.RP_AUDIT_N * (S.RP_AUDIT_N - 1) // 2

    signs = S._rp_signs()
    assert len(signs) == vx.DIM and len(signs[0]) == S.RP_DIMS
    # reproducibility from the documented seed scheme
    assert signs[0][0] == (
        1 if int(hashlib.md5(b"rp_0_0").hexdigest()[:4], 16) % 2 == 0 else -1
    )

    emb = {
        r.vec_id: [math.floor(float(x) * vx.SCALE) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(f"vec_id < {S.RP_AUDIT_N}")
        .collect()
    }

    def project(q):
        return [
            sum(q[i] * signs[i][j] for i in range(vx.DIM))
            for j in range(S.RP_DIMS)
        ]

    ys = {vid: project(q) for vid, q in emb.items()}
    ratios = []
    for r in rows:
        qa, qb = emb[r.vec_a], emb[r.vec_b]
        assert r.orig_d2 == sum((x - y) ** 2 for x, y in zip(qa, qb))
        assert r.proj_d2 == sum(
            (x - y) ** 2 for x, y in zip(ys[r.vec_a], ys[r.vec_b])
        )
        assert r.distortion_ratio == r.proj_d2 / (S.RP_DIMS * r.orig_d2)
        ratios.append(r.distortion_ratio)
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.8 <= mean_ratio <= 1.2  # unbiasedness, up to sampling noise
