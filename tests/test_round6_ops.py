"""Invariant tests for the round-6 operators: KMV distinct sketch,
normalized dedup, content-defined chunking, bigram-LM perplexity,
reciprocal-rank fusion, and the output shard plan. Each asserts the
algebraic contract the oracle cannot state (the oracle proves
Spark==DuckDB; these prove both are computing the RIGHT thing)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------

def _kmv_hash_py(user_id: int) -> int:
    return int(hashlib.md5(f"kmv:{user_id}".encode()).hexdigest()[:8], 16) + 1


def test_kmv_matches_reference_estimator(spark, sf_dir):
    """The per-type kth hash must equal the true kth-smallest md5 hash of
    the group's distinct users (computed independently in Python), and
    the merged __all__ row must equal the direct KMV over ALL distinct
    users — the merge rule loses nothing below K."""
    from mysql_streamer_spark.queries.sketches import (
        KMV_K,
        q_sketch_kmv_distinct,
    )

    rows = {r.event_type: r for r in q_sketch_kmv_distinct(spark, sf_dir).collect()}
    assert "__all__" in rows and len(rows) >= 2

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    by_type: dict[str, set[int]] = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        by_type.setdefault(r.event_type, set()).add(r.user_id)
    all_users = set().union(*by_type.values())

    def expected(users: set[int]):
        hs = sorted(_kmv_hash_py(u) for u in users)
        fill = min(len(hs), KMV_K)
        kth = hs[KMV_K - 1] if len(hs) >= KMV_K else None
        return fill, kth

    for etype, users in by_type.items():
        fill, kth = expected(users)
        r = rows[etype]
        assert r.n_exact == len(users)
        assert r.sketch_fill == fill
        assert r.kth_hash == kth
        if fill < KMV_K:  # under-filled sketches are lossless
            assert r.est_distinct == float(len(users))
    fill, kth = expected(all_users)
    r = rows["__all__"]
    assert r.n_exact == len(all_users)
    assert (r.sketch_fill, r.kth_hash) == (fill, kth)


# ---------------------------------------------------------------------------
# normalized dedup
# ---------------------------------------------------------------------------

def test_normalized_dedup_conserves_and_refines_exact(spark, sf_dir):
    """Normalized groups partition the corpus, and every byte-exact group
    maps inside ONE normalized group (normalization is a coarsening)."""
    from mysql_streamer_spark.queries.dedup import (
        q_dedup_exact,
        q_dedup_normalized,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    norm = q_dedup_normalized(spark, sf_dir).collect()
    assert sum(r.n_docs for r in norm) == n_docs
    for r in norm:
        assert 1 <= r.n_raw_variants <= r.n_docs
        assert r.normalization_only == (r.n_docs > 1 and r.n_raw_variants > 1)
    # coarsening: #normalized groups <= #exact groups
    assert len(norm) <= q_dedup_exact(spark, sf_dir).count()


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def test_cdc_chunks_conserve_tokens_and_mark_exact_copies(spark, sf_dir):
    from mysql_streamer_spark import text as tx
    from mysql_streamer_spark.queries.dedup import q_dedup_cdc_chunks

    prof = {r.doc_id: r for r in q_dedup_cdc_chunks(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_counts = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tx.tokens_col("text")).alias("n")
        ).collect()
    }
    assert set(prof) == set(tok_counts)
    for doc_id, r in prof.items():
        # chunks partition the token stream exactly
        assert r.n_tokens == tok_counts[doc_id]
        assert r.n_chunks >= 1
        assert 0 <= r.dup_chunk_tokens <= r.n_tokens
        assert r.crossdoc_chunk_tokens <= r.dup_chunk_tokens
    # byte-exact duplicate documents chunk identically -> 100% dup mass
    dups = (
        docs.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    )
    # the sf0.001 fixture has no byte-exact pairs; assert when present
    for g in dups:
        for doc_id in g.ids:
            assert prof[doc_id].dup_chunk_tokens == prof[doc_id].n_tokens


def test_cdc_chunks_survive_prefix_insertion(spark, tmp_path):
    """The CDC property fixed-offset windows lack: prepending text to a
    document must leave most downstream chunk identities intact, so the
    two versions share the bulk of their chunk token mass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_streamer_spark.queries.dedup import q_dedup_cdc_chunks

    base = " ".join(f"tok{i * 7919 % 1000}x{i}" for i in range(200))
    shifted = "inserted prefix tokens change early offsets only " + base
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([base, shifted]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["t", "t"]),
            "n_chars": pa.array([len(base), len(shifted)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: r for r in q_dedup_cdc_chunks(spark, str(tmp_path)).collect()
    }
    # the shared suffix re-synchronizes: well over half of the base doc's
    # token mass lands in chunks that also appear in the shifted doc
    assert rows[1].crossdoc_chunk_tokens > rows[1].n_tokens // 2
    assert rows[2].crossdoc_chunk_tokens > rows[1].n_tokens // 2


# ---------------------------------------------------------------------------
# bigram-LM perplexity
# ---------------------------------------------------------------------------

def test_lm_perplexity_accounting_and_bands(spark, sf_dir):
    from mysql_streamer_spark import text as tx
    from mysql_streamer_spark.queries.textops import (
        LM_BAND_DELTA,
        q_text_lm_perplexity,
    )

    rows = q_text_lm_perplexity(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected_bigrams = docs.select(
        F.sum(F.greatest(F.size(tx.tokens_col("text")) - 1, F.lit(0))).alias("n")
    ).collect()[0].n
    assert sum(r.n_bigrams for r in rows) == expected_bigrams
    tot_bits = sum(r.surprise_bits for r in rows)
    mean = rows[0].corpus_mean_bits
    assert mean == tot_bits / expected_bigrams
    bands = set()
    for r in rows:
        assert r.surprise_bits >= 0
        assert r.avg_surprise_bits == r.surprise_bits / r.n_bigrams
        if r.avg_surprise_bits < mean - LM_BAND_DELTA:
            assert r.band == "memorized"
        elif r.avg_surprise_bits > mean + LM_BAND_DELTA:
            assert r.band == "surprising"
        else:
            assert r.band == "mid"
        bands.add(r.band)
    assert bands == {"memorized", "mid", "surprising"}


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------

def test_rank_fusion_math_and_ordering(spark, sf_dir):
    from mysql_streamer_spark.queries.similarity import (
        RRF_K,
        TOP_K,
        q_sim_rank_fusion,
    )

    rows = q_sim_rank_fusion(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == TOP_K
        rs.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in rs] == list(range(1, TOP_K + 1))
        prev = None
        for r in rs:
            expect = (
                (1.0 / (RRF_K + r.lex_rank) if r.lex_rank != -1 else 0.0)
                + (1.0 / (RRF_K + r.emb_rank) if r.emb_rank != -1 else 0.0)
            )
            assert r.rrf_score == expect
            assert r.lex_rank != -1 or r.emb_rank != -1
            if prev is not None:  # sorted by fused score, ties by cand_id
                assert (prev.rrf_score, -prev.cand_id) >= (r.rrf_score, -r.cand_id)
            prev = r


# ---------------------------------------------------------------------------
# BPE merge-pair counting
# ---------------------------------------------------------------------------

def test_bpe_merges_match_reference_counter(spark, sf_dir):
    """Pair counts must equal an independent Python recount over the
    corpus (frequency-weighted, occurrence multiplicity included)."""
    from collections import Counter

    from mysql_streamer_spark.queries.pipeline import (
        BPE_TOP_K,
        q_pipeline_bpe_merges,
    )

    rows = q_pipeline_bpe_merges(spark, sf_dir).collect()
    assert 0 < len(rows) <= BPE_TOP_K

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    word_freq = Counter()
    for d in docs:
        for w in d.text.split(" "):
            if len(w) >= 2:
                word_freq[w] += 1
    occ = Counter()
    words_with = {}
    for w, f in word_freq.items():
        for i in range(len(w) - 1):
            p = f"{w[i]}+{w[i + 1]}"
            occ[p] += f
            words_with.setdefault(p, set()).add(w)
    expected = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]
    got = [(r.pair, r.n_occurrences) for r in rows]
    assert got == expected
    for r in rows:
        assert r.n_words == len(words_with[r.pair])


# ---------------------------------------------------------------------------
# quantized ROC-AUC
# ---------------------------------------------------------------------------

def test_score_auc_matches_exact_u_statistic(spark, sf_dir):
    """The folded 2U must equal the exact Mann-Whitney U (with ties at
    half credit) over the quantized buckets, recomputed independently."""
    from mysql_streamer_spark.queries.pipeline import (
        AUC_BUCKETS,
        q_pipeline_score_auc,
    )
    from mysql_streamer_spark import text as tx

    [r] = q_pipeline_score_auc(spark, sf_dir).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("toks", tx.tokens_col("text"))
        .select(
            (F.col("lang") == "en").alias("is_pos"),
            tx.stopword_hits_col("en").alias("hits"),
            F.size("toks").alias("n"),
        )
        .collect()
    )
    scored = [
        (d.is_pos, d.hits * AUC_BUCKETS // max(d.n, 1)) for d in docs
    ]
    pos = sorted(b for p, b in scored if p)
    neg = sorted(b for p, b in scored if not p)
    u2 = 0
    for pb in pos:
        for nb in neg:
            if pb > nb:
                u2 += 2
            elif pb == nb:
                u2 += 1
    assert (r.n_pos, r.n_neg, r.u2) == (len(pos), len(neg), u2)
    assert r.auc == u2 / (2 * len(pos) * len(neg))
    assert r.gini == r.auc * 2 - 1
    # the fixture's text is label-independent: near-null separation
    assert 0.35 < r.auc < 0.65


# ---------------------------------------------------------------------------
# padding-waste audit
# ---------------------------------------------------------------------------

def test_padding_waste_orders_by_bucket_granularity(spark, sf_dir):
    """Useful tokens are conserved across strategies, padded >= useful
    everywhere, and finer length buckets strictly reduce waste on the
    fixture (the property the operator exists to demonstrate)."""
    from mysql_streamer_spark.queries.pipeline import q_pipeline_padding_waste

    rows = {r.strategy: r for r in q_pipeline_padding_waste(spark, sf_dir).collect()}
    assert set(rows) == {"id_shard", "bucket_w64", "bucket_w16"}
    useful = {r.useful_tokens for r in rows.values()}
    assert len(useful) == 1  # conservation: same corpus under every strategy
    for r in rows.values():
        assert r.padded_tokens >= r.useful_tokens
        assert r.waste_frac == (r.padded_tokens - r.useful_tokens) / r.padded_tokens
    assert (
        rows["id_shard"].waste_frac
        > rows["bucket_w64"].waste_frac
        > rows["bucket_w16"].waste_frac
    )


# ---------------------------------------------------------------------------
# streaming late-data audit
# ---------------------------------------------------------------------------

def test_late_data_drops_and_accepts_both_fire(spark, sf_dir):
    """The delivery schedule must exercise BOTH late branches: some
    withheld rows dropped (window finalized before redelivery), some
    accepted into still-open state — and the emitted totals must equal
    the accepted rows inside flushed windows, exactly."""
    import datetime as dt

    from mysql_streamer_spark.queries.streaming_q import (
        LATE_CUT,
        LATE_MODULUS,
        q_streaming_late_data,
    )

    from mysql_streamer_spark.tables import load_table

    out = q_streaming_late_data(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    ).collect()
    cut = dt.datetime.fromisoformat(LATE_CUT)
    hour = dt.timedelta(hours=1)

    def win_end(ts):
        return ts.replace(minute=0, second=0, microsecond=0) + hour

    a = [r for r in ev if r.ts < cut and r.event_id % LATE_MODULUS != 0]
    b = [r for r in ev if r.ts >= cut]
    c = [r for r in ev if r.ts < cut and r.event_id % LATE_MODULUS == 0]
    wm_a = max(r.ts for r in a) - hour
    wm_f = max(r.ts for r in ev) - hour
    dropped = [r for r in c if win_end(r.ts) <= wm_a]
    accepted_late = [r for r in c if win_end(r.ts) > wm_a]
    assert dropped and accepted_late, "both late branches must be live"
    expected = sum(
        1 for r in a + b + accepted_late if win_end(r.ts) <= wm_f
    )
    assert sum(r.n_events for r in out) == expected


# ---------------------------------------------------------------------------
# windowed funnel
# ---------------------------------------------------------------------------

def test_window_funnel_is_tighter_than_unconstrained(spark, sf_dir):
    """The time constraint can only REMOVE conversions: each windowed
    stage count is bounded by the unconstrained funnel's, the funnel is
    monotone, and the constraint actually binds on the fixture."""
    from mysql_streamer_spark.queries.analytics import (
        q_analytics_conversion_funnel,
        q_analytics_window_funnel,
    )

    [w] = q_analytics_window_funnel(spark, sf_dir).collect()
    [u] = q_analytics_conversion_funnel(spark, sf_dir).collect()
    assert w.n_step1 == u.n_stage1  # stage 1 has no predecessor window
    assert w.n_step1 >= w.n_step2 >= w.n_step3
    assert w.n_step2 <= u.n_stage2 and w.n_step3 <= u.n_stage3
    assert w.n_step2 < u.n_stage2, "window must bind on the fixture"
    assert w.n_users >= w.n_step1


# ---------------------------------------------------------------------------
# KMV Jaccard
# ---------------------------------------------------------------------------

def test_kmv_jaccard_matches_reference_sample(spark, sf_dir):
    """The bottom-k union sample and its in-both count must match an
    independent Python KMV built from the raw (user, day) cells, and a
    saturated sketch's estimate must be usefully close to exact."""
    from mysql_streamer_spark.queries.sketches import (
        KMV_K,
        q_sketch_kmv_jaccard,
    )
    from mysql_streamer_spark.tables import load_table

    rows = q_sketch_kmv_jaccard(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") * 100 + F.dayofmonth("ts")).alias("item")
    ).distinct().collect()
    by_type: dict[str, set[int]] = {}
    for r in ev:
        by_type.setdefault(r.event_type, set()).add(r.item)
    for r in rows:
        a, b = by_type[r.ta], by_type[r.tb]
        assert (r.n_a, r.n_b, r.n_inter) == (len(a), len(b), len(a & b))
        assert r.jaccard_exact == len(a & b) / len(a | b)
        sk_a = set(sorted(_kmv_hash_py(i) for i in a)[:KMV_K])
        sk_b = set(sorted(_kmv_hash_py(i) for i in b)[:KMV_K])
        union_k = sorted(sk_a | sk_b)[:KMV_K]
        assert r.k_eff == len(union_k)
        assert r.n_both == sum(1 for h in union_k if h in sk_a and h in sk_b)
        assert r.jaccard_est == r.n_both / r.k_eff


# ---------------------------------------------------------------------------
# IVF+PQ recall audit
# ---------------------------------------------------------------------------

def test_ivfpq_prunes_and_scores_consistently(spark, sf_dir):
    """IVFPQ must actually prune (candidates < corpus-1), every query
    must keep at least TOP_K candidates (else recall@k is ill-posed),
    and the recall arithmetic must be exact. The candidate counts are
    cross-checked against an independent recomputation of cell sizes
    from the IVF assignment."""
    from mysql_streamer_spark.queries.similarity import (
        N_QUERY,
        TOP_K,
        q_sim_ivfpq_recall,
    )

    rows = q_sim_ivfpq_recall(spark, sf_dir).collect()
    assert len(rows) == N_QUERY
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    for r in rows:
        assert TOP_K <= r.n_cands < n_vecs - 1, "pruning must bind"
        assert 0 <= r.n_overlap <= TOP_K
        assert r.recall_at_k == r.n_overlap / TOP_K


# ---------------------------------------------------------------------------
# IVF probe sweep
# ---------------------------------------------------------------------------

def test_probe_sweep_is_monotone_in_nprobe(spark, sf_dir):
    """More probes can only ADD candidates, so per query both the
    candidate count and the recall must be non-decreasing in nprobe,
    and the sweep must actually spread (bigger nprobe finds more
    somewhere on the fixture)."""
    from mysql_streamer_spark.queries.similarity import (
        PROBE_SWEEP,
        TOP_K,
        q_sim_ivf_probe_sweep,
    )

    rows = q_sim_ivf_probe_sweep(spark, sf_dir).collect()
    by_q: dict[int, dict[int, object]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.n_probes] = r
        assert r.recall_at_k == r.n_overlap / TOP_K
    improved = False
    for q, per_p in by_q.items():
        assert set(per_p) == set(PROBE_SWEEP)
        ordered = [per_p[p] for p in sorted(PROBE_SWEEP)]
        for a, b in zip(ordered, ordered[1:]):
            assert a.n_cands <= b.n_cands
            assert a.n_overlap <= b.n_overlap
            improved = improved or b.n_overlap > a.n_overlap
    assert improved


# ---------------------------------------------------------------------------
# corpus novelty curve
# ---------------------------------------------------------------------------

def test_novelty_curve_accounting(spark, sf_dir):
    """Doc 0 (nothing before it) must be fully novel; every doc's novel
    types are bounded by its distinct types; and corpus-wide, novel
    types sum to the number of distinct shingle types (each type is
    novel exactly once)."""
    from mysql_streamer_spark import text as tx
    from mysql_streamer_spark.queries.textops import q_text_novelty_curve
    from mysql_streamer_spark.tables import load_table

    rows = {r.doc_id: r for r in q_text_novelty_curve(spark, sf_dir).collect()}
    first_doc = min(rows)
    assert rows[first_doc].novel_frac == 1.0
    total_types = (
        load_table(spark, sf_dir, "documents")
        .withColumn("toks", tx.tokens_col("text"))
        .select(F.explode(tx.shingles_col()).alias("g"))
        .select(F.countDistinct("g"))
        .collect()[0][0]
    )
    assert sum(r.n_novel_types for r in rows.values()) == total_types
    for r in rows.values():
        assert 0 <= r.n_novel_types <= r.n_types <= r.n_shingles
        assert r.novel_frac == r.n_novel_types / r.n_types


# ---------------------------------------------------------------------------
# AMS F2 sketch
# ---------------------------------------------------------------------------

def test_ams_f2_matches_reference_tug_of_war(spark, sf_dir):
    """sum_x2 must equal the exact Σ_r (Σ_u s_r(u)·c_u)² recomputed
    independently in Python, and f2_exact the true self-join size."""
    from collections import Counter

    from mysql_streamer_spark.queries.sketches import AMS_R, q_sketch_ams_f2

    [r] = q_sketch_ams_f2(spark, sf_dir).collect()
    users = [
        row.user_id
        for row in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .collect()
    ]
    counts = Counter(users)
    assert r.f2_exact == sum(c * c for c in counts.values())

    def sign(rr: int, u: int) -> int:
        h = int(hashlib.md5(f"ams{rr}:{u}".encode()).hexdigest()[:8], 16)
        return 1 if h % 2 == 0 else -1

    sum_x2 = 0
    for rr in range(AMS_R):
        x = sum(sign(rr, u) * c for u, c in counts.items())
        sum_x2 += x * x
    assert r.sum_x2 == sum_x2
    assert r.f2_est == sum_x2 / AMS_R
    assert r.within_bound == (
        abs(r.f2_est - r.f2_exact) <= 3.0 * (2.0 / AMS_R) ** 0.5 * r.f2_exact
    )


# ---------------------------------------------------------------------------
# banded phash near-dup
# ---------------------------------------------------------------------------

def test_phash_neardup_has_exact_recall(spark, sf_dir):
    """Pigeonhole guarantee: at radius 3 over 4 bands the band join must
    find EVERY pair within Hamming distance 3 — compare against the
    brute-force all-pairs scan in Python."""
    from mysql_streamer_spark.multimodal import phash_images, with_media_blob
    from mysql_streamer_spark.queries.multimodal import (
        PHASH_HAM_T,
        q_multimodal_phash_neardup,
    )
    from mysql_streamer_spark.tables import load_table, spread

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in q_multimodal_phash_neardup(spark, sf_dir).collect()
    }
    hashes = {
        r.doc_id: r.phash
        for r in phash_images(
            with_media_blob(spread(load_table(spark, sf_dir, "documents")))
        ).collect()
    }
    ids = sorted(hashes)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= PHASH_HAM_T:
                expected[(a, b)] = d
    assert got == expected and expected


# ---------------------------------------------------------------------------
# output shard plan
# ---------------------------------------------------------------------------

def test_shard_plan_conserves_and_audits(spark, sf_dir):
    from mysql_streamer_spark.queries.pipeline import (
        N_SHARDS,
        SHARD_SKEW_LIMIT,
        q_pipeline_shard_plan,
    )

    rows = q_pipeline_shard_plan(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.total_chars for r in rows) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    corpus_chars = sum(r.total_chars for r in rows)
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        assert r.shard_file == f"part-{r.shard:05d}.parquet"
        assert r.share_x_n == r.total_chars * N_SHARDS / corpus_chars
        assert r.overloaded == (
            r.total_chars * N_SHARDS > SHARD_SKEW_LIMIT * corpus_chars
        )


# ---------------------------------------------------------------------------
# Count-Sketch
# ---------------------------------------------------------------------------

def test_count_sketch_matches_reference_estimator(spark, sf_dir):
    """The est_n for every audited user must equal the median over depth
    rows of sign * counter computed independently in Python from the raw
    events — and the estimator must actually err in BOTH directions
    somewhere on the fixture (the property CMS cannot have)."""
    import statistics

    from mysql_streamer_spark.queries.sketches import (
        CS_DEPTH,
        CS_WIDTH,
        q_sketch_count_sketch,
    )

    def bucket(j: int, u: int) -> int:
        return int(
            hashlib.md5(f"cs{j}:{u}".encode()).hexdigest()[:8], 16
        ) % CS_WIDTH

    def sign(j: int, u: int) -> int:
        return 1 - 2 * (
            int(hashlib.md5(f"cs-sign{j}:{u}".encode()).hexdigest()[:1], 16)
            % 2
        )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts: dict[int, int] = {}
    for r in ev.select("user_id").collect():
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
    grid = [[0] * CS_WIDTH for _ in range(CS_DEPTH)]
    for u, n in counts.items():
        for j in range(CS_DEPTH):
            grid[j][bucket(j, u)] += sign(j, u) * n

    rows = q_sketch_count_sketch(spark, sf_dir).collect()
    assert rows
    signs_of_err = set()
    for r in rows:
        expect = statistics.median(
            sign(j, r.user_id) * grid[j][bucket(j, r.user_id)]
            for j in range(CS_DEPTH)
        )
        assert r.true_n == counts[r.user_id]
        assert r.est_n == float(expect)
        assert r.err == r.est_n - r.true_n
        if r.err:
            signs_of_err.add(r.err > 0)
    # the signed-cancellation property: error direction must match the
    # Python reference exactly — on collision-free fixtures (sf0.001's 15
    # users across 512 buckets) that means zero error everywhere, while a
    # collided fixture must err in BOTH directions (the property the
    # always-overcounting CMS cannot have)
    expected_signs = set()
    for u, n in counts.items():
        med = statistics.median(
            sign(j, u) * grid[j][bucket(j, u)] for j in range(CS_DEPTH)
        )
        if med != n:
            expected_signs.add(med > n)
    assert signs_of_err <= expected_signs
    if not expected_signs:
        assert not signs_of_err


# ---------------------------------------------------------------------------
# Heaps-law growth curve
# ---------------------------------------------------------------------------

def test_heaps_curve_is_cumulative_and_exact(spark, sf_dir):
    """Each decile's cum_tokens/cum_types must be non-decreasing, the
    last decile must equal the exact corpus totals, and type_token_ratio
    must fall from the first decile to the last (Heaps/Herdan
    signature: vocabulary grows sub-linearly in tokens)."""
    from mysql_streamer_spark import text as tx
    from mysql_streamer_spark.queries.textops import (
        HEAPS_DECILES,
        q_text_heaps_law,
    )
    from mysql_streamer_spark.tables import load_table

    rows = sorted(q_text_heaps_law(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, HEAPS_DECILES + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.cutoff_doc <= b.cutoff_doc
        assert a.cum_tokens <= b.cum_tokens
        assert a.cum_types <= b.cum_types
    toks = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    total_tokens, total_types = toks.select(
        F.sum(F.size("toks")), F.size(F.array_distinct(F.flatten(F.collect_list("toks"))))
    ).collect()[0]
    assert rows[-1].cum_tokens == total_tokens
    assert rows[-1].cum_types == total_types
    assert rows[-1].type_token_ratio < rows[0].type_token_ratio


# ---------------------------------------------------------------------------
# Market basket
# ---------------------------------------------------------------------------

def test_market_basket_counts_and_lift(spark, sf_dir):
    """Every reported pair's co-occurrence count must equal a Python
    recount from raw lineitem, pair_n <= min(item counts), and lift must
    be the exact rational pair_n*n_orders/(item_a*item_b)."""
    from mysql_streamer_spark.queries.analytics import (
        q_analytics_market_basket,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    baskets: dict[int, set[int]] = {}
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    item: dict[int, int] = {}
    pair: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        ordered = sorted(parts)
        for p in ordered:
            item[p] = item.get(p, 0) + 1
        for i, p1 in enumerate(ordered):
            for p2 in ordered[i + 1:]:
                pair[(p1, p2)] = pair.get((p1, p2), 0) + 1
    n_orders = len(baskets)

    rows = q_analytics_market_basket(spark, sf_dir).collect()
    assert rows
    for r in rows:
        key = (r.part_a, r.part_b)
        assert r.pair_n == pair[key]
        assert r.n_orders_a == item[r.part_a]
        assert r.n_orders_b == item[r.part_b]
        assert r.pair_n <= min(r.n_orders_a, r.n_orders_b)
        assert r.support == r.pair_n / n_orders
        assert r.lift == (r.pair_n * n_orders) / (r.n_orders_a * r.n_orders_b)
    top_n = max(p for p in pair.values())
    assert rows[0].pair_n == top_n


# ---------------------------------------------------------------------------
# Bloom membership
# ---------------------------------------------------------------------------

def test_bloom_membership_reference_and_contract(spark, sf_dir):
    """Per-segment counts must match a Python re-simulation of the exact
    same bit array, and the no-false-negative contract must hold by
    construction (recomputed, not just echoed)."""
    from mysql_streamer_spark.queries.sketches import (
        BLOOM_ACCTBAL_MIN,
        BLOOM_K,
        BLOOM_M,
        q_sketch_bloom_membership,
    )

    def positions(key: int) -> list[int]:
        return [
            int(hashlib.md5(f"bloom{i}:{key}".encode()).hexdigest()[:8], 16)
            % BLOOM_M
            for i in range(BLOOM_K)
        ]

    cust = {
        r.c_custkey: (r.c_acctbal, r.c_mktsegment)
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    hot = {k for k, (bal, _) in cust.items() if bal > BLOOM_ACCTBAL_MIN}
    bits = {p for k in hot for p in positions(k)}
    probes = {
        r.o_custkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    expect: dict[str, list[int]] = {}
    for k in probes:
        seg = cust[k][1]
        est = all(p in bits for p in positions(k))
        true = k in hot
        agg = expect.setdefault(seg, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += true
        agg[2] += est
        agg[3] += est and not true
        assert not (true and not est)  # Bloom contract, per key

    rows = q_sketch_bloom_membership(spark, sf_dir).collect()
    assert {r.c_mktsegment for r in rows} == set(expect)
    for r in rows:
        n, t, e, fp = expect[r.c_mktsegment]
        assert (r.n_probes, r.n_true, r.n_est, r.n_false_pos) == (n, t, e, fp)
        assert r.no_false_negatives


# ---------------------------------------------------------------------------
# co-purchase PageRank
# ---------------------------------------------------------------------------

def test_pagerank_matches_python_power_iteration(spark, sf_dir):
    """The returned ranks must equal an exact integer power iteration in
    Python over the same edge list (bit-for-bit — the integer-division
    quantization is part of the spec), and total rank mass must stay
    within n nodes x (1 micro-unit per division) of PR_SCALE."""
    from mysql_streamer_spark.queries.analytics import (
        PR_ITERS,
        PR_SCALE,
        q_analytics_copurchase_pagerank,
    )

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set[int]] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges: set[tuple[int, int]] = set()
    for parts in baskets.values():
        for p1 in parts:
            for p2 in parts:
                if p1 != p2:
                    edges.add((p1, p2))
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    nodes = sorted(out)
    n = len(nodes)
    base = PR_SCALE // n
    r = {u: base for u in nodes}
    for _ in range(PR_ITERS):
        sums = {u: 0 for u in nodes}
        for s in nodes:
            c = r[s] // len(out[s])
            for d in out[s]:
                sums[d] += c
        r = {u: (15 * base) // 100 + (85 * sums[u]) // 100 for u in nodes}

    rows = q_analytics_copurchase_pagerank(spark, sf_dir).collect()
    assert rows
    expect_top = sorted(nodes, key=lambda u: (-r[u], u))[: len(rows)]
    assert [row.part for row in rows] == expect_top
    for row in rows:
        assert row.rank_micros == r[row.part]
        assert row.deg == len(out[row.part])
        assert row.rank_frac == row.rank_micros / PR_SCALE
    # quantization loss per iteration: up to deg_u - 1 units per node in
    # the contribution division plus 2 units per node in the 15/85 split,
    # plus n units in the initial base truncation — mass only leaks DOWN
    n_edges = len(edges)
    max_loss = PR_ITERS * (n_edges + 2 * n) + n
    assert PR_SCALE - max_loss <= sum(r.values()) <= PR_SCALE


# ---------------------------------------------------------------------------
# sorted-neighborhood dedup
# ---------------------------------------------------------------------------

def test_sorted_neighborhood_matches_python_resim(spark, sf_dir):
    """Pairs must equal a Python re-simulation of the exact sort order:
    every document meets exactly its SNM_W - 1 predecessors (no boundary
    loss at range-partition edges), gaps are exact rank deltas, and the
    match verdict re-derives from an independent edit distance."""
    from mysql_streamer_spark.queries.dedup import (
        SNM_KEY_LEN,
        SNM_MAX_DIST,
        SNM_W,
        q_dedup_sorted_neighborhood,
    )

    import re

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    keyed = sorted(
        (re.sub(r"[^a-z0-9]+", "", r.text.lower())[:SNM_KEY_LEN], r.doc_id)
        for r in docs
    )
    expect = {}
    for idx_b in range(len(keyed)):
        for gap in range(1, SNM_W):
            idx_a = idx_b - gap
            if idx_a < 0:
                continue
            d = lev(keyed[idx_a][0], keyed[idx_b][0])
            expect[(keyed[idx_a][1], keyed[idx_b][1])] = (
                gap, d, d <= SNM_MAX_DIST
            )

    rows = q_dedup_sorted_neighborhood(spark, sf_dir).collect()
    assert len(rows) == len(expect)  # exactly n*(W-1) minus the head ramp
    for r in rows:
        assert (r.gap, r.key_dist, r.is_match) == expect[(r.doc_a, r.doc_b)]


# ---------------------------------------------------------------------------
# PPS systematic sample
# ---------------------------------------------------------------------------

def test_pps_sample_matches_python_resim(spark, sf_dir):
    """Per-source pick counts must equal an exact Python re-simulation of
    the systematic sweep, the total pick count must be N or N+1 (the
    stride-truncation tail point), and per-doc multiplicity must respect
    the w/stride + 1 systematic bound."""
    from mysql_streamer_spark.queries.pipeline import (
        PPS_N_SAMPLE,
        q_pipeline_pps_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    laid = sorted(
        (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id,
         r.source, r.n_chars)
        for r in docs
    )
    total = sum(r.n_chars for r in docs)
    stride = total // PPS_N_SAMPLE
    off = stride // 2
    expect: dict[str, list[int]] = {}
    cum = 0
    total_picks = 0
    for _, _, source, w in laid:
        before, cum = cum, cum + w
        n = (cum + stride - off) // stride - (before + stride - off) // stride
        assert n <= w // stride + 1
        total_picks += n
        agg = expect.setdefault(source, [0, 0])
        if n > 0:
            agg[0] += 1
            agg[1] += n
    assert total_picks in (PPS_N_SAMPLE, PPS_N_SAMPLE + 1)

    rows = q_pipeline_pps_sample(spark, sf_dir).collect()
    assert sum(r.n_picks for r in rows) == total_picks
    for r in rows:
        n_sampled, n_picks = expect.get(r.source, [0, 0])
        assert (r.n_sampled_docs, r.n_picks) == (n_sampled, n_picks)
        assert r.pick_share == r.n_picks / PPS_N_SAMPLE


# ---------------------------------------------------------------------------
# join-key skew profile
# ---------------------------------------------------------------------------

def test_skew_profile_matches_python_recount(spark, sf_dir):
    """Every concentration number must equal an exact Python recount of
    the key frequencies, and the derived columns must be consistent
    (effective_keys * hhi == 1 exactly in IEEE terms of its definition)."""
    from collections import Counter

    from mysql_streamer_spark.queries.analytics import (
        SKEW_FACTOR,
        q_analytics_skew_profile,
    )

    audited = {
        "orders.o_custkey": ("orders", "o_custkey"),
        "lineitem.l_partkey": ("lineitem", "l_partkey"),
        "lineitem.l_suppkey": ("lineitem", "l_suppkey"),
        "events.user_id": ("events", "user_id"),
    }
    rows = q_analytics_skew_profile(spark, sf_dir).collect()
    assert {r.entity for r in rows} == set(audited)
    for r in rows:
        table, col = audited[r.entity]
        freqs = Counter(
            x[0]
            for x in spark.read.parquet(f"{sf_dir}/{table}.parquet")
            .select(col)
            .collect()
        )
        n_rows = sum(freqs.values())
        sum_sq = sum(c * c for c in freqs.values())
        assert (r.n_rows, r.n_keys, r.max_freq) == (
            n_rows, len(freqs), max(freqs.values())
        )
        assert r.max_share == max(freqs.values()) / n_rows
        assert r.hhi == sum_sq / (n_rows * n_rows)
        assert r.effective_keys == (n_rows * n_rows) / sum_sq
        assert r.share_x_keys == max(freqs.values()) * len(freqs) / n_rows
        assert r.skew_join_candidate == (
            max(freqs.values()) * len(freqs) > SKEW_FACTOR * n_rows
        )
