"""Dedup operator tests: LSH pair detection on synthetic near-dups and a
Python-recomputed SimHash golden value."""

from __future__ import annotations

import hashlib

from mysql_streamer_spark.queries.dedup import (
    JACCARD_THRESHOLD,
    SIMHASH_BITS,
    minhash_candidate_pairs,
    lsh_bands,
    BANDS,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_minhash_pairs_finds_near_duplicates_only(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"  # one extra token -> high shingle overlap
    other = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [base, near, other])
    pairs = minhash_candidate_pairs(docs).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in found
    assert all(p == (0, 1) for p in found)
    jac = next(r.jaccard for r in pairs if (r.doc_a, r.doc_b) == (0, 1))
    assert jac >= JACCARD_THRESHOLD
    # base has 8 shingles, near has 9, 8 shared -> jaccard 8/9
    assert abs(jac - 8 / 9) < 1e-12


def test_ngram_jaccard_exact_recall(spark):
    """The inverted-index path finds every qualifying pair (exact recall,
    unlike LSH) and computes the same Jaccard as the set definition."""
    from mysql_streamer_spark.queries.dedup import ngram_jaccard_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"
    other = "one two three four five six seven eight nine ten"
    pairs = ngram_jaccard_pairs(_docs(spark, [base, near, other])).collect()
    found = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert set(found) == {(0, 1)}
    assert abs(found[(0, 1)] - 8 / 9) < 1e-12


def test_ngram_jaccard_df_cap_prunes_common_shingles(spark):
    """A shingle shared by > NGRAM_DF_CAP docs must not generate candidate
    pairs on its own (the mega-posting-list guard)."""
    from mysql_streamer_spark.queries import dedup as dd

    old = dd.NGRAM_DF_CAP
    dd.NGRAM_DF_CAP = 2
    try:
        common = "spam spam spam spam spam"  # identical boilerplate, df=3 > cap
        docs = _docs(spark, [common + " a", common + " b", common + " c"])
        pairs = dd.ngram_jaccard_pairs(docs).collect()
        assert pairs == []
    finally:
        dd.NGRAM_DF_CAP = old


def test_identical_docs_share_every_band(spark):
    docs = _docs(spark, ["a b c d e", "a b c d e"])
    bands = lsh_bands(docs).collect()
    by_doc = {}
    for r in bands:
        by_doc.setdefault(r.doc_id, {})[r.band_id] = r.band_hash
    assert len(by_doc[0]) == BANDS
    assert by_doc[0] == by_doc[1]


def test_simhash_golden_value(spark):
    from mysql_streamer_spark.queries.dedup import q_dedup_simhash  # noqa: F401
    from mysql_streamer_spark import text as tx
    from pyspark.sql import functions as F
    from mysql_streamer_spark.queries import dedup as dd

    text = "foo bar foo"
    docs = _docs(spark, [text])
    out = (
        docs.withColumn("toks", tx.tokens_col())
        .withColumn(
            "hvals",
            F.expr(
                "transform(toks, t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))"
            ),
        )
        .select(F.expr(dd._simhash_expr_spark()).alias("simhash"))
        .collect()[0]
        .simhash
    )

    hvals = [
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in text.split(" ")
    ]
    expected = 0
    for j in range(SIMHASH_BITS):
        votes = sum(1 if (v >> j) & 1 else -1 for v in hvals)
        if votes > 0:
            expected += 1 << j
    assert out == expected


def test_connected_components_min_label(spark):
    from mysql_streamer_spark.queries.dedup import connected_components

    # two chains and an isolated pair: {1-2-3-4}, {10-11}, {20-21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "doc_a long, doc_b long"
    )
    labels = {r.doc_id: r.label for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_lsh_tuning_matches_python_scurve(spark, monkeypatch):
    """The per-layout expected-catch sums recompute exactly in Python
    (same repeated-squaring multiply order, same floor quantization), and
    the S-curve structure holds: for fixed H=16, recall falls and the
    midpoint s* rises as rows-per-band grows; the two verdict branches
    are both live on a mixed pair population."""
    import math

    from mysql_streamer_spark.queries import dedup as D

    sims = [0.05, 0.12, 0.31, 0.45, 0.72, 0.95]
    pairs = spark.createDataFrame(
        [(i, i + 100, s) for i, s in enumerate(sims)],
        "doc_a long, doc_b long, jaccard double",
    )
    monkeypatch.setattr(
        D, "ngram_jaccard_pairs", lambda docs, threshold, dim_hint: pairs
    )
    monkeypatch.setattr(D, "load_table", lambda spark, sf_dir, name: pairs)
    monkeypatch.setattr(D, "_docs_dim_hint", lambda sf_dir: "broadcast")
    rows = {
        (r.n_bands, r.rows_per_band): r
        for r in D.q_dedup_lsh_tuning(spark, "ignored").collect()
    }
    assert set(rows) == set(D.LSH_TUNE_GRID)

    def pow_int(x, n):
        if n == 1:
            return x
        h = pow_int(x, n // 2)
        sq = h * h
        return sq if n % 2 == 0 else sq * x

    for (b, r), row in rows.items():
        caught = sum(
            math.floor((1.0 - pow_int(1.0 - pow_int(s, r), b)) * 1000000.0)
            for s in sims
            if s >= D.JACCARD_THRESHOLD
        )
        false_ = sum(
            math.floor((1.0 - pow_int(1.0 - pow_int(s, r), b)) * 1000000.0)
            for s in sims
            if s < D.JACCARD_THRESHOLD
        )
        assert row.caught_micros == caught
        assert row.false_micros == false_
        assert row.n_pairs == 6 and row.n_dup_pairs == 4
        assert row.s_star == (1.0 / b) ** (1.0 / r)

    # monotone structure across the fixed-H sweep (ordered by r ascending)
    ordered = [rows[(b, r)] for b, r in D.LSH_TUNE_GRID]
    recalls = [r.exp_recall for r in ordered]
    stars = [r.s_star for r in ordered]
    assert recalls == sorted(recalls, reverse=True)
    assert stars == sorted(stars)
    assert ordered[0].verdict == "ok"          # (16,1): catches ~everything
    assert ordered[-1].verdict == "low_recall" # (1,16): needs s ~ 1
    # precision runs the other way: banding tighter trades recall for it
    assert ordered[-1].precision_proxy >= ordered[0].precision_proxy


def test_entity_resolution_decision_paths(spark, sf_dir):
    """Every linkage decision path fires: clean records link at full
    score, single-field corruptions still link, double corruptions fall
    below the threshold (bal+seg corrupted leaves only name at 2.0) and
    are rejected, reversed names fall out of their block
    (blocking-recall loss)."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.queries.dedup import (
        ER_THRESHOLD,
        q_dedup_entity_resolution,
    )
    from mysql_streamer_spark.tables import load_table

    out = q_dedup_entity_resolution(spark, str(sf_dir)).cache()
    self_links = out.filter(F.col("clean_key") == F.col("dirty_key"))
    linked = {r.clean_key for r in self_links.collect()}

    keys = [
        r.c_custkey
        for r in load_table(spark, str(sf_dir), "customer")
        .select("c_custkey")
        .collect()
    ]
    for k in keys:
        if k % 3 == 0:
            assert k not in linked, f"{k}: reversed name must block out"
        elif k % 35 == 0:
            assert k not in linked, f"{k}: double corruption scores 2.0"
        else:
            assert k in linked, f"{k}: should link"
    # scores behave: full agreement 4.5; single corruptions 3.0 / 3.5
    scores = {
        r.clean_key: r.score for r in self_links.collect()
    }
    for k, s in scores.items():
        assert s > ER_THRESHOLD
        if k % 5 == 0:
            assert s == 3.0, (k, s)
        elif k % 7 == 0:
            assert s == 3.5, (k, s)
        else:
            assert s == 4.5, (k, s)
    out.unpersist()


def test_entity_resolution_exact_threshold_boundary(spark):
    """A cross-key pair agreeing on balance + segment but NOT name scores
    exactly ER_THRESHOLD (1.5 + 1.0 = 2.5) and must be REJECTED by the
    strict >; nudging balance agreement up to include name (4.5) links.
    This pins the boundary the registered fixture can't reach (its double
    corruptions land at 2.0)."""
    from mysql_streamer_spark.queries.dedup import (
        ER_BAL_W,
        ER_SEG_W,
        ER_THRESHOLD,
        er_link,
    )

    assert ER_BAL_W + ER_SEG_W == ER_THRESHOLD  # the boundary is reachable
    clean = spark.createDataFrame(
        [(1, 0, "t#01", "Customer#t#01", 10.0, "AUTO")],
        "clean_key int, c_nk int, c_blk string, c_name string, "
        "c_bal double, c_seg string",
    )
    dirty = spark.createDataFrame(
        [
            # same block, bal+seg agree, name differs -> exactly 2.5
            (2, 0, "t#01", "Shopper#t#01", 10.0, "AUTO"),
            # full agreement -> 4.5, links
            (3, 0, "t#01", "Customer#t#01", 10.0, "AUTO"),
        ],
        "dirty_key int, d_nk int, d_blk string, d_name string, "
        "d_bal double, d_seg string",
    )
    rows = {r.dirty_key: r for r in er_link(clean, dirty).collect()}
    assert 2 not in rows, "score exactly AT threshold must be rejected"
    assert rows[3].score == 4.5 and rows[3].name_agree
