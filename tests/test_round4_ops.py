"""Round-4 operators: model-based quality scoring, corpus-prep cascade,
hapax lexical diversity, MinHash estimator accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_model_quality_score_is_deterministic_dot_product(spark):
    """The doc score must equal the sum of per-token weights computed
    independently (the hashing-trick contract), and the gate must follow
    the cross-multiplied threshold exactly."""
    from mysql_streamer_spark import text as tx
    from mysql_streamer_spark.queries.pipeline import (
        MODEL_SCORE_DEN,
        MODEL_SCORE_NUM,
        q_pipeline_model_quality_score,
    )

    rows = q_pipeline_model_quality_score(spark, SF).collect()
    assert rows
    # recompute a handful of docs token-by-token on the driver
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").limit(5).collect()
    }
    weights = (
        spark.createDataFrame(
            [(t,) for text in docs.values() for t in text.split(" ")], "t string"
        )
        .select("t", F.expr(tx.model_weight_expr_spark("t")).alias("w"))
        .collect()
    )
    wmap = {r.t: r.w for r in weights}
    by_id = {r.doc_id: r for r in rows}
    for doc_id, text in docs.items():
        expected = sum(wmap[t] for t in text.split(" "))
        got = by_id[doc_id]
        assert got.score_sum == expected
        assert got.quality_pass == (
            expected * MODEL_SCORE_DEN >= MODEL_SCORE_NUM * got.n_toks
        )


def test_dedup_cascade_counts_are_monotone(spark):
    from mysql_streamer_spark.queries.pipeline import q_pipeline_dedup_cascade

    (r,) = q_pipeline_dedup_cascade(spark, SF).collect()
    assert r.n_raw >= r.n_train >= r.n_exact_kept >= r.n_quality >= r.n_final
    assert r.n_final > 0
    assert abs(r.final_pct - r.n_final * 100 / r.n_raw) < 1e-9


def test_hapax_ratio_bounds(spark):
    from mysql_streamer_spark.queries.textops import q_text_hapax_ratio

    rows = q_text_hapax_ratio(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.vocab_size <= r.total_tokens
        assert abs(r.hapax_share - r.n_hapax / r.vocab_size) < 1e-12


def test_txn_reassembly_contract(spark):
    """Every reassembled transaction: rows >= events (multi-row events),
    commit >= begin, and at most TXN_EVENTS distinct events."""
    from mysql_streamer_spark.queries.cdc import TXN_EVENTS, q_cdc_txn_reassembly

    rows = q_cdc_txn_reassembly(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_events <= TXN_EVENTS
        assert r.n_rows >= r.n_events
        assert r.commit_ts >= r.begin_ts
        assert set(r.change_types.split(",")) <= {"create", "update", "delete", "refresh"}


def test_zorder_layout_boxes_are_tight_grid_cells(spark):
    """Each planned file's Morton range must map to a bounded grid box:
    1024 codes = a 32x32 cell, so no file's bbox may exceed 32 in either
    dimension — the tight-box property that makes the layout prunable."""
    from mysql_streamer_spark.queries.analytics import (
        ZORDER_BITS,
        q_analytics_zorder_layout,
    )

    rows = q_analytics_zorder_layout(spark, SF).collect()
    assert rows
    grid = 2 ** ZORDER_BITS
    for r in rows:
        assert 0 <= r.min_x <= r.max_x < grid
        assert 0 <= r.min_y <= r.max_y < grid
        # 1024 = 2^10 Morton codes -> a 2^5 x 2^5 aligned cell
        assert r.max_x - r.min_x < 32
        assert r.max_y - r.min_y < 32
        assert r.bbox_area == (r.max_x - r.min_x + 1) * (r.max_y - r.min_y + 1)


def test_phash_matches_independent_recompute(spark):
    """The Arrow kernel's aHash must equal a direct Python recompute from
    the raw text bytes for every image doc."""
    from mysql_streamer_spark.multimodal import THUMB_PIXELS, phash_images, with_media_blob

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    got = {
        r.doc_id: r.phash
        for r in phash_images(with_media_blob(docs)).collect()
    }
    for row in docs.collect():
        if row.doc_id % 3 != 0:
            continue
        b = row.text.encode()
        n = len(b)
        thumb = [
            sum(b[i * n // THUMB_PIXELS : (i + 1) * n // THUMB_PIXELS])
            // max(1, (i + 1) * n // THUMB_PIXELS - i * n // THUMB_PIXELS)
            for i in range(THUMB_PIXELS)
        ]
        total = sum(thumb)
        expected = sum(
            1 << i for i, v in enumerate(thumb) if v * THUMB_PIXELS > total
        )
        assert got[row.doc_id] == expected


def test_minhash_estimate_err_in_range(spark):
    """est_matches must be 0..N_HASHES, identical pairs estimate 1.0, and
    abs_err must be |est - exact| exactly."""
    from mysql_streamer_spark.queries.dedup import (
        N_HASHES,
        q_dedup_minhash_estimate,
    )

    rows = q_dedup_minhash_estimate(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.est_matches <= N_HASHES
        assert abs(r.abs_err - abs(r.est_jaccard - r.jaccard)) < 1e-12
        if r.jaccard == 1.0:
            # identical shingle sets -> identical signatures
            assert r.est_matches == N_HASHES
