"""Invariant tests for the CDC history/compaction operators and the
chunking/funnel additions — crafted inputs with hand-computed expecteds."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_streamer_spark.queries import pipeline as pl


def test_scd2_intervals_chain_and_close(spark, sf_dir):
    from mysql_streamer_spark.queries.cdc import q_cdc_scd2_history

    hist = q_cdc_scd2_history(spark, sf_dir)
    # per key: exactly one open (current) version, intervals chain
    # valid_to == next valid_from, version numbers dense from 1
    bad_open = (
        hist.groupBy("database_name", "table_name", "pk")
        .agg(
            F.sum(F.col("is_current").cast("long")).alias("n_open"),
            F.count("*").alias("n_versions"),
            F.max("version_no").alias("max_ver"),
        )
        .filter((F.col("n_open") != 1) | (F.col("max_ver") != F.col("n_versions")))
        .count()
    )
    assert bad_open == 0
    # interval chaining: every non-current row's valid_to equals the next
    # version's valid_from (lead over the same ordering) by construction;
    # verify on a sample key with >= 3 versions
    k = (
        hist.groupBy("database_name", "table_name", "pk")
        .count()
        .filter(F.col("count") >= 3)
        .first()
    )
    rows = (
        hist.filter(
            (F.col("database_name") == k["database_name"])
            & (F.col("table_name") == k["table_name"])
            & (F.col("pk") == k["pk"])
        )
        .orderBy("version_no")
        .collect()
    )
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.valid_to_txn == nxt.valid_from_txn


def test_compacted_table_counts_match_latest_state(spark, sf_dir):
    from mysql_streamer_spark.queries.cdc import q_cdc_compacted_table
    from mysql_streamer_spark.queries.cdc import q_cdc_latest_state

    comp = q_cdc_compacted_table(spark, sf_dir)
    latest = q_cdc_latest_state(spark, sf_dir)
    total_comp = comp.agg(
        F.sum(F.col("n_live_keys") + F.col("n_tombstoned_keys"))
    ).collect()[0][0]
    assert total_comp == latest.count()
    tomb = latest.filter(F.col("message_type") == "delete").count()
    assert comp.agg(F.sum("n_tombstoned_keys")).collect()[0][0] == tomb


def test_chunking_covers_every_token_and_overlaps(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = pl.load_table
    pl.load_table = lambda spark, sf, name: docs
    try:
        rows = sorted(
            pl.q_pipeline_chunk_documents(spark, "unused").collect(),
            key=lambda r: r.chunk_idx,
        )
    finally:
        pl.load_table = orig
    # 100 tokens, stride 48 -> starts 1, 49, 97
    assert [r.start_tok for r in rows] == [1, 49, 97]
    assert [r.n_chunk_toks for r in rows] == [64, 52, 4]
    # consecutive chunks overlap by width - stride where full-width
    assert rows[0].start_tok + pl.CHUNK_TOKENS > rows[1].start_tok


def test_funnel_counts_ordered_sequences_only(spark):
    from mysql_streamer_spark.queries import analytics as an

    rows = [
        # user 1: proper view -> click -> purchase
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:05:00", 1, "click"),
        (3, "2024-01-01 10:10:00", 1, "purchase"),
        # user 2: purchase BEFORE any view/click -> stops at stage 1
        (4, "2024-01-01 09:00:00", 2, "purchase"),
        (5, "2024-01-01 10:00:00", 2, "view"),
        # user 3: view then purchase, no click -> stage 1 only
        (6, "2024-01-01 10:00:00", 3, "view"),
        (7, "2024-01-01 11:00:00", 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for (i, ts, u, t) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    orig = an.load_table
    an.load_table = lambda spark, sf, name: ev
    try:
        out = an.q_analytics_conversion_funnel(spark, "unused").collect()[0]
    finally:
        an.load_table = orig
    assert (out.n_stage1, out.n_stage2, out.n_stage3) == (3, 1, 1)
