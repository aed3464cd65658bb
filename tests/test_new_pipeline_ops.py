"""Semantic tests for the round-3 operator additions (beyond the oracle
gate): incremental dedup admission, exact-N reservoir sampling, mixture
weights, span dedup, and schema-compat classification."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_incremental_dedup_rejects_exact_copies_of_index(spark, sf_dir):
    """A delta doc whose text equals an indexed doc's text must come back
    with admit = False (its spans/shingles collide in every band)."""
    from mysql_streamer_spark.queries.dedup import (
        INCR_DELTA_MODULUS,
        q_dedup_incremental,
    )
    from mysql_streamer_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # delta ids whose text is IDENTICAL to some index-side doc
    delta = docs.filter(F.col("doc_id") % INCR_DELTA_MODULUS == 0).alias("d")
    index = docs.filter(F.col("doc_id") % INCR_DELTA_MODULUS != 0).alias("i")
    twins = (
        delta.join(index, F.col("d.text") == F.col("i.text"))
        .select(F.col("d.doc_id").alias("doc_id"))
        .distinct()
    )
    twin_ids = {r.doc_id for r in twins.collect()}
    if not twin_ids:  # fixture may not contain cross-side exact twins
        return
    result = {
        r.doc_id: r.admit for r in q_dedup_incremental(spark, sf_dir).collect()
    }
    for tid in twin_ids:
        assert result[tid] is False, f"exact twin {tid} was admitted"


def test_reservoir_sample_exact_n_per_source(spark, sf_dir):
    from mysql_streamer_spark.queries.pipeline import (
        RESERVOIR_N,
        q_pipeline_reservoir_sample,
    )
    from mysql_streamer_spark.tables import load_table

    per_source_avail = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sampled = (
        q_pipeline_reservoir_sample(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    for r in sampled:
        assert r.n == min(RESERVOIR_N, per_source_avail[r.source])


def test_mix_weights_monotone_and_max_normalized(spark, sf_dir):
    from mysql_streamer_spark.queries.pipeline import q_pipeline_mix_weights

    rows = q_pipeline_mix_weights(spark, sf_dir).collect()
    assert max(r.mix_weight for r in rows) == 1.0
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    weights = [r.mix_weight for r in by_tokens]
    assert weights == sorted(weights), "weight must be monotone in tokens"


def test_span_dedup_flags_identical_documents(spark, sf_dir):
    """Documents sharing identical text must report identical span stats,
    and any text occurring twice corpus-wide has every span duplicated."""
    from mysql_streamer_spark.queries.pipeline import q_pipeline_span_dedup
    from mysql_streamer_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    dup_texts = (
        docs.groupBy("text")
        .agg(F.count("*").alias("n"), F.collect_list("doc_id").alias("ids"))
        .filter(F.col("n") >= 2)
        .select(F.explode("ids").alias("doc_id"))
    )
    dup_ids = {r.doc_id for r in dup_texts.collect()}
    if not dup_ids:
        return
    stats = {r.doc_id: r for r in q_pipeline_span_dedup(spark, sf_dir).collect()}
    for did in dup_ids:
        if did in stats and stats[did].n_spans > 0:
            assert stats[did].n_dup_spans == stats[did].n_spans


def test_schema_compat_initial_version_every_table(spark, sf_dir):
    from mysql_streamer_spark.queries.schema_registry import (
        q_schema_registry_compat,
    )

    rows = q_schema_registry_compat(spark, sf_dir).collect()
    by_table = {}
    for r in rows:
        by_table.setdefault((r.database, r.table), []).append(r)
    for versions in by_table.values():
        first = min(versions, key=lambda r: r.version)
        assert first.compat == "initial"
        for later in versions:
            if later.version > first.version:
                assert later.compat != "initial"


def test_bpe_encode_hand_examples(spark):
    """The merge chain on hand-traced words. Rule ORDER is load-bearing:
    'scan' ends at sc|an because (a,n) fires before (s,c) can feed
    (sc,a); 'query' ends at qu|er|y because (e,r) fires before (q,u) —
    a wrong application order changes these counts and fails here (and
    hash-fails the registered query)."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.queries.pipeline import _bpe_apply_sql

    words = ["the", "table", "value", "query", "scan", "other", "zebra"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["n"]
        for r in df.withColumn("enc", F.expr(_bpe_apply_sql("w", "spark")))
        .select(
            "w",
            (
                F.length("enc")
                - F.length(F.regexp_replace("enc", " ", ""))
                - 1
            ).alias("n"),
        )
        .collect()
    }
    assert got == {
        "the": 1,
        "table": 1,
        "value": 1,
        "query": 3,  # qu | er | y — (e,r) preempts the (qu,e...) chain
        "scan": 2,  # sc | an — (a,n) preempts (sca,n)
        "other": 3,  # o | the | r
        "zebra": 5,  # no merge fires
    }

    # DuckDB replays the identical transform (the oracle's half)
    import duckdb

    dd = {
        w: duckdb.sql(
            f"SELECT strlen(e) - strlen(replace(e,' ','')) - 1 FROM "
            f"(SELECT {_bpe_apply_sql(repr(w), 'duckdb')} AS e)"
        ).fetchone()[0]
        for w in words
    }
    assert dd == got
