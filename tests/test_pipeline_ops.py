"""Training-data pipeline operator tests: decontamination recall, hash
determinism of split/sample against a Python md5 recomputation, funnel
monotonicity, and the packing prefix-sum invariant."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mysql_streamer_spark.queries import pipeline as pl


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_decontaminate_flags_only_overlapping_train_docs(spark):
    base = "alpha beta gamma delta epsilon zeta"
    docs = _docs(
        spark,
        [
            (0, base, "en", "s", 1),  # eval (0 % 97 == 0)
            (1, base + " extra tail here", "en", "s", 1),  # overlaps eval
            (2, "one two three four five six", "en", "s", 1),  # clean
        ],
    )
    out = {r.doc_id: r.n_shared_ngrams for r in pl.contaminated_docs(docs).collect()}
    # doc 1 shares exactly the 4 shingles of `base` (its later shingles
    # include the new tokens); doc 2 shares none.
    assert set(out) == {1}
    assert out[1] == 4


def _py_cell(prefix: str, doc_id: int, nhex: int) -> int:
    return int(hashlib.md5(f"{prefix}:{doc_id}".encode()).hexdigest()[:nhex], 16)


def test_split_cells_match_python_md5(spark):
    ids = list(range(50))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.cell
        for r in df.select("doc_id", pl._split_cell_col().alias("cell")).collect()
    }
    for i in ids:
        assert got[i] == _py_cell("split", i, 4) % 100


def test_stratified_sample_matches_python_thresholds(spark):
    rows = [(i, "t", "en", f"src{i % 20}", 1) for i in range(200)]
    kept = {
        r.doc_id for r in _docs(spark, rows).filter(pl._sample_keep_col()).collect()
    }
    expected = {
        i
        for i in range(200)
        if _py_cell("sample", i, 8) < pl._SAMPLE_THRESHOLDS[f"src{i % 20}"]
    }
    assert kept == expected
    # src19 has rate 1.0 -> every doc kept; sanity that strata differ
    assert all(i in kept for i in range(200) if i % 20 == 19)


def test_quality_funnel_is_monotone(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again "
            "with many more tokens to clear the minimum length rule easily ok",
         "en", "s", 120),
        (2, "spam " * 30, "en", "s", 150),  # repetition rule fails
        (3, "short doc", "en", "s", 9),  # length rules fail
    ]
    rows = [(i, t.strip(), l, s, n) for (i, t, l, s, n) in rows]
    docs = _docs(spark, rows).withColumn("toks", F.split("text", " "))
    rules = pl._rule_cols()
    agg = docs.agg(
        F.count("*").alias("n_total"),
        *[F.sum(c.cast("long")).alias(n) for n, c in rules.items()],
    ).collect()[0]
    assert agg.n_total == 3
    assert agg.r_len == 2  # doc 3 too short
    assert agg.r_repeat <= 2  # doc 2 is all one token


def test_pack_sequences_prefix_sum_invariant(spark):
    # one source, bucket = doc_id % PACK_BUCKETS; craft ids in ONE bucket
    # (multiples of PACK_BUCKETS) with 300 tokens each -> exclusive prefix
    # sums 0,300,600,900 -> seq ids 0,0,1,1 at budget 512.
    ids = [i * pl.PACK_BUCKETS for i in range(4)]
    rows = [(i, " ".join(["tok"] * 300), "en", "s", 1) for i in ids]
    docs = _docs(spark, rows)
    orig = pl.load_table
    pl.load_table = lambda spark, sf, name: docs
    try:
        out = {
            r.seq_id: (r.n_docs, r.seq_tokens)
            for r in pl.q_pipeline_pack_sequences(spark, "unused").collect()
        }
    finally:
        pl.load_table = orig
    assert out == {0: (2, 600), 1: (2, 600)}
