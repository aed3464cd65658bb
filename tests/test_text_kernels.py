"""Differential pins: the Arrow shingle kernels (text_kernels) must be
byte-identical to the JVM expression compositions they replaced — same
rows, same array contents, same signature strings — on the fixture corpus
AND on adversarial edge texts (nulls, too-short docs, repeated/trailing
delimiters, empty tokens)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_streamer_spark import text as tx
from mysql_streamer_spark import text_kernels as tk
from mysql_streamer_spark.queries.dedup import N_HASHES, _with_signature
from mysql_streamer_spark.tables import load_table


def _jvm_ssets(docs):
    return (
        docs.withColumn("toks", tx.tokens_col("text"))
        .withColumn("sset", F.array_distinct(tx.shingles_col()))
        .filter(F.size("sset") > 0)
    )


#: delimiter pathologies: split/join round-trips must agree between the
#: JVM and Python paths even on empty tokens
EDGE_TEXTS = [
    (1, None),
    (2, ""),
    (3, "one"),
    (4, "one two"),
    (5, "one two three"),
    (6, "a b c d e f g"),
    (7, "a  b   c d"),  # empty tokens from repeated delimiters
    (8, " leading and trailing "),
    (9, "x x x x x"),  # duplicate shingles -> distinct collapses
    (10, "tab\tand\nnewline stay single tokens"),
]


def _edge_docs(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


@pytest.fixture(params=["fixture", "edges"])
def docs(request, spark, sf_dir):
    if request.param == "fixture":
        return load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _edge_docs(spark)


def test_shingle_postings_matches_jvm_composition(spark, docs):
    jvm = _jvm_ssets(docs).select(
        "doc_id", F.explode("sset").alias("shingle")
    )
    ker = tk.shingle_postings(docs)
    j = jvm.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("s")
    )
    k = ker.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("s")
    )
    assert j.count() == k.count()
    joined = j.alias("j").join(k.alias("k"), "doc_id", "full_outer")
    assert (
        joined.filter(F.expr("j.s IS DISTINCT FROM k.s")).count() == 0
    )


def test_shingle_sets_matches_jvm_composition_with_keep(spark, docs):
    docs = docs.withColumn("source", F.concat(F.lit("s"), F.col("doc_id") % 3))
    jvm = _jvm_ssets(docs).select("doc_id", "source", "sset")
    ker = tk.shingle_sets(docs, keep=("source",))
    joined = jvm.alias("j").join(ker.alias("k"), "doc_id", "full_outer")
    assert joined.filter(
        F.expr(
            "j.sset IS DISTINCT FROM k.sset OR j.source IS DISTINCT FROM k.source"
        )
    ).count() == 0
    assert jvm.count() == ker.count()


def test_adjacent_token_pairs_matches_jvm_bigrams(spark, docs):
    """Corpus-level DISTINCT of the kernel's per-doc-deduped pairs must
    equal the distinct of the interpreted named_struct bigram explode."""
    tok = docs.select(tx.tokens_col("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    jvm = (
        tok.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> named_struct('w1', toks[i], 'w2', toks[i + 1]))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .filter(F.col("w1") != F.col("w2"))
        .distinct()
    )
    ker = tk.adjacent_token_pairs(docs).distinct()
    assert jvm.count() == ker.count()
    assert jvm.exceptAll(ker).count() == 0
    assert ker.exceptAll(jvm).count() == 0


def test_doc_repetition_stats_matches_jvm_composition(spark, docs):
    df = docs.withColumn("toks", tx.tokens_col("text")).withColumn(
        "shingles", tx.shingles_col()
    )
    base = df.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
        F.size("shingles").alias("n_shingles"),
    )
    top = (
        df.select("doc_id", F.explode("shingles").alias("shingle"))
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_shingle_count"))
    )
    jvm = base.join(top, "doc_id", "left").withColumn(
        "top_shingle_count", F.coalesce("top_shingle_count", F.lit(0))
    )
    ker = tk.doc_repetition_stats(docs)
    assert jvm.count() == ker.count()
    cond = " OR ".join(
        f"j.{c} IS DISTINCT FROM k.{c}"
        for c in (
            "n_tokens",
            "n_distinct_tokens",
            "n_shingles",
            "top_shingle_count",
        )
    )
    joined = jvm.alias("j").join(ker.alias("k"), "doc_id", "full_outer")
    assert joined.filter(F.expr(cond)).count() == 0


def test_shingle_sets_signed_matches_jvm_signature(spark, docs):
    """sig_i must equal the JVM sliced-min-md5 over the RAW shingle bag
    (the kernel computes it over the distinct set — a min never changes
    under duplicates — so this also pins that equivalence), and sset must
    equal array_distinct of the JVM shingles."""
    jvm = _with_signature(docs).select(
        "doc_id",
        F.array_distinct("shingles").alias("sset"),
        *[f"sig_{i}" for i in range(N_HASHES)],
    )
    ker = tk.shingle_sets_signed(docs, N_HASHES)
    assert jvm.count() == ker.count()
    cond = " OR ".join(
        [f"j.sig_{i} IS DISTINCT FROM k.sig_{i}" for i in range(N_HASHES)]
        + ["j.sset IS DISTINCT FROM k.sset"]
    )
    joined = jvm.alias("j").join(ker.alias("k"), "doc_id", "full_outer")
    assert joined.filter(F.expr(cond)).count() == 0
