"""Text-operator unit tests (tokenize, shingle, langid, fingerprint edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_streamer_spark import text as tx


def test_shingles_short_doc_is_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c",), ("a b c d",)], "text string")
    out = (
        df.withColumn("toks", tx.tokens_col())
        .withColumn("shingles", tx.shingles_col())
        .select("text", "shingles")
        .collect()
    )
    by_text = {r.text: r.shingles for r in out}
    assert by_text["a b"] == []
    assert by_text["a b c"] == ["a b c"]
    assert by_text["a b c d"] == ["a b c", "b c d"]


def test_minhash_is_min_md5_slice(spark):
    import hashlib

    df = spark.createDataFrame([("x y z w",)], "text string")
    row = (
        df.withColumn("toks", tx.tokens_col())
        .withColumn("shingles", tx.shingles_col())
        .select(tx.minhash_col(7).alias("mh"), tx.min_md5_col().alias("fp"))
        .collect()[0]
    )
    hexes = [hashlib.md5(s.encode()).hexdigest() for s in ("x y z", "y z w")]
    assert row.mh == min(h[28:32] for h in hexes)  # seed 7 -> chars 29..32
    assert row.fp == min(hexes)


def test_langid_prefers_hit_count_with_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("the of is and to",), ("der und ist der das",), ("xyzzy qwerty",)],
        "text string",
    )
    d = df.withColumn("toks", tx.tokens_col())
    hit_cols = {}
    for lang in tx.STOPWORDS:
        col = f"hits_{lang}"
        hit_cols[lang] = col
        d = d.withColumn(col, tx.stopword_hits_col(lang))
    out = d.withColumn("pred", F.expr(tx.lang_pred_case_sql(hit_cols))).collect()
    preds = [r.pred for r in out]
    assert preds[0] == "en"
    assert preds[1] == "de"
    assert preds[2] == "und"


def test_subword_count_ceil_division(spark):
    # "abcdef" -> 2 chunks of 3; "ab" -> 1; "abcd" -> 2
    df = spark.createDataFrame([("abcdef ab abcd",)], "text string")
    n = (
        df.withColumn("toks", tx.tokens_col())
        .select(tx.subword_count_col().alias("n"))
        .collect()[0]
        .n
    )
    assert n == 5


def test_rolling_hash_matches_python(spark):
    from mysql_streamer_spark import text as tx2

    s = "the quick brown fox"
    df = spark.createDataFrame([(s,)], "text string")
    got = df.select(tx2.rolling_hash_col("text").alias("h")).collect()[0].h
    h = 0
    for ch in s:
        h = (h * tx2.ROLLING_BASE + ord(ch)) % tx2.ROLLING_MOD
    assert got == h


def test_sql_function_surface_matches_dataframe_path(spark, sf_dir):
    """The registered SQL macros and the Column builders must produce
    identical quality rows (same constants, different API surfaces)."""
    from mysql_streamer_spark.queries.textops import (
        q_text_quality,
        q_text_sql_function_api,
    )

    a = q_text_quality(spark, sf_dir)
    b = q_text_sql_function_api(spark, sf_dir)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_char_entropy_brackets_and_bands(spark, sf_dir):
    """Character entropy: the integer-proxy entropy of any doc is bounded
    by bitlen(n) bits/char, zero only for single-character docs, and the
    three bands partition the corpus (every doc gets exactly one band;
    'mid' is non-empty because the mean sits inside the corpus range)."""
    from mysql_streamer_spark.queries.textops import q_text_char_entropy

    rows = q_text_char_entropy(spark, sf_dir).collect()
    assert rows
    bands = set()
    for r in rows:
        assert 0.0 <= r.entropy_bits <= float(r.n_chars_counted.bit_length())
        assert r.k_distinct >= 1
        assert r.band in {"low", "mid", "high"}
        bands.add(r.band)
    assert "mid" in bands


def test_char_entropy_degenerate_doc_scores_zero(spark):
    """A single-repeated-character doc has c == n, so every surprise term
    is bitlen(n) - bitlen(n) = 0: the filter's motivating case."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "aaaaaaaa")], "doc_id long, text string")
    chars = df.select(
        "doc_id",
        F.length("text").cast("long").alias("n"),
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)), i -> substring(text, i, 1))"
            )
        ).alias("ch"),
    )
    hist = chars.groupBy("doc_id", "n", "ch").agg(F.count("*").alias("c"))
    row = hist.select(
        (
            F.col("c") * (F.expr("length(bin(n))") - F.expr("length(bin(c))"))
        ).alias("bits")
    ).collect()[0]
    assert row.bits == 0


def test_textrank_ranks_are_a_damped_stationary_vector(spark, sf_dir):
    """TextRank sanity: TR_TOP_K rows in strict rank order, every rank
    positive, and the full vector (recomputed without the limit) conserves
    total mass ~= TR_SCALE (damped PageRank is a probability vector up to
    integer-division rounding: at most 2 micro-units lost per node per
    step)."""
    from mysql_streamer_spark.queries.textops import (
        TR_ITERS,
        TR_SCALE,
        TR_TOP_K,
        q_text_textrank_keywords,
    )

    rows = q_text_textrank_keywords(spark, sf_dir).collect()
    assert len(rows) == TR_TOP_K
    ranks = [r.rank_micros for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    for r in rows:
        assert r.rank_micros > 0
        assert r.deg >= 1
        assert abs(r.rank_frac - r.rank_micros / TR_SCALE) < 1e-15
    # mass conservation over the returned top slice alone is a lower bound
    assert sum(ranks) <= TR_SCALE
    assert sum(ranks) > TR_SCALE // 2  # top-20 of 31 words carries most mass


def test_lexical_diversity_exact_rationals(spark, sf_dir):
    """Yule's K and Simpson D recompute exactly from the emitted integer
    numerators, K is 0 only when every token is unique, and a fully
    repetitive doc maxes both indices (K -> 10^4 (n-1)/n, D -> 1)."""
    from mysql_streamer_spark.queries.textops import q_text_lexical_diversity

    rows = q_text_lexical_diversity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r.n_tokens
        assert 1 <= r.n_types <= n
        assert r.sum_f2 >= n  # sum f^2 >= sum f, equality iff all f == 1
        assert r.yule_k == 10000 * (r.sum_f2 - n) / (n * n)
        assert 0.0 <= r.simpson_d <= 1.0
        if r.n_types == n:
            assert r.yule_k == 0.0 and r.simpson_d == 0.0
        assert r.band in {"diverse", "mid", "repetitive"}


def test_lexical_diversity_repetitive_extreme(spark, monkeypatch):
    """One token repeated n times: sum_f2 = n^2, so K = 10^4 (n-1)/n and
    D = 1 exactly — the keyword-stuffing case the band must flag."""
    from mysql_streamer_spark.queries import textops as T

    df = spark.createDataFrame([(7, "spam " * 9 + "spam")], "doc_id long, text string")
    monkeypatch.setattr(
        T, "load_table", lambda spark, sf_dir, name: df
    )
    r = T.q_text_lexical_diversity(spark, "ignored").collect()[0]
    assert (r.n_tokens, r.n_types, r.sum_f2) == (10, 1, 100)
    assert r.yule_k == 10000 * 90 / 100
    assert r.simpson_d == 1.0
    assert r.band == "repetitive"


def test_syllable_profile_invariants_and_dense_branch(spark, sf_dir, monkeypatch):
    """Every word contributes >= 1 syllable; complex words need >= 3 vowel
    groups; the corpus vocabulary tops out 'plain'/'mid', so the 'dense'
    verdict branch is forced with a polysyllabic synthetic doc."""
    from mysql_streamer_spark.queries import textops as T

    rows = T.q_text_syllable_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_syllables >= r.n_words
        assert 0 <= r.n_complex <= r.n_words
        assert r.avg_syllables == r.n_syllables / r.n_words
        assert r.band in {"plain", "mid", "dense"}

    df = spark.createDataFrame(
        [(1, "cat dog uninteresting"), (2, "administrative analytical sky")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(T, "load_table", lambda spark, sf_dir, name: df)
    got = {r.doc_id: r for r in T.q_text_syllable_profile(spark, "x").collect()}
    # uninteresting = u-i-e-e-i -> 5 vowel groups; cat/dog 1 each
    assert got[1].n_syllables == 7 and got[1].n_complex == 1
    # administrative(5) + analytical(5) + sky(0 -> floored to 1)
    assert got[2].n_syllables == 11 and got[2].n_complex == 2
    assert got[2].band == "dense"
