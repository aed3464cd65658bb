"""Differential fuzz of the text primitives: a seeded batch of random
documents pushed through the Spark column expressions in ONE job per
primitive, compared row-by-row against independent pure-Python
reimplementations (not the code under test). Catches engine-semantics
drift (empty docs, 1-token docs, unicode-free corner cases) that the
hand-picked unit fixtures miss."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from mysql_streamer_spark import text as tx


def _random_docs(n=60, seed=7):
    rng = random.Random(seed)
    words = ["a", "bb", "ccc", "dddd", "the", "und", "el", "le", "zz", "q"]
    docs = []
    for i in range(n):
        k = rng.randint(1, 12)
        docs.append((i, " ".join(rng.choice(words) for _ in range(k))))
    # edge cases: single token, exactly SHINGLE_K tokens, repeated token
    docs += [
        (n, "solo"),
        (n + 1, " ".join(["x"] * tx.SHINGLE_K)),
        (n + 2, "the the the the"),
    ]
    return docs


def _py_shingles(text, k=tx.SHINGLE_K):
    toks = text.split(" ")
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def test_shingles_and_minhash_match_python(spark):
    docs = _random_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = (
        df.withColumn("toks", tx.tokens_col())
        .withColumn("shingles", tx.shingles_col())
        .select(
            "doc_id",
            "text",
            "shingles",
            tx.minhash_col(0).alias("mh0"),
            tx.minhash_col(7).alias("mh7"),
        )
        .collect()
    )
    for r in out:
        exp = _py_shingles(r.text)
        assert list(r.shingles) == exp, r.text
        if exp:
            assert r.mh0 == min(hashlib.md5(s.encode()).hexdigest()[0:4] for s in exp)
            assert r.mh7 == min(
                hashlib.md5(s.encode()).hexdigest()[28:32] for s in exp
            )
        else:
            assert r.mh0 is None and r.mh7 is None


def test_rolling_hash_matches_python(spark):
    docs = _random_docs(seed=11)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = df.select("doc_id", "text", tx.rolling_hash_col().alias("h")).collect()
    for r in out:
        acc = 0
        for ch in r.text:
            acc = (acc * tx.ROLLING_BASE + ord(ch)) % tx.ROLLING_MOD
        assert r.h == acc, r.text


def test_token_stats_match_python(spark):
    docs = _random_docs(seed=13)
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "toks", tx.tokens_col()
    )
    out = df.select(
        "text",
        tx.token_length_sum_col().alias("lsum"),
        tx.subword_count_col().alias("subw"),
        tx.stopword_hits_col(tx.ALL_STOPWORDS).alias("hits"),
    ).collect()
    for r in out:
        toks = r.text.split(" ")
        assert r.lsum == sum(len(t) for t in toks)
        assert r.subw == sum((len(t) + 2) // 3 for t in toks)
        assert r.hits == sum(1 for t in toks if t in tx.ALL_STOPWORDS)
