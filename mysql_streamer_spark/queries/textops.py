"""Text-analysis queries over the ``documents`` table (LLM-data-pipeline
operator family: token counting, language ID, quality scoring, document
fingerprinting).

Scale notes: every per-document query here is a pure map — one parquet scan,
column pruning to (doc_id, text[, lang, source]), zero shuffles, no Python.
``text_source_profile`` adds exactly one hash aggregation on a low-cardinality
key. All of it survives a 1000-executor 100 TB run unchanged.

Oracle discipline: every expression is generated from the shared constants in
``mysql_streamer_spark.text`` so Spark and DuckDB cannot drift. Ratio columns
divide exact integer counts as doubles — a single IEEE division is
bit-identical in both engines (no float accumulation anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_streamer_spark import text as tx
from mysql_streamer_spark import text_kernels as tk
from mysql_streamer_spark.queries.registry import QuerySpec
from mysql_streamer_spark.tables import load_table, spread


def _docs_with_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "documents")).withColumn(
        "toks", tx.tokens_col("text")
    )


# ---------------------------------------------------------------------------
# token / char statistics
# ---------------------------------------------------------------------------

def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_tokens(spark, sf_dir)
    return df.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars"),
        tx.token_length_sum_col().alias("token_chars"),
        tx.subword_count_col().alias("n_subwords"),
        (
            tx.token_length_sum_col().cast("double")
            / F.size("toks").cast("double")
        ).alias("avg_token_len"),
    )


_TOKEN_STATS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, text, {tx.tokens_sql("text")} AS toks FROM documents
)
SELECT
  doc_id,
  len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_distinct_tokens,
  length(text) AS n_chars,
  {tx.token_length_sum_sql()} AS token_chars,
  {tx.subword_count_sql()} AS n_subwords,
  CAST({tx.token_length_sum_sql()} AS DOUBLE) / CAST(len(toks) AS DOUBLE)
    AS avg_token_len
FROM tok
"""


# ---------------------------------------------------------------------------
# language identification (stopword-hits heuristic)
# ---------------------------------------------------------------------------

_HIT_COLS = {lang: f"hits_{lang}" for lang in tx.STOPWORDS}


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_tokens(spark, sf_dir)
    for lang, col in _HIT_COLS.items():
        df = df.withColumn(col, tx.stopword_hits_col(lang))
    return df.withColumn(
        "lang_pred", F.expr(tx.lang_pred_case_sql(_HIT_COLS))
    ).select("doc_id", F.col("lang").alias("lang_label"), *_HIT_COLS.values(), "lang_pred")


_LANGID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, {tx.tokens_sql("text")} AS toks FROM documents
), hits AS (
  SELECT doc_id, lang,
    {", ".join(f'{tx.stopword_hits_sql(lang)} AS {col}' for lang, col in _HIT_COLS.items())}
  FROM tok
)
SELECT doc_id, lang AS lang_label, {", ".join(_HIT_COLS.values())},
       {tx.lang_pred_case_sql(_HIT_COLS)} AS lang_pred
FROM hits
"""


def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lang-ID evaluation: the (labeled, predicted) confusion matrix with
    per-cell counts — how a pipeline operator decides whether the cheap
    stopword heuristic is good enough per language before trusting its
    routing. Map-side prediction + one tiny aggregate on a
    (n_langs x n_langs) key space."""
    df = _docs_with_tokens(spark, sf_dir)
    for lang, col in _HIT_COLS.items():
        df = df.withColumn(col, tx.stopword_hits_col(lang))
    pred = df.withColumn("lang_pred", F.expr(tx.lang_pred_case_sql(_HIT_COLS)))
    return pred.groupBy(
        F.col("lang").alias("lang_label"), "lang_pred"
    ).agg(F.count("*").alias("n_docs"))


_LANGID_CONFUSION_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, {tx.tokens_sql("text")} AS toks FROM documents
), hits AS (
  SELECT doc_id, lang,
    {", ".join(f'{tx.stopword_hits_sql(lang)} AS {col}' for lang, col in _HIT_COLS.items())}
  FROM tok
)
SELECT lang AS lang_label,
       {tx.lang_pred_case_sql(_HIT_COLS)} AS lang_pred,
       count(*) AS n_docs
FROM hits
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_W_LEN, _W_DIV, _W_INFO = tx.QUALITY_WEIGHTS
_Q_HI, _Q_LO = tx.QUALITY_THRESHOLDS


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_tokens(spark, sf_dir).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        tx.stopword_hits_col(tx.ALL_STOPWORDS).alias("stop_hits"),
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
    stop_ratio = F.col("stop_hits").cast("double") / F.col("n_tokens").cast("double")
    coverage = F.least(
        F.lit(1.0), F.col("n_tokens").cast("double") / F.lit(tx.QUALITY_TOKEN_TARGET)
    )
    score = (
        coverage * F.lit(_W_LEN)
        + distinct_ratio * F.lit(_W_DIV)
        + (F.lit(1.0) - stop_ratio) * F.lit(_W_INFO)
    )
    return df.select(
        "doc_id",
        "n_tokens",
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
        F.when(score >= _Q_HI, "high")
        .when(score >= _Q_LO, "medium")
        .otherwise("low")
        .alias("quality_class"),
    )


_QUALITY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), counts AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    len(list_distinct(toks)) AS n_distinct,
    {tx.stopword_hits_sql(tx.ALL_STOPWORDS)} AS stop_hits
  FROM tok
), scored AS (
  SELECT doc_id, n_tokens,
    CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_ratio,
    CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
    least(1.0, CAST(n_tokens AS DOUBLE) / {tx.QUALITY_TOKEN_TARGET})
        * {_W_LEN}
      + (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * {_W_DIV}
      + (1.0 - CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * {_W_INFO}
      AS quality_score
  FROM counts
)
SELECT doc_id, n_tokens, distinct_ratio, stopword_ratio, quality_score,
  CASE WHEN quality_score >= {_Q_HI} THEN 'high'
       WHEN quality_score >= {_Q_LO} THEN 'medium'
       ELSE 'low' END AS quality_class
FROM scored
"""


# ---------------------------------------------------------------------------
# document fingerprint (min-hash-of-shingles, the rolling-hash analogue)
# ---------------------------------------------------------------------------

def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_tokens(spark, sf_dir).withColumn("shingles", tx.shingles_col())
    return df.select(
        "doc_id",
        F.size(F.array_distinct("shingles")).alias("n_distinct_shingles"),
        tx.min_md5_col().alias("fingerprint"),
    )


_FINGERPRINT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), sh AS (
  SELECT doc_id, {tx.shingles_sql()} AS shingles FROM tok
)
SELECT doc_id,
  len(list_distinct(shingles)) AS n_distinct_shingles,
  {tx.min_md5_sql()} AS fingerprint
FROM sh
"""


# ---------------------------------------------------------------------------
# corpus profile per (lang, source) — integer sums only, division at the end
# ---------------------------------------------------------------------------

def q_text_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_tokens(spark, sf_dir)
    per_doc = df.select(
        "lang", "source", F.size("toks").alias("n_tokens"), F.length("text").alias("n_chars")
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_tokens").cast("double") / F.count("*").cast("double")).alias(
            "avg_tokens_per_doc"
        ),
    )


_SOURCE_PROFILE_ORACLE = f"""
WITH tok AS (
  SELECT lang, source, {tx.tokens_sql("text")} AS toks, length(text) AS n_chars
  FROM documents
)
SELECT lang, source,
  count(*) AS n_docs,
  CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_tokens_per_doc
FROM tok
GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# rolling-hash fingerprint (Rabin-Karp over chars + min block hash)
# ---------------------------------------------------------------------------

BLOCK_CHARS = 64


def q_text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document polynomial hash plus the minimum block hash over
    fixed 64-char blocks (a winnowing-style locality signal: two documents
    sharing an aligned block share the min candidate). Map-only."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_blocks = f"int((length(text) + {BLOCK_CHARS - 1}) div {BLOCK_CHARS})"
    block_hashes = (
        f"transform(sequence(1, {n_blocks}), b -> "
        f"aggregate(transform(split(substring(text, (b - 1) * {BLOCK_CHARS} + 1, "
        f"{BLOCK_CHARS}), ''), c -> ascii(c)), CAST(0 AS BIGINT), "
        f"(acc, c) -> (acc * {tx.ROLLING_BASE} + c) % {tx.ROLLING_MOD}))"
    )
    return docs.select(
        "doc_id",
        tx.rolling_hash_col("text").alias("poly_hash"),
        F.expr(f"array_min({block_hashes})").alias("min_block_hash"),
        F.expr(n_blocks).alias("n_blocks"),
    )


_ROLLING_ORACLE = f"""
SELECT doc_id,
  {tx.rolling_hash_sql("text")} AS poly_hash,
  list_min(list_transform(generate_series(1,
      CAST((length(text) + {BLOCK_CHARS - 1}) // {BLOCK_CHARS} AS INT)),
    b -> list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split_regex(
             substring(text, (b - 1) * {BLOCK_CHARS} + 1, {BLOCK_CHARS}), ''),
             c -> CAST(ascii(c) AS BIGINT))),
         (acc, c) -> (acc * {tx.ROLLING_BASE} + c) % {tx.ROLLING_MOD})))
    AS min_block_hash,
  CAST((length(text) + {BLOCK_CHARS - 1}) // {BLOCK_CHARS} AS INT) AS n_blocks
FROM documents
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition filter (duplicate-token / repeated-n-gram ratios)
# ---------------------------------------------------------------------------

#: keep a document only if BOTH ratios stay under these caps (the
#: repetition heuristics used by large-corpus quality filters: heavily
#: repeated n-grams signal boilerplate/spam).
REPETITION_MAX_DUP_TOKEN_FRAC = 0.55
REPETITION_MAX_TOP_SHINGLE_FRAC = 0.20


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter: per document, the fraction of tokens
    that are repeats (1 - distinct/total) and the share of the most frequent
    3-token shingle among all shingles; a document is kept only when both
    stay under the caps.

    Scale shape: the per-shingle counting is a word-count — explode to
    (doc_id, shingle), hash-aggregate with map-side partials, then reduce to
    one row per doc. Both shuffles key on doc_id(+shingle): linear in corpus
    size, no skew beyond a single document's shingle count, and the final
    join is doc-dimension vs doc-dimension. The wide text/shingle arrays
    never shuffle — only (doc_id, shingle) pairs do."""
    # map-only Arrow kernel (text_kernels, guide §4.2): every statistic is
    # a within-document property, so the (doc_id, shingle) explode + two
    # hash-aggregates + join collapse into one pass; the double math stays
    # in the JVM expressions below, identical to the pre-kernel form
    stats = tk.doc_repetition_stats(
        spread(load_table(spark, sf_dir, "documents"), "doc_id")
    )
    dup_frac = F.lit(1.0) - (
        F.col("n_distinct_tokens").cast("double") / F.col("n_tokens").cast("double")
    )
    top_frac = F.when(
        F.col("n_shingles") > 0,
        F.col("top_shingle_count").cast("double") / F.col("n_shingles").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        stats
        .select(
            "doc_id",
            "n_tokens",
            "n_shingles",
            "top_shingle_count",
            dup_frac.alias("dup_token_frac"),
            top_frac.alias("top_shingle_frac"),
            (
                (dup_frac <= REPETITION_MAX_DUP_TOKEN_FRAC)
                & (top_frac <= REPETITION_MAX_TOP_SHINGLE_FRAC)
            ).alias("keep"),
        )
    )


_REPETITION_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), sh AS (
  SELECT doc_id, toks, {tx.shingles_sql()} AS shingles FROM tok
), base AS (
  SELECT doc_id, len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct_tokens,
         len(shingles) AS n_shingles
  FROM sh
), cnts AS (
  SELECT doc_id, shingle, count(*) AS cnt
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
  GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(cnt) AS top_shingle_count,
         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_shingle_tokens
  FROM cnts GROUP BY 1
), joined AS (
  SELECT base.doc_id, n_tokens, n_shingles,
    COALESCE(top_shingle_count, 0) AS top_shingle_count,
    1.0 - CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      AS dup_token_frac,
    CASE WHEN n_shingles > 0
      THEN CAST(COALESCE(top_shingle_count, 0) AS DOUBLE)
             / CAST(n_shingles AS DOUBLE)
      ELSE 0.0 END AS top_shingle_frac
  FROM base LEFT JOIN top ON base.doc_id = top.doc_id
)
SELECT doc_id, n_tokens, n_shingles, top_shingle_count,
  dup_token_frac, top_shingle_frac,
  dup_token_frac <= {REPETITION_MAX_DUP_TOKEN_FRAC}
    AND top_shingle_frac <= {REPETITION_MAX_TOP_SHINGLE_FRAC} AS keep
FROM joined
"""


# ---------------------------------------------------------------------------
# bigram collocations by PMI (integer-exact scoring)
# ---------------------------------------------------------------------------

#: bigrams rarer than this corpus-wide are noise, not collocations
PMI_MIN_COUNT = 20
PMI_TOP_K = 40


def q_text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations: bigrams ranked by pointwise mutual information.
    The PMI ordering key is computed as ONE division of exact integer
    cross-products — c_ab * N / (c_a * c_b) — so both engines produce the
    identical double (no log(), which is not correctly-rounded and would
    flake the gate; monotone in true PMI, so the ranking is identical).

    Scale shape: two word-counts (unigrams, bigrams) with map-side
    partials, then the bigram table joins the unigram counts twice —
    vocabulary-sized dimensions, AQE picks broadcast vs shuffle — and a
    TakeOrdered top-k. Nothing wider than (word, word, count) moves."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.withColumn("toks", tx.tokens_col("text"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_w"))
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i - 1] AS w1, toks[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_COUNT)
    )
    # corpus token total as a 1-row broadcast — keeps the whole query one
    # lazy plan with no driver-side action
    n_total = uni.agg(F.sum("c_w").alias("n_total"))
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "pmi_ratio",
            (F.col("c_ab") * F.col("n_total")).cast("double")
            / (F.col("c_a") * F.col("c_b")).cast("double"),
        )
    )
    return (
        scored.orderBy(F.col("pmi_ratio").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(PMI_TOP_K)
        .select("w1", "w2", "c_ab", "c_a", "c_b", "pmi_ratio")
    )


_BIGRAM_PMI_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), uni AS (
  SELECT w, count(*) AS c_w
  FROM (SELECT unnest(toks) AS w FROM tok)
  GROUP BY 1
), n AS (
  SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM uni
), bi AS (
  SELECT b.w1, b.w2, count(*) AS c_ab
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
    FROM tok WHERE len(toks) >= 2
  )
  GROUP BY 1, 2
  HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT w1, w2, c_ab, ua.c_w AS c_a, ub.c_w AS c_b,
       CAST(c_ab * n_total AS DOUBLE) / CAST(ua.c_w * ub.c_w AS DOUBLE)
         AS pmi_ratio
FROM bi
JOIN uni ua ON bi.w1 = ua.w
JOIN uni ub ON bi.w2 = ub.w
CROSS JOIN n
ORDER BY pmi_ratio DESC, w1 ASC, w2 ASC
LIMIT {PMI_TOP_K}
"""


# ---------------------------------------------------------------------------
# the SQL-function API surface, value-checked against the DataFrame path
# ---------------------------------------------------------------------------

def q_text_sql_function_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring computed ENTIRELY through the registered SQL macros
    (functions.register_sql_functions) over a temp view — the SQL-first
    user's path. Shares text_quality's oracle: the DataFrame surface, the
    SQL-function surface, and DuckDB must all agree value-for-value. The
    macros inline into the plan (no Python UDF), so this compiles to the
    same map-only codegen stage as the Column form."""
    from mysql_streamer_spark.functions import register_sql_functions

    register_sql_functions(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_sqlfn_v"
    )
    return spark.sql(
        """
        WITH tok AS (
          SELECT doc_id, mss_tokens(text) AS toks FROM documents_sqlfn_v
        ), counts AS (
          SELECT doc_id,
                 size(toks) AS n_tokens,
                 size(array_distinct(toks)) AS n_distinct,
                 mss_stopword_hits(toks) AS stop_hits
          FROM tok
        )
        SELECT doc_id,
               n_tokens,
               CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 AS distinct_ratio,
               CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 AS stopword_ratio,
               mss_quality_score(n_tokens, n_distinct, stop_hits)
                 AS quality_score,
               mss_quality_class(
                 mss_quality_score(n_tokens, n_distinct, stop_hits))
                 AS quality_class
        FROM counts
        """
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken MOSS scheme)
# ---------------------------------------------------------------------------

#: winnowing guarantee window: any shared run of WINNOW_W consecutive
#: k-gram hashes yields at least one shared fingerprint.
WINNOW_W = 4


def q_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: min hash of every WINNOW_W-wide
    window over the k-gram hash sequence, deduplicated — the
    plagiarism-detection fingerprint set (guaranteed to catch any shared
    substring of >= k + WINNOW_W - 1 tokens) at a fraction of the full
    shingle set's size.

    Scale shape: the whole selection is higher-order array functions INSIDE
    each row — one scan, zero shuffles, no Python; only the per-document
    summary (set size, extrema) leaves the row."""
    df = _docs_with_tokens(spark, sf_dir).withColumn("shingles", tx.shingles_col())
    df = df.withColumn("hashes", tx.shingle_hashes_col())
    wins = (
        f"transform(sequence(1, greatest(size(hashes) - {WINNOW_W - 1}, 1)), "
        f"i -> array_min(slice(hashes, i, {WINNOW_W})))"
    )
    return df.select(
        "doc_id",
        F.size("hashes").alias("n_kgrams"),
        F.size(F.array_distinct(F.expr(wins))).alias("n_fingerprints"),
        F.array_min(F.expr(wins)).alias("fp_min"),
        F.array_max(F.expr(wins)).alias("fp_max"),
        (
            F.size(F.array_distinct(F.expr(wins))).cast("double")
            / F.size("hashes").cast("double")
        ).alias("selectivity"),
    )


_WINNOW_WINS_SQL = (
    f"list_transform(generate_series(1, greatest(len(hashes) - {WINNOW_W - 1}, 1)), "
    f"i -> list_min(list_slice(hashes, i, i + {WINNOW_W - 1})))"
)

_WINNOWING_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), sh AS (
  SELECT doc_id, {tx.shingles_sql()} AS shingles FROM tok
), h AS (
  SELECT doc_id, {tx.shingle_hashes_sql()} AS hashes FROM sh
), w AS (
  SELECT doc_id, hashes, {_WINNOW_WINS_SQL} AS wins FROM h
)
SELECT doc_id,
  len(hashes) AS n_kgrams,
  len(list_distinct(wins)) AS n_fingerprints,
  list_min(wins) AS fp_min,
  list_max(wins) AS fp_max,
  CAST(len(list_distinct(wins)) AS DOUBLE) / CAST(len(hashes) AS DOUBLE)
    AS selectivity
FROM w
"""


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021 §A1.1, adapted to the corpus)
# ---------------------------------------------------------------------------

GOPHER_MIN_TOKENS = 15
GOPHER_MAX_TOKENS = 200
GOPHER_WORDLEN_LO = 2.0
GOPHER_WORDLEN_HI = 8.0
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_TOP_TOKEN_FRAC = 0.2


def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document admission rules as independent boolean gates:
    token-count band, mean-word-length band, minimum stopword evidence,
    and a most-frequent-token dominance cap (the repetition rule). Each
    rule is a per-row integer/array expression — one scan, no shuffle; the
    corpus-level pass rate is ONE tiny aggregate downstream of the flags."""
    df = _docs_with_tokens(spark, sf_dir)
    top_frac = (
        "CAST(array_max(transform(array_distinct(toks), "
        "t -> size(filter(toks, x -> x = t)))) AS DOUBLE) / CAST(size(toks) AS DOUBLE)"
    )
    per_doc = df.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        (
            tx.token_length_sum_col().cast("double") / F.size("toks").cast("double")
        ).alias("mean_word_len"),
        tx.stopword_hits_col("en").alias("stop_hits"),
        F.expr(top_frac).alias("top_token_frac"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS).alias(
            "pass_token_count"
        ),
        F.col("mean_word_len")
        .between(GOPHER_WORDLEN_LO, GOPHER_WORDLEN_HI)
        .alias("pass_word_len"),
        (F.col("stop_hits") >= GOPHER_MIN_STOP_HITS).alias("pass_stopwords"),
        (F.col("top_token_frac") <= GOPHER_MAX_TOP_TOKEN_FRAC).alias(
            "pass_repetition"
        ),
        (
            F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
            & F.col("mean_word_len").between(GOPHER_WORDLEN_LO, GOPHER_WORDLEN_HI)
            & (F.col("stop_hits") >= GOPHER_MIN_STOP_HITS)
            & (F.col("top_token_frac") <= GOPHER_MAX_TOP_TOKEN_FRAC)
        ).alias("gopher_pass"),
    )


_GOPHER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), stats AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    CAST({tx.token_length_sum_sql()} AS DOUBLE) / CAST(len(toks) AS DOUBLE)
      AS mean_word_len,
    {tx.stopword_hits_sql("en")} AS stop_hits,
    CAST(list_max(list_transform(list_distinct(toks),
          t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
      / CAST(len(toks) AS DOUBLE) AS top_token_frac
  FROM tok
)
SELECT doc_id,
  n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS} AS pass_token_count,
  mean_word_len BETWEEN {GOPHER_WORDLEN_LO} AND {GOPHER_WORDLEN_HI} AS pass_word_len,
  stop_hits >= {GOPHER_MIN_STOP_HITS} AS pass_stopwords,
  top_token_frac <= {GOPHER_MAX_TOP_TOKEN_FRAC} AS pass_repetition,
  (n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
    AND (mean_word_len BETWEEN {GOPHER_WORDLEN_LO} AND {GOPHER_WORDLEN_HI})
    AND stop_hits >= {GOPHER_MIN_STOP_HITS}
    AND top_token_frac <= {GOPHER_MAX_TOP_TOKEN_FRAC} AS gopher_pass
FROM stats
"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (top terms per document)
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3


def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K distinguishing terms per document, ranked by tf/df (monotone
    in tf·idf for a fixed corpus size, and — unlike log-idf — exact and
    bit-identical across engines: ONE IEEE division, no transcendentals).

    Plan: explode -> (doc, term) count [one shuffle, map-side combined];
    the document-frequency dimension FOLDS OUT of the same aggregate (rows
    are already distinct per doc-term, so df is a count per term — no
    second corpus scan); join strategy is AQE's call (the vocabulary is
    Zipfian — its head broadcasts, its tail is tiny); per-doc top-K via a
    doc_id-partitioned window, never a global sort."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_dim = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df").cast("double")).desc(),
        F.col("term").asc(),
    )
    return (
        tf.join(df_dim, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "rank",
            "term",
            "tf",
            "df",
            (F.col("tf").cast("double") / F.col("df").cast("double")).alias(
                "tfidf_score"
            ),
        )
    )


_TFIDF_ORACLE = f"""
WITH terms AS (
  SELECT doc_id, unnest({tx.tokens_sql("text")}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), df_dim AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df_dim.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df_dim.df AS DOUBLE) DESC,
                    tf.term ASC
         ) AS rank
  FROM tf JOIN df_dim USING (term)
)
SELECT doc_id, rank, term, tf, df,
       CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS tfidf_score
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


# ---------------------------------------------------------------------------
# tokenizer fertility (subwords per word, per language/source)
# ---------------------------------------------------------------------------

def q_text_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility — subword pieces emitted per whitespace word,
    per (lang, source) — the health metric that decides whether a
    tokenizer underserves a language (high fertility = more compute per
    word). Integer sums per group; ONE division at the end."""
    df = _docs_with_tokens(spark, sf_dir)
    per_doc = df.select(
        "lang",
        "source",
        F.size("toks").alias("n_words"),
        tx.subword_count_col().alias("n_subwords"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.sum(F.col("n_words").cast("long")).alias("total_words"),
        F.sum(F.col("n_subwords").cast("long")).alias("total_subwords"),
        (
            F.sum(F.col("n_subwords").cast("long")).cast("double")
            / F.sum(F.col("n_words").cast("long")).cast("double")
        ).alias("fertility"),
    )


_FERTILITY_ORACLE = f"""
WITH tok AS (
  SELECT lang, source, {tx.tokens_sql("text")} AS toks FROM documents
), per_doc AS (
  SELECT lang, source, len(toks) AS n_words,
         {tx.subword_count_sql()} AS n_subwords
  FROM tok
)
SELECT lang, source,
  CAST(sum(n_words) AS BIGINT) AS total_words,
  CAST(sum(n_subwords) AS BIGINT) AS total_subwords,
  CAST(sum(n_subwords) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) AS fertility
FROM per_doc GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# vocabulary coverage curve (top-N vocab share of all token occurrences)
# ---------------------------------------------------------------------------

VOCAB_COVERAGE_POINTS = (5, 10, 20)


def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of all token occurrences a top-N vocabulary covers,
    at the standard budget points — the curve that sizes a vocabulary (or
    proves the corpus Zipfian). One explode -> count aggregate; only the
    top max(POINTS) tokens matter, so the cumulative sum runs over a
    sort-limit (TakeOrderedAndProject: per-partition partial top-K, no
    global sort shuffle) of BOUNDED size — the window never sees the
    unbounded vocabulary domain. Coverage is integer-exact until one
    final division per point."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = vocab.orderBy(F.col("n").desc(), F.col("token").asc()).limit(
        max(VOCAB_COVERAGE_POINTS)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = top.select(
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("token").asc()))
        .alias("rank"),
        F.sum("n").over(w).alias("cum_occurrences"),
    )
    total = vocab.agg(F.sum("n").cast("long").alias("total_occurrences"))
    return (
        ranked.filter(F.col("rank").isin(*VOCAB_COVERAGE_POINTS))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rank").alias("vocab_size"),
            F.col("cum_occurrences").cast("long").alias("cum_occurrences"),
            "total_occurrences",
            (
                F.col("cum_occurrences").cast("double")
                / F.col("total_occurrences").cast("double")
            ).alias("coverage"),
        )
    )


_VOCAB_COVERAGE_ORACLE = f"""
WITH vocab AS (
  SELECT token, count(*) AS n FROM (
    SELECT unnest({tx.tokens_sql("text")}) AS token FROM documents
  ) GROUP BY token
), ranked AS (
  SELECT row_number() OVER (ORDER BY n DESC, token ASC) AS rank,
         sum(n) OVER (ORDER BY n DESC, token ASC
                      ROWS UNBOUNDED PRECEDING) AS cum_occurrences
  FROM vocab
), total AS (SELECT CAST(sum(n) AS BIGINT) AS total_occurrences FROM vocab)
SELECT rank AS vocab_size,
       CAST(cum_occurrences AS BIGINT) AS cum_occurrences,
       total_occurrences,
       CAST(cum_occurrences AS DOUBLE) / CAST(total_occurrences AS DOUBLE)
         AS coverage
FROM ranked, total
WHERE rank IN ({", ".join(str(p) for p in VOCAB_COVERAGE_POINTS)})
"""


# ---------------------------------------------------------------------------
# lexical diversity: hapax legomena / type-token profile per source
# ---------------------------------------------------------------------------

def q_text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical-diversity profile: vocabulary size, hapax
    legomena (words seen exactly once) and the hapax share of the
    vocabulary — the cheap signal that separates generative/templated
    sources (low hapax share) from diverse natural text. Used next to the
    quality rules when deciding per-source mixture weights.

    Scale shape: one explode → one (source, token) count aggregate (Spark
    partial-aggregates map-side, so the shuffle carries unique pairs, not
    occurrences) → one 20-row source rollup. Integer-exact except the one
    final share division."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select("source", F.explode("toks").alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )
    return counts.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.sum((F.col("n") == 1).cast("long")).alias("n_hapax"),
        F.sum("n").cast("long").alias("total_tokens"),
        (
            F.sum((F.col("n") == 1).cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("hapax_share"),
    )


_HAPAX_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({tx.tokens_sql("text")}) AS token FROM documents
), counts AS (
  SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS hapax_share
FROM counts
GROUP BY source
"""


# ---------------------------------------------------------------------------
# compression-ratio proxy (distinct / total character n-grams)
# ---------------------------------------------------------------------------

#: character n-gram width for the compressibility estimate
COMPRESS_NGRAM = 4
#: keep band on the distinct-ngram ratio: below LOW the text is machine-
#: repetitive (a gzip would crush it), above HIGH it is high-entropy noise
#: (random strings, encoded blobs) — the same band logic DCLM/RedPajama-2
#: apply to the gzip ratio itself.
COMPRESS_LOW = 0.30
COMPRESS_HIGH = 0.98


def q_text_compression_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality gate without running a compressor: the
    distinct-to-total ratio of character 4-grams tracks the gzip ratio
    (repeated substrings are exactly what LZ77 back-references remove),
    and unlike gzip it is engine-exact, branch-free, and needs no UDF.
    Low ratio → boilerplate/template spam; suspiciously high ratio →
    random noise; both get dropped by the band rule.

    Plan shape: pure per-row map over one pruned scan (doc_id, text,
    source) — the n-gram array never leaves the row, no explode, no
    shuffle. At 100 TB this runs at scan speed inside one codegen span."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    n = COMPRESS_NGRAM
    total = F.greatest(F.length("text") - (n - 1), F.lit(0)).cast("long")
    distinct = F.expr(
        f"size(array_distinct(transform("
        f"sequence(1, greatest(length(text) - {n - 1}, 0)), "
        f"i -> substring(text, i, {n}))))"
    ).cast("long")
    ratio = distinct.cast("double") / total.cast("double")
    return docs.select(
        "doc_id",
        "source",
        total.alias("n_ngrams"),
        distinct.alias("n_distinct"),
        ratio.alias("distinct_ratio"),
        ((ratio >= COMPRESS_LOW) & (ratio <= COMPRESS_HIGH)).alias("keep"),
    ).filter(F.col("n_ngrams") > 0)


_COMPRESS_ORACLE = f"""
WITH g AS (
  SELECT doc_id, source,
         CAST(greatest(len(text) - {COMPRESS_NGRAM - 1}, 0) AS BIGINT)
           AS n_ngrams,
         CAST(len(list_distinct(list_transform(
             generate_series(1, greatest(len(text) - {COMPRESS_NGRAM - 1}, 0)),
             i -> substr(text, i, {COMPRESS_NGRAM})))) AS BIGINT)
           AS n_distinct
  FROM documents
)
SELECT doc_id, source, n_ngrams, n_distinct,
       CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
         AS distinct_ratio,
       CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
           >= {COMPRESS_LOW}
         AND CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
           <= {COMPRESS_HIGH} AS keep
FROM g
WHERE n_ngrams > 0
"""


# ---------------------------------------------------------------------------
# PII detection / scrubbing (regex surface, cross-engine-checked)
# ---------------------------------------------------------------------------

#: RE2-and-Java-compatible PII patterns: character classes + bounded
#: repetition only — NO alternation, whose match-preference differs between
#: RE2 (leftmost-longest, DuckDB) and java.util.regex (leftmost-first,
#: Spark). That restriction is what makes the scrub cross-engine-exact.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9][0-9-]{5,}[0-9]"


def _pii_augmented_expr(cast_type: str, intdiv: str) -> str:
    """The PII-injection expression, one template for BOTH engines (Spark:
    ``("STRING", "div")``, DuckDB: ``("VARCHAR", "//")``) — the corpus is
    clean synthetic text, so the scrubber is proven as a roundtrip witness:
    inject deterministic PII derived from doc_id into varying subsets of
    documents, then detect, scrub, and prove zero residual. Lock-step
    construction means the oracle cannot drift from the engine."""

    def c(e: str) -> str:
        return f"CAST({e} AS {cast_type})"

    email = f"concat(' contact user', {c('doc_id')}, '@mail.example.com')"
    ipv4 = (
        f"concat(' from 10.', {c('doc_id % 256')}, '.', "
        f"{c(f'(doc_id {intdiv} 256) % 256')}, '.', {c('(doc_id * 7) % 256')})"
    )
    phone = f"concat(' call +1-555-', lpad({c('doc_id % 10000')}, 4, '0'))"
    return (
        "concat(text, "
        f"CASE WHEN doc_id % 3 = 0 THEN {email} ELSE '' END, "
        f"CASE WHEN doc_id % 4 = 0 THEN {ipv4} ELSE '' END, "
        f"CASE WHEN doc_id % 5 = 0 THEN {phone} ELSE '' END)"
    )


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over documents — the scrubbing pass every
    training-data pipeline runs before anything else (emails, IPv4
    addresses, phone numbers -> typed placeholder tokens).

    Roundtrip witness: deterministic PII is injected into doc_id-derived
    subsets (no real PII exists in the synthetic corpus), detected with
    the shared patterns, scrubbed with three chained regexp_replace
    passes, and ``n_residual`` re-runs detection on the scrubbed text —
    zero residual proves completeness, and the md5 of the scrubbed text
    hash-matches the oracle's scrub byte-for-byte.

    Scale shape: pure map — one parquet scan pruned to (doc_id, text),
    regex inside whole-stage codegen (JVM regexp_*, no Python), zero
    shuffles. Survives a 1000-executor 100 TB run unchanged. (Reference
    scope: the reference redacts CDC payload PII via its clientlib
    contract — tests/integration/end_to_end_test.py's encryption golden;
    this is the document-corpus counterpart.)"""
    docs = spread(load_table(spark, sf_dir, "documents"))
    aug = docs.withColumn(
        "aug", F.expr(_pii_augmented_expr("STRING", "div"))
    )

    def n(col: "F.Column", pat: str) -> "F.Column":
        return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))

    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    out = aug.select(
        "doc_id",
        n(F.col("aug"), PII_EMAIL_RE).alias("n_emails"),
        n(F.col("aug"), PII_IPV4_RE).alias("n_ipv4"),
        n(F.col("aug"), PII_PHONE_RE).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_hash"),
        (
            n(scrubbed, PII_EMAIL_RE)
            + n(scrubbed, PII_IPV4_RE)
            + n(scrubbed, PII_PHONE_RE)
        ).alias("n_residual"),
    )
    return out.withColumn(
        "pii_total", F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")
    )


_PII_SCRUB_ORACLE = f"""
WITH a AS (
  SELECT doc_id, {_pii_augmented_expr("VARCHAR", "//")} AS aug FROM documents
), s AS (
  SELECT doc_id, aug,
    regexp_replace(regexp_replace(regexp_replace(
      aug, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
      '{PII_IPV4_RE}', '<IP>', 'g'),
      '{PII_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
  FROM a
)
SELECT doc_id,
  len(regexp_extract_all(aug, '{PII_EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(aug, '{PII_IPV4_RE}')) AS n_ipv4,
  len(regexp_extract_all(aug, '{PII_PHONE_RE}')) AS n_phones,
  md5(scrubbed) AS scrubbed_hash,
  len(regexp_extract_all(scrubbed, '{PII_EMAIL_RE}'))
    + len(regexp_extract_all(scrubbed, '{PII_IPV4_RE}'))
    + len(regexp_extract_all(scrubbed, '{PII_PHONE_RE}')) AS n_residual,
  len(regexp_extract_all(aug, '{PII_EMAIL_RE}'))
    + len(regexp_extract_all(aug, '{PII_IPV4_RE}'))
    + len(regexp_extract_all(aug, '{PII_PHONE_RE}')) AS pii_total
FROM s
"""


# ---------------------------------------------------------------------------
# bigram-LM cross-entropy scoring (the CCNet/KenLM perplexity filter shape)
# ---------------------------------------------------------------------------

#: integer log2 proxy shared with the DSIR scorer: length(bin(x)) =
#: floor(log2(x)) + 1 for x >= 1, exact in both engines (no float log)
_LM_BITLEN = "length(bin({x}))"

#: band half-width around the CORPUS-MEAN surprise (bits/bigram). Surprise
#: of a bigram is bitlen(prefix_count) - bitlen(bigram_count) ~
#: log2(1/P(w2|w1)); below mean - δ = boilerplate the LM has memorized,
#: above mean + δ = rare/garbled text — perplexity filters cut BOTH tails
#: (CCNet keeps the middle). Relative-to-mean banding keeps all three
#: bands live at every scale factor (the synthetic corpus is homogeneous,
#: so absolute edges would collapse to one band); the mean is ONE division
#: of exact corpus totals, so the edges are bit-identical in both engines.
LM_BAND_DELTA = 0.12


def q_text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring — the shape of a KenLM/CCNet perplexity
    filter with the model trained ON the corpus itself: every bigram's
    surprise is the integer log2 proxy of 1/P(w2|w1) (bit-length of the
    prefix count minus bit-length of the bigram count, cf. the DSIR
    scorer's discipline — no float log, so both engines agree
    bit-for-bit), and a document's score is its mean surprise in
    bits/bigram with ONE final IEEE division. ``band`` buckets the
    corpus the way production filters act on it: 'memorized' (low
    surprise = boilerplate), 'mid' (kept), 'surprising' (rare/garbled).

    Scale shape: one tokenize+bigram explode computed once (persisted,
    two consumers: the LM counts and the scoring stream); the 'model' is
    two vocabulary-sized count aggregates with map-side partials joined
    back onto the bigram stream (AQE picks broadcast vs shuffle — at
    100 TB a real deployment trains the LM offline on a sample and
    broadcasts it; the plan below IS that join with the sample = corpus);
    then one per-doc integer-sum aggregate. Only (doc_id, w1, w2) pairs
    shuffle, never text."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.withColumn("toks", tx.tokens_col("text"))
    bi = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i - 1] AS w1, toks[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
        .persist()
    )
    lm = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    prefix = lm.groupBy("w1").agg(F.sum("c12").alias("c1"))
    scored = (
        bi.join(lm, ["w1", "w2"])
        .join(prefix, "w1")
        .withColumn(
            "surprise",
            F.expr(_LM_BITLEN.format(x="c1"))
            - F.expr(_LM_BITLEN.format(x="c12")),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("surprise").cast("long").alias("surprise_bits"),
    )
    corpus = per_doc.agg(
        F.sum("n_bigrams").alias("tot_bigrams"),
        F.sum("surprise_bits").alias("tot_bits"),
    )
    avg = F.col("surprise_bits").cast("double") / F.col("n_bigrams").cast(
        "double"
    )
    mean = F.col("tot_bits").cast("double") / F.col("tot_bigrams").cast("double")
    return per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "n_bigrams",
        "surprise_bits",
        avg.alias("avg_surprise_bits"),
        mean.alias("corpus_mean_bits"),
        F.when(avg < mean - LM_BAND_DELTA, F.lit("memorized"))
        .when(avg > mean + LM_BAND_DELTA, F.lit("surprising"))
        .otherwise(F.lit("mid"))
        .alias("band"),
    )


_LM_PERPLEXITY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), bi AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
    FROM tok WHERE len(toks) >= 2
  )
), lm AS (
  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2
), prefix AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1
), scored AS (
  SELECT doc_id,
         {_LM_BITLEN.format(x="c1")} - {_LM_BITLEN.format(x="c12")}
           AS surprise
  FROM bi JOIN lm USING (w1, w2) JOIN prefix USING (w1)
), per_doc AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(surprise) AS BIGINT) AS surprise_bits
  FROM scored GROUP BY 1
), corpus AS (
  SELECT CAST(sum(n_bigrams) AS BIGINT) AS tot_bigrams,
         CAST(sum(surprise_bits) AS BIGINT) AS tot_bits
  FROM per_doc
)
SELECT doc_id, n_bigrams, surprise_bits,
       CAST(surprise_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         AS avg_surprise_bits,
       CAST(tot_bits AS DOUBLE) / CAST(tot_bigrams AS DOUBLE)
         AS corpus_mean_bits,
       CASE WHEN CAST(surprise_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                 < CAST(tot_bits AS DOUBLE) / CAST(tot_bigrams AS DOUBLE)
                   - {LM_BAND_DELTA} THEN 'memorized'
            WHEN CAST(surprise_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                 > CAST(tot_bits AS DOUBLE) / CAST(tot_bigrams AS DOUBLE)
                   + {LM_BAND_DELTA} THEN 'surprising'
            ELSE 'mid' END AS band
FROM per_doc CROSS JOIN corpus
"""


# ---------------------------------------------------------------------------
# corpus novelty curve — marginal value of each additional document
# ---------------------------------------------------------------------------

def q_text_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty in ingestion order (doc_id as the
    arrival sequence): the fraction of a document's k-token shingles
    whose FIRST corpus occurrence is this document — the marginal-
    information curve data engineers read to decide when a source has
    stopped paying for its ingestion (novelty decays toward the
    boilerplate floor as a crawl saturates). ``novel_frac`` counts
    distinct novel shingle types; docs also report total occurrences so
    self-repetition is visible separately.

    Scale shape: the inverted-index pattern — one shingle explode, one
    min(doc_id) aggregate per 32-hex shingle hash (map-side partials),
    one postings join back; only (doc_id, hash) pairs shuffle. The
    'order' is data (min over doc_id), NOT a window — no global sort
    exists anywhere in the plan."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    grams = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select(
            "doc_id",
            "source",
            F.explode(tx.shingles_col()).alias("g"),
        )
        .select("doc_id", "source", F.md5("g").alias("h"))
    )
    first = grams.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "h")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_shingles"),
            F.countDistinct("h").alias("n_types"),
            F.countDistinct(
                F.when(F.col("first_doc") == F.col("doc_id"), F.col("h"))
            ).alias("n_novel_types"),
        )
    )
    return per_doc.select(
        "doc_id",
        "source",
        "n_shingles",
        "n_types",
        "n_novel_types",
        (
            F.col("n_novel_types").cast("double")
            / F.col("n_types").cast("double")
        ).alias("novel_frac"),
    )


_NOVELTY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {tx.tokens_sql("text")} AS toks FROM documents
), grams AS (
  SELECT doc_id, source, md5(g) AS h
  FROM (SELECT doc_id, source, unnest({tx.shingles_sql("toks")}) AS g
        FROM tok)
), first AS (
  SELECT h, min(doc_id) AS first_doc FROM grams GROUP BY 1
), per_doc AS (
  SELECT doc_id, source,
         count(*) AS n_shingles,
         CAST(count(DISTINCT h) AS BIGINT) AS n_types,
         CAST(count(DISTINCT CASE WHEN first_doc = doc_id THEN h END)
           AS BIGINT) AS n_novel_types
  FROM grams JOIN first USING (h)
  GROUP BY 1, 2
)
SELECT doc_id, source, n_shingles, n_types, n_novel_types,
       CAST(n_novel_types AS DOUBLE) / CAST(n_types AS DOUBLE) AS novel_frac
FROM per_doc
"""


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth curve — corpus-level diminishing returns
# ---------------------------------------------------------------------------

#: number of equal-width doc_id checkpoints the growth curve is sampled at
HEAPS_DECILES = 10


def q_text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law): cumulative distinct word
    types vs cumulative tokens at ten doc_id checkpoints — the
    corpus-level companion to ``text_novelty_curve`` (which is per-doc).
    Data engineers read this curve to see whether a source's vocabulary
    is still growing (worth ingesting) or saturated; ``type_token_ratio``
    falling with the decile index is the Heaps/Herdan signature. All
    cells are exact integers plus single divisions — no log fit, so the
    curve itself is the hash-checked artifact (the exponent is a reader-
    side regression over 10 points).

    Scale shape: one min(doc_id)-per-word aggregate (map-side partials
    over the token explode; only (word, doc_id) moves) and one per-doc
    token count, each joined to a broadcast 10-row checkpoint frame
    (non-equi `<=` by design, bounded fanout x10) and re-aggregated to
     10 rows. No windows, no global sort, nothing driver-side."""
    docs = _docs_with_tokens(spark, sf_dir).select(
        "doc_id", "toks", F.size("toks").alias("n_tokens")
    )
    max_doc = docs.agg(F.max("doc_id").alias("m"))
    cps = (
        spark.range(1, HEAPS_DECILES + 1)
        .withColumnRenamed("id", "decile")
        .crossJoin(F.broadcast(max_doc))
        .select(
            "decile",
            F.expr(f"(decile * m) div {HEAPS_DECILES}").alias("cutoff_doc"),
        )
    )
    first_seen = (
        docs.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    cum_types = (
        first_seen.join(
            F.broadcast(cps), F.col("first_doc") <= F.col("cutoff_doc")
        )
        .groupBy("decile", "cutoff_doc")
        .agg(F.count("*").alias("cum_types"))
    )
    cum_tokens = (
        docs.select("doc_id", "n_tokens")
        .join(F.broadcast(cps), F.col("doc_id") <= F.col("cutoff_doc"))
        .groupBy("decile", "cutoff_doc")
        .agg(F.sum("n_tokens").alias("cum_tokens"))
    )
    return (
        cum_tokens.join(cum_types, ["decile", "cutoff_doc"])
        .select(
            "decile",
            "cutoff_doc",
            "cum_tokens",
            "cum_types",
            (
                F.col("cum_types").cast("double")
                / F.col("cum_tokens").cast("double")
            ).alias("type_token_ratio"),
        )
    )


_HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), docs AS (
  SELECT doc_id, toks, len(toks) AS n_tokens FROM tok
), cps AS (
  SELECT decile, (decile * (SELECT max(doc_id) FROM docs)) // {HEAPS_DECILES}
           AS cutoff_doc
  FROM (SELECT unnest(generate_series(1, {HEAPS_DECILES})) AS decile)
), first_seen AS (
  SELECT w, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(toks) AS w FROM docs)
  GROUP BY 1
), cum_types AS (
  SELECT decile, cutoff_doc, CAST(count(*) AS BIGINT) AS cum_types
  FROM first_seen JOIN cps ON first_doc <= cutoff_doc
  GROUP BY 1, 2
), cum_tokens AS (
  SELECT decile, cutoff_doc, CAST(sum(n_tokens) AS BIGINT) AS cum_tokens
  FROM docs JOIN cps ON doc_id <= cutoff_doc
  GROUP BY 1, 2
)
SELECT decile, cutoff_doc, cum_tokens, cum_types,
       CAST(cum_types AS DOUBLE) / CAST(cum_tokens AS DOUBLE)
         AS type_token_ratio
FROM cum_tokens JOIN cum_types USING (decile, cutoff_doc)
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency head (the companion curve to Heaps' law)
# ---------------------------------------------------------------------------

#: fixed output width: the rank-frequency HEAD is the artifact — the tail
#: is what Heaps/hapax already cover — so the result is <=64 rows at any
#: corpus size and the rank/cumsum window runs over <=64 rows only
ZIPF_TOP_K = 64


def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency curve for the corpus vocabulary head: rank,
    occurrence count, the rank x frequency product (constant under an
    ideal Zipf exponent of 1 — the invariant a reader eyeballs), and the
    exact corpus share + cumulative share per rank. Like ``text_heaps_law``
    the curve itself is the hash-checked artifact: every cell is an exact
    integer or a single IEEE division, no float log fit (the exponent is a
    reader-side regression over the emitted points).

    Scale shape: one explode -> hash aggregate (map-side partials collapse
    each partition to its distinct tokens before the shuffle), then
    TakeOrdered keeps only the top-ZIPF_TOP_K head — never a global sort —
    so the rank/cumulative window runs over a <=64-row frame, and the
    corpus-token total is a 1-row broadcast crossed back on. At 100 TB the
    only full-data cost is the vocabulary aggregate."""
    docs = _docs_with_tokens(spark, sf_dir)
    total = docs.agg(F.sum(F.size("toks")).alias("total_tokens"))
    head = (
        docs.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(ZIPF_TOP_K)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    ranked = head.select(
        "token",
        "n_occurrences",
        F.row_number().over(w).alias("rank"),
        F.sum("n_occurrences")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_occurrences"),
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "token",
        "n_occurrences",
        (F.col("rank") * F.col("n_occurrences")).alias("rank_freq"),
        (
            F.col("n_occurrences").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("share"),
        (
            F.col("cum_occurrences").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("cum_share"),
    )


_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), vocab AS (
  SELECT token, count(*) AS n_occurrences
  FROM (SELECT unnest(toks) AS token FROM tok)
  GROUP BY 1
), ranked AS (
  SELECT token, n_occurrences,
    CAST(row_number() OVER w AS INT) AS rank,
    CAST(sum(n_occurrences) OVER (
      ORDER BY n_occurrences DESC, token ASC ROWS UNBOUNDED PRECEDING
    ) AS BIGINT) AS cum_occurrences
  FROM vocab
  WINDOW w AS (ORDER BY n_occurrences DESC, token ASC)
), totals AS (
  SELECT CAST(sum(len(toks)) AS BIGINT) AS total_tokens FROM tok
)
SELECT rank, token, n_occurrences,
       rank * n_occurrences AS rank_freq,
       CAST(n_occurrences AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS share,
       CAST(cum_occurrences AS DOUBLE) / CAST(total_tokens AS DOUBLE)
         AS cum_share
FROM ranked CROSS JOIN totals
WHERE rank <= {ZIPF_TOP_K}
"""


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM table (the LM-TRAINING half of the
# perplexity filter: interpolated KN, Kneser & Ney 1995 / Chen & Goodman
# 1999, with absolute discount D = 3/4)
# ---------------------------------------------------------------------------

#: fixed-point scale for the smoothed probability (micro-units) — all
#: probability math is integer multiply/divide, bit-identical cross-engine
KN_SCALE = 10**6
#: emit the KN row only for bigrams seen at least this often, top KN_TOP_K
#: by (count, w1, w2) — the head of the model a filter would broadcast
KN_MIN_COUNT = 3
KN_TOP_K = 300


def q_text_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram model head: for the top bigrams,
    the smoothed probability p_kn(w2|w1) = (c12 - D)/c1 +
    D*N1+(w1,.)/c1 * N1+(.,w2)/B with D = 3/4 — continuation counts,
    not raw unigrams, back off the estimate (the insight that made KN
    the standard n-gram smoother). All probability arithmetic is
    fixed-point integer (micro-units, exact div), so both engines agree
    bit-for-bit; the discount (c12 - 3/4) is carried as (4*c12 - 3)/4.

    Scale shape: ONE bigram-type table (persisted) feeds every model
    statistic — (sum, distinct-follower) per w1 in one aggregate,
    distinct-predecessor per w2 in another, the type total as a 1-row
    broadcast — then two vocabulary-sized joins back (AQE broadcasts the
    smaller side) and a TakeOrdered head. Only (w1, w2, count) tuples
    shuffle; at 100 TB this is exactly the shape of counting n-grams for
    a real KenLM build, minus the disk-backed suffix sort."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.withColumn("toks", tx.tokens_col("text"))
    bi = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(toks[i - 1] AS w1, toks[i] AS w2)) "
                "ELSE array() END"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    lm = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12")).persist()
    w1_stats = lm.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n_follow")
    )
    w2_stats = lm.groupBy("w2").agg(F.count("*").alias("n_precede"))
    types = lm.agg(F.count("*").alias("n_bigram_types"))
    joined = (
        lm.filter(F.col("c12") >= KN_MIN_COUNT)
        .join(w1_stats, "w1")
        .join(w2_stats, "w2")
        .crossJoin(F.broadcast(types))
    )
    term1 = F.expr(f"({KN_SCALE} * (4 * c12 - 3)) div (4 * c1)")
    term2 = F.expr(
        f"({KN_SCALE} * 3 * n_follow * n_precede) div (4 * c1 * n_bigram_types)"
    )
    return (
        joined.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n_follow",
            "n_precede",
            "n_bigram_types",
            (term1 + term2).alias("p_kn_micros"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(KN_TOP_K)
    )


_KN_LM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), bi AS (
  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
    FROM tok WHERE len(toks) >= 2
  )
), lm AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY 1, 2
), w1_stats AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n_follow
  FROM lm GROUP BY 1
), w2_stats AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n_precede FROM lm GROUP BY 1
), types AS (
  SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM lm
)
SELECT w1, w2, c12, c1, n_follow, n_precede, n_bigram_types,
       ({KN_SCALE} * (4 * c12 - 3)) // (4 * c1)
         + ({KN_SCALE} * 3 * n_follow * n_precede)
           // (4 * c1 * n_bigram_types) AS p_kn_micros
FROM lm JOIN w1_stats USING (w1) JOIN w2_stats USING (w2)
CROSS JOIN types
WHERE c12 >= {KN_MIN_COUNT}
ORDER BY c12 DESC, w1, w2
LIMIT {KN_TOP_K}
"""


# ---------------------------------------------------------------------------
# character-entropy quality signal (the C4/Gopher "gibberish" filter shape)
# ---------------------------------------------------------------------------

#: band half-width (bits/char) around the corpus-mean character entropy —
#: relative-to-mean banding for the same reason as LM_BAND_DELTA: the
#: synthetic corpus is homogeneous, absolute edges would collapse a band.
CHAR_ENT_DELTA = 0.15


def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution entropy — the cheap "gibberish
    or binary junk" quality signal production filters run before anything
    tokenizes (low entropy = repeated-character runs / boilerplate
    padding; high entropy = base64 blobs, mojibake). Entropy uses the
    repo's integer log2 proxy end-to-end: a character with count c in a
    doc of n chars contributes c * (bitlen(n) - bitlen(c)) ~
    c * log2(n/c) surprise bits — exact integer arithmetic in both
    engines — and the per-doc entropy is ONE IEEE division bits/n.
    ``band`` cuts low/mid/high around the corpus mean computed as one
    division of exact integer corpus totals (sum bits / sum chars), the
    ``text_lm_perplexity`` discipline.

    Scale shape: the per-char explode feeds a (doc_id, n, ch) hash
    aggregate whose partial combine caps map output at ~alphabet-size
    rows per doc per partition; the per-doc fold is one more map-side
    hash aggregate on doc_id. The corpus mean is a 1-row broadcast. No
    windows, no joins wider than the scalar cross.
    Reference scope note: no text surface in the CDC reference —
    SURVEY.md §7 phase-5 text-quality extension."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    chars = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n"),
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    hist = chars.groupBy("doc_id", "n", "ch").agg(
        F.count("*").cast("long").alias("c")
    )
    per_doc = hist.groupBy("doc_id", "n").agg(
        F.count("*").cast("long").alias("k_distinct"),
        F.sum(
            F.col("c")
            * (F.expr("length(bin(n))") - F.expr("length(bin(c))"))
        )
        .cast("long")
        .alias("surprise_bits"),
    )
    per_doc = per_doc.withColumn(
        "entropy_bits",
        F.col("surprise_bits").cast("double") / F.col("n").cast("double"),
    )
    mean = per_doc.agg(
        (
            F.sum("surprise_bits").cast("double") / F.sum("n").cast("double")
        ).alias("mean_bits")
    )
    return (
        per_doc.crossJoin(F.broadcast(mean))
        .select(
            "doc_id",
            F.col("n").alias("n_chars_counted"),
            "k_distinct",
            "surprise_bits",
            "entropy_bits",
            F.when(
                F.col("entropy_bits") < F.col("mean_bits") - CHAR_ENT_DELTA, "low"
            )
            .when(
                F.col("entropy_bits") > F.col("mean_bits") + CHAR_ENT_DELTA, "high"
            )
            .otherwise("mid")
            .alias("band"),
        )
    )


_CHAR_ENTROPY_ORACLE = f"""
WITH chars AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
         unnest(list_transform(generate_series(1, length(text)),
                               i -> substring(text, i, 1))) AS ch
  FROM documents
), hist AS (
  SELECT doc_id, n, ch, CAST(count(*) AS BIGINT) AS c
  FROM chars GROUP BY 1, 2, 3
), per_doc AS (
  SELECT doc_id, n, CAST(count(*) AS BIGINT) AS k_distinct,
         CAST(sum(c * (length(bin(n)) - length(bin(c)))) AS BIGINT)
           AS surprise_bits
  FROM hist GROUP BY 1, 2
), m AS (
  SELECT CAST(sum(surprise_bits) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
           AS mean_bits
  FROM per_doc
)
SELECT doc_id, n AS n_chars_counted, k_distinct, surprise_bits,
       CAST(surprise_bits AS DOUBLE) / CAST(n AS DOUBLE) AS entropy_bits,
       CASE
         WHEN CAST(surprise_bits AS DOUBLE) / CAST(n AS DOUBLE)
              < mean_bits - {CHAR_ENT_DELTA} THEN 'low'
         WHEN CAST(surprise_bits AS DOUBLE) / CAST(n AS DOUBLE)
              > mean_bits + {CHAR_ENT_DELTA} THEN 'high'
         ELSE 'mid'
       END AS band
FROM per_doc CROSS JOIN m
"""


# ---------------------------------------------------------------------------
# TextRank keyword extraction (PageRank over the word co-occurrence graph)
# ---------------------------------------------------------------------------

TR_ITERS = 5
TR_SCALE = 10**12
TR_TOP_K = 20
#: Driver-fold cap for the vocab-bounded rank iteration: 1M edges of two
#: short words is tens of MB on the driver — far past any Heaps-law
#: vocabulary the fixture generator (or a real lowercase-word corpus at
#: 100 TB: the co-occurrence graph grows with VOCABULARY, not corpus
#: rows) produces, while the distributed power loop stays in place for
#: anything bigger.
TR_DRIVER_MAX_EDGES = 1_000_000


def q_text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): damped
    PageRank over the corpus-level word co-occurrence graph (adjacent
    token pairs, both orientations, deduplicated), top-``TR_TOP_K`` words
    by stationary rank — the unsupervised keyword/tag signal used to
    label training corpora at scale.

    Determinism: ranks live in exact BIGINT micro-units (``TR_SCALE``)
    with integer division at every step — the
    ``analytics_copurchase_pagerank`` discipline, bit-identical across
    engines, and the oracle unrolls the same ``TR_ITERS`` power steps as
    MATERIALIZED CTEs.

    Scale shape: the co-occurrence edge build is one map-side bigram
    explode + distinct — postings are (w1, w2) pairs, vocabulary-bounded
    (Heaps-law sublinear in corpus size), and the graph itself is
    vocab x vocab-bounded, so the power iteration runs over a frame that
    stops growing long before the corpus does: at 100 TB the edge build
    dominates and is embarrassingly parallel; the iteration cost is
    fixed. One shuffle per power step, contributions broadcast at
    vocabulary cardinality.
    Reference scope note: no text surface in the CDC reference —
    SURVEY.md §7 phase-5 text extension."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    # Arrow bigram kernel (text_kernels, guide §4.2): per-doc-distinct
    # adjacent pairs feed the same corpus-level distinct the interpreted
    # named_struct transform fed — identical edge set, no per-token
    # interpreted lambda frames
    und = tk.adjacent_token_pairs(docs)
    edges = (
        und.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .unionByName(und.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
        .distinct()
        .persist()
    )
    # Vocabulary-bounded driver fold (r11, the _driver_union_find
    # discipline): the co-occurrence graph is vocab x vocab — Heaps-law
    # sublinear in corpus size, 930 edges at sf0.1 — while the distributed
    # power loop paid TR_ITERS x 2 broadcast builds + joins of machinery
    # for it (~6s of the 7.2s query). Under the explicit edge cap the
    # iteration runs as exact Python-int arithmetic on the collected edge
    # list (same BIGINT div steps, bit-identical ranks; UTF-8 string order
    # equals code-point order, so the tie-break sort matches too); past
    # the cap the distributed loop below runs unchanged.
    n_edges = edges.count()
    if n_edges <= TR_DRIVER_MAX_EDGES:
        pairs = [(row[0], row[1]) for row in edges.collect()]
        deg_d: dict[str, int] = {}
        for s, _d in pairs:
            deg_d[s] = deg_d.get(s, 0) + 1
        n_nodes = max(len(deg_d), 1)
        base_v = TR_SCALE // n_nodes
        r_d = {w: base_v for w in deg_d}
        for _ in range(TR_ITERS):
            sums: dict[str, int] = {}
            for s, d in pairs:
                sums[d] = sums.get(d, 0) + r_d[s] // deg_d[s]
            r_d = {
                w: (15 * base_v) // 100 + (85 * sums.get(w, 0)) // 100
                for w in deg_d
            }
        top = sorted(r_d.items(), key=lambda kv: (-kv[1], kv[0]))[:TR_TOP_K]
        return spark.createDataFrame(
            [(w, deg_d[w], rv, rv / TR_SCALE) for w, rv in top],
            "word string, deg long, rank_micros long, rank_frac double",
        )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("word"), "deg")
    base = nodes.agg(
        F.expr(f"{TR_SCALE} div greatest(count(*), 1)").alias("base")
    )
    r = (
        nodes.crossJoin(F.broadcast(base))
        .select("word", "deg", F.col("base").alias("r"))
    )
    for _ in range(TR_ITERS):
        contrib = r.select(
            F.col("word").alias("src"), F.expr("r div deg").alias("c")
        )
        sums = (
            edges.join(F.broadcast(contrib), "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        r = (
            nodes.crossJoin(F.broadcast(base))
            .join(F.broadcast(sums), F.col("word") == F.col("dst"), "left")
            .select(
                "word",
                "deg",
                (
                    F.expr("(15 * base) div 100")
                    + F.expr("(85 * coalesce(s, 0L)) div 100")
                ).alias("r"),
            )
        )
    return (
        r.select(
            "word",
            "deg",
            F.col("r").alias("rank_micros"),
            (F.col("r").cast("double") / TR_SCALE).alias("rank_frac"),
        )
        .orderBy(F.col("rank_micros").desc(), F.col("word").asc())
        .limit(TR_TOP_K)
    )


def _textrank_oracle() -> str:
    iters = []
    prev = "r0"
    for i in range(1, TR_ITERS + 1):
        iters.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nodes.word,
         (15 * base) // 100
           + (85 * COALESCE(s, 0)) // 100 AS r
  FROM nodes CROSS JOIN base
  LEFT JOIN (
    SELECT dst AS word, CAST(sum({prev}.r // deg.deg) AS BIGINT) AS s
    FROM edges
    JOIN {prev} ON edges.src = {prev}.word
    JOIN deg ON edges.src = deg.src
    GROUP BY 1
  ) sums ON nodes.word = sums.word
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iters)
    return f"""
WITH tok AS MATERIALIZED (
  SELECT {tx.tokens_sql("text")} AS toks FROM documents
  WHERE len({tx.tokens_sql("text")}) >= 2
), bi AS MATERIALIZED (
  SELECT b.w1 AS w1, b.w2 AS w2
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
    FROM tok
  )
  WHERE b.w1 != b.w2
), edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT w1 AS src, w2 AS dst FROM bi
    UNION ALL
    SELECT w2 AS src, w1 AS dst FROM bi
  )
), deg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
), nodes AS MATERIALIZED (
  SELECT src AS word, deg FROM deg
), base AS MATERIALIZED (
  SELECT CAST({TR_SCALE} // greatest(count(*), 1) AS BIGINT) AS base
  FROM nodes
), r0 AS MATERIALIZED (
  SELECT word, base AS r FROM nodes CROSS JOIN base
),
{chain}
SELECT nodes.word, nodes.deg, {prev}.r AS rank_micros,
       CAST({prev}.r AS DOUBLE) / {float(TR_SCALE)} AS rank_frac
FROM {prev} JOIN nodes ON {prev}.word = nodes.word
ORDER BY rank_micros DESC, nodes.word ASC
LIMIT {TR_TOP_K}
"""


_TEXTRANK_ORACLE = _textrank_oracle()


# ---------------------------------------------------------------------------
# lexical diversity: Yule's K + Simpson repeat rate
# ---------------------------------------------------------------------------

#: Yule's K bands. K ~ 10^4 * (sum f^2 - N) / N^2 rises as the frequency
#: spectrum concentrates (repetitive text); on natural English prose K is
#: typically 60-200, boilerplate/spam runs far higher.
YULE_HI = 300.0
YULE_LO = 150.0


def q_text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical-diversity indices: Yule's characteristic K
    (Yule 1944) and Simpson's repeat rate D — the frequency-spectrum
    quality signals corpus filters use to drop keyword-stuffed /
    template-generated pages that pass length and stopword checks.
    Both are exact rational statistics: K = 10^4 (sum f^2 - N) / N^2 and
    D = sum f(f-1) / (N (N-1)) over per-doc token frequencies f, so each
    engine computes exact BIGINT numerators/denominators and ONE IEEE
    division each — bit-identical across engines, no float accumulation.

    Scale shape: one tokenize+explode feeds a (doc_id, token) map-side
    hash aggregate (partial combine caps map output at vocab-size rows
    per doc per partition), then a second map-side fold on doc_id. No
    joins, no windows, no broadcast state.
    Reference scope note: no text surface in the CDC reference —
    SURVEY.md §7 phase-5 text-quality extension."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    freq = (
        docs.select("doc_id", F.explode(tx.tokens_col()).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("f"))
    )
    per = freq.groupBy("doc_id").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("sum_f2"),
        F.sum(F.col("f") * (F.col("f") - F.lit(1))).cast("long").alias("sum_ff1"),
    )
    yule = (
        (F.lit(10000) * (F.col("sum_f2") - F.col("n_tokens"))).cast("double")
        / (F.col("n_tokens") * F.col("n_tokens")).cast("double")
    )
    simpson = F.col("sum_ff1").cast("double") / (
        F.col("n_tokens") * (F.col("n_tokens") - F.lit(1))
    ).cast("double")
    return per.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "sum_f2",
        yule.alias("yule_k"),
        simpson.alias("simpson_d"),
        F.when(yule > YULE_HI, "repetitive")
        .when(yule < YULE_LO, "diverse")
        .otherwise("mid")
        .alias("band"),
    )


_LEXDIV_ORACLE = f"""
WITH freq AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT doc_id, unnest({tx.tokens_sql("text")}) AS t FROM documents)
  GROUP BY 1, 2
), per AS (
  SELECT doc_id,
         CAST(sum(f) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(f * f) AS BIGINT) AS sum_f2,
         CAST(sum(f * (f - 1)) AS BIGINT) AS sum_ff1
  FROM freq GROUP BY 1
)
SELECT doc_id, n_tokens, n_types, sum_f2,
       CAST(10000 * (sum_f2 - n_tokens) AS DOUBLE)
         / CAST(n_tokens * n_tokens AS DOUBLE) AS yule_k,
       CAST(sum_ff1 AS DOUBLE)
         / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) AS simpson_d,
       CASE
         WHEN CAST(10000 * (sum_f2 - n_tokens) AS DOUBLE)
              / CAST(n_tokens * n_tokens AS DOUBLE) > {YULE_HI}
           THEN 'repetitive'
         WHEN CAST(10000 * (sum_f2 - n_tokens) AS DOUBLE)
              / CAST(n_tokens * n_tokens AS DOUBLE) < {YULE_LO}
           THEN 'diverse'
         ELSE 'mid'
       END AS band
FROM per
"""


# ---------------------------------------------------------------------------
# term burstiness (Church-Gale overdispersion)
# ---------------------------------------------------------------------------

#: minimum document frequency for stable per-term dispersion statistics
BURST_MIN_DF = 5
#: Fisher dispersion index above which a term counts as bursty (Poisson
#: gives exactly 1; content words run well above, function words near 1)
BURST_FISHER_HI = 2.0


def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term burstiness (Church & Gale 1995): content words arrive in
    bursts (a doc that mentions a topic word mentions it repeatedly)
    while function words arrive ~Poisson — the dispersion signal that
    separates topical vocabulary from glue, used to weight retrieval and
    to sanity-check synthetic corpora (whose generators are often
    un-bursty). Emits, per term above ``BURST_MIN_DF``: total frequency
    tf, document frequency df, the within-doc second moment, mean
    occurrences per containing doc (tf/df — Church-Gale burstiness), and
    the Fisher dispersion index var/mean = sum_c2/tf - tf/N over ALL N
    docs (zeros included, algebraically — no zero rows materialize).

    Exactness: tf, df, sum c^2 are exact BIGINT aggregates; the two
    ratios are fixed two-division IEEE sequences identical in both
    engines. Scale shape: one tokenize+explode into a (doc, term)
    map-side count, then a term-keyed map-side fold; vocabulary-bounded
    output (Heaps-law sublinear), zero joins beyond the 1-row doc-count
    broadcast.
    Reference scope note: no text surface in the CDC reference —
    SURVEY.md §7 phase-5 text-quality extension."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    per_doc = (
        docs.select("doc_id", F.explode(tx.tokens_col()).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    per_term = (
        per_doc.groupBy("t")
        .agg(
            F.sum("c").cast("long").alias("tf"),
            F.count("*").cast("long").alias("df"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
        )
        .filter(F.col("df") >= BURST_MIN_DF)
    )
    fisher = F.col("sum_c2").cast("double") / F.col("tf").cast("double") - F.col(
        "tf"
    ).cast("double") / F.col("n_docs").cast("double")
    return per_term.crossJoin(F.broadcast(n_docs)).select(
        F.col("t").alias("term"),
        "tf",
        "df",
        "sum_c2",
        "n_docs",
        (F.col("tf").cast("double") / F.col("df").cast("double")).alias(
            "burstiness"
        ),
        fisher.alias("fisher_index"),
        F.when(fisher > BURST_FISHER_HI, "bursty")
        .otherwise("regular")
        .alias("band"),
    )


_BURSTINESS_ORACLE = f"""
WITH per_doc AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest({tx.tokens_sql("text")}) AS t FROM documents)
  GROUP BY 1, 2
), per_term AS (
  SELECT t, CAST(sum(c) AS BIGINT) AS tf,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(c * c) AS BIGINT) AS sum_c2
  FROM per_doc GROUP BY 1
  HAVING count(*) >= {BURST_MIN_DF}
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
)
SELECT t AS term, tf, df, sum_c2, n_docs,
       CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness,
       CAST(sum_c2 AS DOUBLE) / CAST(tf AS DOUBLE)
         - CAST(tf AS DOUBLE) / CAST(n_docs AS DOUBLE) AS fisher_index,
       CASE WHEN CAST(sum_c2 AS DOUBLE) / CAST(tf AS DOUBLE)
                 - CAST(tf AS DOUBLE) / CAST(n_docs AS DOUBLE)
                 > {BURST_FISHER_HI}
            THEN 'bursty' ELSE 'regular' END AS band
FROM per_term CROSS JOIN nd
"""


# ---------------------------------------------------------------------------
# pairwise source divergence (exact total-variation distance)
# ---------------------------------------------------------------------------

#: TV distance bands: below LO the two sources are interchangeable for
#: mixture purposes; above HI they are distinct domains
TV_LO = 0.2
TV_HI = 0.5


def q_text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise total-variation distance between the unigram
    distributions of every source pair — the domain-drift matrix a
    mixture designer reads before merging or reweighting sources (TV
    rather than KL/JS because it is EXACT in integers: with counts c and
    totals T, |p - q| terms cross-multiply to |c1 T2 - c2 T1| and the
    only division is the final one by 2 T1 T2; KL/JS would need a log of
    a mixture, which has no exact integer form). Tokens absent from one
    source contribute their full mass via the closed form
    (T1 - shared1) T2 + (T2 - shared2) T1 — no outer join, no zero rows.

    Scale shape: one (source, token) map-side count, a broadcast of the
    S-row totals, ONE equi-join on token between the per-source count
    tables (the shuffle key is the token — vocabulary-bounded postings,
    never documents), and an S^2-row pair aggregate. Headroom: c*T
    stays under 2^63 while any source holds < ~3e9 tokens with the
    other's total at the same size; beyond that the cross products must
    widen to DECIMAL(38,0) (documented boundary).
    Reference scope note: no text surface in the CDC reference —
    SURVEY.md §7 phase-5 text-quality extension."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    counts = (
        docs.select("source", F.explode(tx.tokens_col()).alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    totals = counts.groupBy("source").agg(F.sum("c").cast("long").alias("tot"))
    ct = counts.join(F.broadcast(totals), "source")
    a = ct.select(
        F.col("source").alias("source_a"),
        "t",
        F.col("c").alias("c1"),
        F.col("tot").alias("t1"),
    )
    b = ct.select(
        F.col("source").alias("source_b"),
        "t",
        F.col("c").alias("c2"),
        F.col("tot").alias("t2"),
    )
    shared = (
        a.join(b, "t")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_shared_tokens"),
            F.sum(F.abs(F.col("c1") * F.col("t2") - F.col("c2") * F.col("t1")))
            .cast("long")
            .alias("sum_abs_shared"),
            F.sum("c1").cast("long").alias("shared1"),
            F.sum("c2").cast("long").alias("shared2"),
        )
    )
    # the pair UNIVERSE comes from the S-row source dim (bounded self
    # cross), so disjoint-vocabulary pairs — which the shared-token join
    # can never produce — still appear, with their exact tv = 1
    universe = (
        totals.select(
            F.col("source").alias("source_a"), F.col("tot").alias("t1")
        )
        .crossJoin(
            F.broadcast(
                totals.select(
                    F.col("source").alias("source_b"), F.col("tot").alias("t2")
                )
            )
        )
        .filter(F.col("source_a") < F.col("source_b"))
    )
    pair = universe.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce("n_shared_tokens", F.lit(0)).cast("long").alias(
            "n_shared_tokens"
        ),
        "t1",
        "t2",
        F.coalesce("sum_abs_shared", F.lit(0)).cast("long").alias(
            "sum_abs_shared"
        ),
        F.coalesce("shared1", F.lit(0)).cast("long").alias("shared1"),
        F.coalesce("shared2", F.lit(0)).cast("long").alias("shared2"),
    )
    scaled = (
        F.col("sum_abs_shared")
        + (F.col("t1") - F.col("shared1")) * F.col("t2")
        + (F.col("t2") - F.col("shared2")) * F.col("t1")
    )
    tv = scaled.cast("double") / (
        F.lit(2.0) * F.col("t1").cast("double") * F.col("t2").cast("double")
    )
    return pair.select(
        "source_a",
        "source_b",
        "n_shared_tokens",
        "t1",
        "t2",
        scaled.alias("tv_scaled"),
        tv.alias("tv_distance"),
        F.when(tv > TV_HI, "divergent")
        .when(tv < TV_LO, "similar")
        .otherwise("mid")
        .alias("band"),
    )


_SOURCE_DIVERGENCE_ORACLE = f"""
WITH counts AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest({tx.tokens_sql("text")}) AS t FROM documents)
  GROUP BY 1, 2
), totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM counts GROUP BY 1
), ct AS (
  SELECT counts.source, counts.t, c, tot FROM counts JOIN totals USING (source)
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared_tokens,
         CAST(sum(abs(a.c * b.tot - b.c * a.tot)) AS BIGINT) AS sum_abs_shared,
         CAST(sum(a.c) AS BIGINT) AS shared1,
         CAST(sum(b.c) AS BIGINT) AS shared2
  FROM ct a JOIN ct b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
), pair AS (
  SELECT ua.source AS source_a, ub.source AS source_b,
         CAST(coalesce(n_shared_tokens, 0) AS BIGINT) AS n_shared_tokens,
         CAST(ua.tot AS BIGINT) AS t1,
         CAST(ub.tot AS BIGINT) AS t2,
         CAST(coalesce(sum_abs_shared, 0) AS BIGINT) AS sum_abs_shared,
         CAST(coalesce(shared1, 0) AS BIGINT) AS shared1,
         CAST(coalesce(shared2, 0) AS BIGINT) AS shared2
  FROM totals ua
  JOIN totals ub ON ua.source < ub.source
  LEFT JOIN shared ON shared.source_a = ua.source
                  AND shared.source_b = ub.source
)
SELECT source_a, source_b, n_shared_tokens, t1, t2,
       sum_abs_shared + (t1 - shared1) * t2 + (t2 - shared2) * t1
         AS tv_scaled,
       CAST(sum_abs_shared + (t1 - shared1) * t2 + (t2 - shared2) * t1
            AS DOUBLE)
         / (2.0 * CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)) AS tv_distance,
       CASE WHEN CAST(sum_abs_shared + (t1 - shared1) * t2
                      + (t2 - shared2) * t1 AS DOUBLE)
                 / (2.0 * CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE))
                 > {TV_HI} THEN 'divergent'
            WHEN CAST(sum_abs_shared + (t1 - shared1) * t2
                      + (t2 - shared2) * t1 AS DOUBLE)
                 / (2.0 * CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE))
                 < {TV_LO} THEN 'similar'
            ELSE 'mid' END AS band
FROM pair
"""


# ---------------------------------------------------------------------------
# syllable / word-complexity profile
# ---------------------------------------------------------------------------

#: A word is "complex" at >= 3 vowel groups (the SMOG / Gunning-fog
#: polysyllabic-word convention, with vowel groups as the standard
#: dictionary-free syllable proxy).
COMPLEX_SYLLABLES = 3
PCT_COMPLEX_HI = 20.0  # % complex words above which the doc reads "dense"
PCT_COMPLEX_LO = 8.0


def q_text_syllable_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-complexity profile: syllable counts via the
    vowel-group proxy (runs of [aeiou] per word, floored at 1), the
    polysyllabic-word ratio of SMOG / Gunning-fog readability, and a
    density band — the dictionary-free readability signal quality
    filters use to separate telegraphic junk from dense prose.
    Counts are exact integers in both engines; the two ratios are each
    ONE IEEE division of exact integer totals.

    Scale shape: pure per-row higher-order-function map (no explode —
    the fold runs inside ``aggregate``/``list_sum`` per row), so the
    whole query is one whole-stage-codegen projection with no shuffle
    at all beyond the final collect.
    Reference scope note: no text surface in the CDC reference —
    SURVEY.md §7 phase-5 text-quality extension."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", tx.tokens_col().alias("toks"))
    syl = F.expr(
        "aggregate(toks, 0L, (acc, t) -> acc + greatest(1L, "
        "size(regexp_extract_all(t, '[aeiou]+', 0))))"
    )
    cplx = F.expr(
        "size(filter(toks, t -> "
        f"size(regexp_extract_all(t, '[aeiou]+', 0)) >= {COMPLEX_SYLLABLES}))"
    )
    pct = F.lit(100.0) * cplx.cast("double") / F.size("toks").cast("double")
    return toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        syl.cast("long").alias("n_syllables"),
        cplx.cast("long").alias("n_complex"),
        (syl.cast("double") / F.size("toks").cast("double")).alias(
            "avg_syllables"
        ),
        pct.alias("pct_complex"),
        F.when(pct > PCT_COMPLEX_HI, "dense")
        .when(pct < PCT_COMPLEX_LO, "plain")
        .otherwise("mid")
        .alias("band"),
    )


_SYLLABLE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), per AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(toks, t ->
           greatest(1, len(regexp_extract_all(t, '[aeiou]+')))))
           AS BIGINT) AS n_syllables,
         CAST(len(list_filter(toks, t ->
           len(regexp_extract_all(t, '[aeiou]+')) >= {COMPLEX_SYLLABLES}))
           AS BIGINT) AS n_complex
  FROM tok
)
SELECT doc_id, n_words, n_syllables, n_complex,
       CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE) AS avg_syllables,
       100.0 * CAST(n_complex AS DOUBLE) / CAST(n_words AS DOUBLE)
         AS pct_complex,
       CASE
         WHEN 100.0 * CAST(n_complex AS DOUBLE) / CAST(n_words AS DOUBLE)
              > {PCT_COMPLEX_HI} THEN 'dense'
         WHEN 100.0 * CAST(n_complex AS DOUBLE) / CAST(n_words AS DOUBLE)
              < {PCT_COMPLEX_LO} THEN 'plain'
         ELSE 'mid'
       END AS band
FROM per
"""


SPECS = [
    QuerySpec(
        "text_textrank_keywords", q_text_textrank_keywords, _TEXTRANK_ORACLE
    ),
    QuerySpec("text_char_entropy", q_text_char_entropy, _CHAR_ENTROPY_ORACLE),
    QuerySpec(
        "text_lexical_diversity", q_text_lexical_diversity, _LEXDIV_ORACLE
    ),
    QuerySpec(
        "text_syllable_profile", q_text_syllable_profile, _SYLLABLE_ORACLE
    ),
    QuerySpec("text_burstiness", q_text_burstiness, _BURSTINESS_ORACLE),
    QuerySpec(
        "text_source_divergence",
        q_text_source_divergence,
        _SOURCE_DIVERGENCE_ORACLE,
    ),
    QuerySpec("text_token_stats", q_text_token_stats, _TOKEN_STATS_ORACLE),
    QuerySpec("text_kn_bigram_lm", q_text_kn_bigram_lm, _KN_LM_ORACLE),
    QuerySpec("text_heaps_law", q_text_heaps_law, _HEAPS_ORACLE),
    QuerySpec("text_zipf_fit", q_text_zipf_fit, _ZIPF_ORACLE),
    QuerySpec(
        "text_lm_perplexity", q_text_lm_perplexity, _LM_PERPLEXITY_ORACLE
    ),
    QuerySpec("text_novelty_curve", q_text_novelty_curve, _NOVELTY_ORACLE),
    QuerySpec("text_pii_scrub", q_text_pii_scrub, _PII_SCRUB_ORACLE),
    QuerySpec(
        "text_compression_proxy", q_text_compression_proxy, _COMPRESS_ORACLE
    ),
    QuerySpec("text_hapax_ratio", q_text_hapax_ratio, _HAPAX_ORACLE),
    QuerySpec("text_fertility", q_text_fertility, _FERTILITY_ORACLE),
    QuerySpec(
        "text_vocab_coverage", q_text_vocab_coverage, _VOCAB_COVERAGE_ORACLE
    ),
    QuerySpec("text_winnowing", q_text_winnowing, _WINNOWING_ORACLE),
    QuerySpec("text_gopher_rules", q_text_gopher_rules, _GOPHER_ORACLE),
    QuerySpec("text_tfidf_topk", q_text_tfidf_topk, _TFIDF_ORACLE),
    QuerySpec("text_repetition", q_text_repetition, _REPETITION_ORACLE),
    QuerySpec("text_langid", q_text_langid, _LANGID_ORACLE),
    QuerySpec("text_bigram_pmi", q_text_bigram_pmi, _BIGRAM_PMI_ORACLE),
    QuerySpec("text_quality", q_text_quality, _QUALITY_ORACLE),
    QuerySpec(
        "text_langid_confusion", q_text_langid_confusion, _LANGID_CONFUSION_ORACLE
    ),
    # the SQL-macro surface shares the oracle with the DataFrame path —
    # the check proves the two engine surfaces agree bit-for-bit
    QuerySpec("text_sql_function_api", q_text_sql_function_api, _QUALITY_ORACLE),
    QuerySpec("text_fingerprint", q_text_fingerprint, _FINGERPRINT_ORACLE),
    QuerySpec("text_rolling_hash", q_text_rolling_hash, _ROLLING_ORACLE),
    QuerySpec("text_source_profile", q_text_source_profile, _SOURCE_PROFILE_ORACLE),
]
