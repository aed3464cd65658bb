"""Training-data pipeline operators over ``documents`` — the corpus-prep
stages a 100 TB LLM data pipeline runs between raw crawl and tokenizer:
benchmark decontamination, deterministic train/val splitting, per-source
stratified sampling, a C4-style quality-filter funnel, and sequence
packing.

Scale rules shared by the family:

- Every randomized decision (split, sample) is a DETERMINISTIC hash of the
  row key — md5-based so Spark and DuckDB agree bit-for-bit, and so a
  re-run of the pipeline (or a recovered partition) makes the same
  decision without any stored RNG state. This is how real pipelines make
  sampling reproducible across cluster restarts.
- No operator shuffles document text. Decontamination moves (doc_id,
  shingle-hash) postings; split/sample/quality are pure map-side
  projections followed by one small aggregate; packing shuffles (doc_id,
  n_tokens) pairs only.
- The eval-side n-gram set in decontamination is broadcast (benchmarks are
  tiny next to the corpus); the corpus side never self-joins.

Reference scope: Yelp/mysql_streamer has no text pipeline; this family is
the scale extension mandated by the builder's brief (SURVEY.md §7 phases
4-5), modeled on public corpus-prep pipelines (C4, Gopher/MassiveText
rules, The Pile / SlimPajama decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_streamer_spark import text as tx
from mysql_streamer_spark import text_kernels as tk
from mysql_streamer_spark.queries.registry import QuerySpec
from mysql_streamer_spark.tables import load_table, spread

#: Every doc_id ≡ 0 (mod EVAL_MODULUS) plays the role of a held-out
#: benchmark document; the rest are the training corpus. (The fixture has
#: no separate benchmark table, so the eval set is carved deterministically
#: from the corpus itself — the operator shape is identical.)
EVAL_MODULUS = 97

#: Train/val split: md5-bucket of the doc key into 100 cells, first
#: VAL_CELLS cells go to 'val'. Hashing (not doc_id ranges) decorrelates
#: the split from ingestion order.
VAL_CELLS = 10

#: Per-source sampling rates. Rates are compared against a 32-bit hash of
#: the doc key, with the integer threshold precomputed once here so both
#: engines evaluate ``hash < floor(rate * 2^32)`` — no float comparison.
SAMPLE_RATES: dict[str, float] = {f"src{i}": ((i % 4) + 1) / 4 for i in range(20)}
_SAMPLE_THRESHOLDS: dict[str, int] = {
    s: int(r * 2**32) for s, r in SAMPLE_RATES.items()
}

#: Quality-funnel rule constants (C4/Gopher-style heuristics, integer
#: arithmetic only — rule 2 is "mean token length in [MIN,MAX]" expressed
#: as a cross-multiplied integer bound to avoid engine-private float
#: division).
MIN_TOKENS = 20
WORDLEN_MIN = 2
WORDLEN_MAX = 12
MAX_TOKEN_SHARE_PCT = 20  # no single token may exceed 20% of the doc
CHARS_MIN, CHARS_MAX = 50, 2000

#: Sequence packing: target tokens per packed training sequence, and the
#: salt-bucket fan-out that bounds any single packing partition (at 100 TB
#: one source can hold billions of docs; packing within (source, bucket)
#: keeps every window partition small and embarrassingly parallel while
#: staying deterministic).
PACK_BUDGET_TOKENS = 512
PACK_BUCKETS = 8


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------

def contaminated_docs(docs: DataFrame) -> DataFrame:
    """Training docs sharing ≥1 n-gram with the eval set, with the count
    of distinct overlapping n-grams — the SlimPajama/The-Pile style
    decontamination report.

    Plan: eval-side distinct shingles (tiny) BROADCAST to the corpus
    posting explode; one count aggregate per doc. The corpus is scanned
    once, text never shuffles, and there is no corpus-side self-join.
    """
    is_eval = F.col("doc_id") % EVAL_MODULUS == 0
    # Two consumers (eval + train branch) read the shingled form, so it is
    # computed once, spread across cores (the fixture is one parquet
    # split), and persisted.
    # Arrow shingle-set kernel (text_kernels, guide §4.2) — identical
    # rows to the interpreted tokenize/shingle/distinct lambda chain
    shingled = tk.shingle_sets(spread(docs), keep=("source",)).persist()
    eval_shingles = (
        shingled.filter(is_eval)
        .select(F.explode("sset").alias("shingle"))
        .distinct()
    )
    train_posting = shingled.filter(~is_eval).select(
        "doc_id", "source", F.explode("sset").alias("shingle")
    )
    return (
        train_posting.join(F.broadcast(eval_shingles), "shingle")
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def q_pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return contaminated_docs(load_table(spark, sf_dir, "documents"))


_DECONTAMINATE_ORACLE = f"""
WITH shingled AS (
  SELECT doc_id, source,
         list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
  WHERE len({tx.shingles_sql(tx.tokens_sql("text"))}) > 0
), eval_shingles AS (
  SELECT DISTINCT unnest(sset) AS shingle FROM shingled
  WHERE doc_id % {EVAL_MODULUS} = 0
), train_posting AS (
  SELECT doc_id, source, unnest(sset) AS shingle FROM shingled
  WHERE doc_id % {EVAL_MODULUS} != 0
)
SELECT doc_id, source, count(*) AS n_shared_ngrams
FROM train_posting JOIN eval_shingles USING (shingle)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# decontamination n-gram-size sensitivity sweep
# ---------------------------------------------------------------------------

#: n-gram sizes the sweep evaluates — the knob every decontamination run
#: has to pick (small n over-flags common phrases, large n under-flags
#: paraphrased leakage); the sweep shows the corpus's own sensitivity
DECON_SWEEP_NS = (2, 3, 4)


def q_pipeline_decontaminate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sensitivity report: how many training documents
    (and how much token mass) the eval-overlap filter flags at n-gram
    sizes 2, 3 and 4 — the calibration table behind choosing
    ``pipeline_decontaminate``'s n (SlimPajama/The-Pile pick their n from
    exactly this trade-off). One row per n with flagged-doc and flagged-
    token counts plus exact shares of the train split.

    Scale shape: the tokenized corpus is computed once and persisted;
    each leg is the decontamination plan itself (eval-side distinct
    shingles broadcast to the train-side posting explode, one aggregate)
    at a different n; the three 1-row leg reports union and the 1-row
    train totals broadcast back on. Text never shuffles; no corpus
    self-join at any n."""
    is_eval = F.col("doc_id") % EVAL_MODULUS == 0
    # token counts stay a JVM expression (split+size is codegen, no
    # higher-order lambda); the per-leg shingling moves to the Arrow
    # kernel (text_kernels, guide §4.2) with n_toks riding through
    base = (
        spread(load_table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            F.size(tx.tokens_col("text")).alias("n_toks"),
            "text",
        )
        .persist()
    )
    legs = []
    for n in DECON_SWEEP_NS:
        sh = tk.shingle_sets(base, k=n, keep=("n_toks",))
        eval_shingles = (
            sh.filter(is_eval).select(F.explode("sset").alias("shingle")).distinct()
        )
        flagged = (
            sh.filter(~is_eval)
            .select("doc_id", "n_toks", F.explode("sset").alias("shingle"))
            .join(F.broadcast(eval_shingles), "shingle")
            .groupBy("doc_id")
            .agg(F.min("n_toks").alias("n_toks"))
        )
        legs.append(
            flagged.agg(
                F.count("*").alias("n_flagged_docs"),
                F.sum("n_toks").alias("flagged_tokens"),
            ).select(
                F.lit(n).alias("ngram_n"), "n_flagged_docs", "flagged_tokens"
            )
        )
    report = legs[0]
    for leg in legs[1:]:
        report = report.unionByName(leg)
    totals = base.filter(~is_eval).agg(
        F.count("*").alias("n_train_docs"),
        F.sum("n_toks").alias("train_tokens"),
    )
    return report.crossJoin(F.broadcast(totals)).select(
        "ngram_n",
        "n_flagged_docs",
        "flagged_tokens",
        (
            F.col("n_flagged_docs").cast("double")
            / F.col("n_train_docs").cast("double")
        ).alias("flagged_doc_share"),
        (
            F.col("flagged_tokens").cast("double")
            / F.col("train_tokens").cast("double")
        ).alias("flagged_token_share"),
    )


def _decontaminate_sweep_oracle() -> str:
    legs = []
    for n in DECON_SWEEP_NS:
        legs.append(f"""
SELECT {n} AS ngram_n,
       count(*) AS n_flagged_docs,
       CAST(sum(n_toks) AS BIGINT) AS flagged_tokens
FROM (
  SELECT doc_id, min(n_toks) AS n_toks
  FROM (
    SELECT doc_id, n_toks, unnest(sset) AS shingle
    FROM (
      SELECT doc_id, len(toks) AS n_toks,
             list_distinct({tx.shingles_sql("toks", n)}) AS sset
      FROM tok
      WHERE doc_id % {EVAL_MODULUS} != 0
    ) WHERE len(sset) > 0
  )
  WHERE shingle IN (
    SELECT DISTINCT unnest(list_distinct({tx.shingles_sql("toks", n)}))
    FROM tok
    WHERE doc_id % {EVAL_MODULUS} = 0
      AND len(list_distinct({tx.shingles_sql("toks", n)})) > 0
  )
  GROUP BY doc_id
)""")
    union = "\nUNION ALL\n".join(legs)
    return f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), report AS (
{union}
), totals AS (
  SELECT count(*) AS n_train_docs,
         CAST(sum(len(toks)) AS BIGINT) AS train_tokens
  FROM tok WHERE doc_id % {EVAL_MODULUS} != 0
)
SELECT ngram_n, n_flagged_docs, flagged_tokens,
       CAST(n_flagged_docs AS DOUBLE) / CAST(n_train_docs AS DOUBLE)
         AS flagged_doc_share,
       CAST(flagged_tokens AS DOUBLE) / CAST(train_tokens AS DOUBLE)
         AS flagged_token_share
FROM report CROSS JOIN totals
"""


# ---------------------------------------------------------------------------
# deterministic train/val split
# ---------------------------------------------------------------------------

def _split_cell_col() -> F.Column:
    """md5-bucket of the doc key into [0, 100) — Spark form."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long")
        % 100
    )


_SPLIT_CELL_SQL = (
    "CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"
)


def q_pipeline_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split manifest: per (split, source) document/token totals. The split
    decision is a pure per-row hash — map-side only, one tiny aggregate; a
    downstream writer would partitionBy(split) with zero extra shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(_split_cell_col() < VAL_CELLS, F.lit("val")).otherwise(F.lit("train"))
    return (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select(
            split.alias("split"),
            "source",
            F.size("toks").alias("n_toks"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


_SPLIT_ORACLE = f"""
SELECT CASE WHEN {_SPLIT_CELL_SQL} < {VAL_CELLS} THEN 'val' ELSE 'train' END AS split,
       source,
       count(*) AS n_docs,
       CAST(sum(len({tx.tokens_sql("text")})) AS BIGINT) AS n_tokens
FROM documents
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# split leakage: near-dup pairs crossing the train/val boundary
# ---------------------------------------------------------------------------

def q_pipeline_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate leakage across the train/val split — the audit that
    motivates dedup-BEFORE-split (Lee et al. 2022): a random hash split
    puts ~2 p (1-p) of every near-dup pair across the boundary, silently
    inflating eval scores. Emits every exact-Jaccard near-dup pair (the
    ``dedup_jaccard_ngram`` tier) with both docs' split assignments and
    the crossing flag; the crossing rate is the leakage headline.

    Shape: the pair stream is the proven DF-capped inverted index; split
    assignment is a pure per-row md5 expression ON THE PAIR IDS (the
    split depends only on doc_id, so no join back to the corpus is
    needed — two column expressions on an id-only frame).
    Reference scope note: no pipeline surface in the CDC reference —
    SURVEY.md §7 phase-5 corpus-prep extension."""
    from mysql_streamer_spark.queries.dedup import (
        _docs_dim_hint,
        ngram_jaccard_pairs,
    )

    def split_of(col: str) -> F.Column:
        cell = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split:"), F.col(col).cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 100
        )
        return F.when(cell < VAL_CELLS, F.lit("val")).otherwise(F.lit("train"))

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        dim_hint=_docs_dim_hint(sf_dir),
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "jaccard",
        split_of("doc_a").alias("split_a"),
        split_of("doc_b").alias("split_b"),
        (split_of("doc_a") != split_of("doc_b")).alias("crosses_split"),
    )


def _split_leakage_oracle() -> str:
    from mysql_streamer_spark.queries.dedup import _JACCARD_NGRAM_ORACLE

    def split_sql(col: str) -> str:
        return (
            f"CASE WHEN CAST('0x' || substring(md5('split:' || "
            f"CAST({col} AS VARCHAR)), 1, 4) AS BIGINT) % 100 < {VAL_CELLS} "
            "THEN 'val' ELSE 'train' END"
        )

    return f"""
WITH pairs AS ({_JACCARD_NGRAM_ORACLE})
SELECT doc_a, doc_b, jaccard,
       {split_sql("doc_a")} AS split_a,
       {split_sql("doc_b")} AS split_b,
       {split_sql("doc_a")} != {split_sql("doc_b")} AS crosses_split
FROM pairs
"""


# ---------------------------------------------------------------------------
# per-source stratified sampling
# ---------------------------------------------------------------------------

def _sample_hash_col() -> F.Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


_SAMPLE_HASH_SQL = (
    "CAST('0x' || substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
)


def _sample_keep_col() -> F.Column:
    h = _sample_hash_col()
    cond = None
    for src, thr in _SAMPLE_THRESHOLDS.items():
        clause = (F.col("source") == src) & (h < thr)
        cond = clause if cond is None else cond | clause
    return cond


def _sample_keep_sql() -> str:
    clauses = " OR ".join(
        f"(source = '{s}' AND {_SAMPLE_HASH_SQL} < {thr})"
        for s, thr in _SAMPLE_THRESHOLDS.items()
    )
    return f"({clauses})"


def q_pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampled corpus manifest (doc_id, source, lang): per-source
    down-sampling to the SAMPLE_RATES mixture weights, decided row-locally
    by hash threshold — the shuffle-free way to hit a target domain mix.
    Unknown sources are dropped (rate 0 — an explicit mixture is also an
    allowlist)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(_sample_keep_col()).select("doc_id", "source", "lang")


_SAMPLE_ORACLE = f"""
SELECT doc_id, source, lang
FROM documents
WHERE {_sample_keep_sql()}
"""


# ---------------------------------------------------------------------------
# quality-filter funnel
# ---------------------------------------------------------------------------

def _rule_cols() -> dict[str, F.Column]:
    """The C4/Gopher-style per-document rules as integer-only predicates.

    r_repeat computes the max single-token frequency with a quadratic
    higher-order-function scan over ≤~100 tokens per row — fine per-row
    cost, zero shuffle, no Python.
    """
    ntoks = F.size("toks")
    mode_count = F.expr(
        "array_max(transform(array_distinct(toks), "
        "t -> size(filter(toks, x -> x = t))))"
    )
    return {
        "r_len": ntoks >= MIN_TOKENS,
        "r_wordlen": (tx.token_length_sum_col() >= WORDLEN_MIN * ntoks)
        & (tx.token_length_sum_col() <= WORDLEN_MAX * ntoks),
        "r_stopword": tx.stopword_hits_col(tx.ALL_STOPWORDS) >= 1,
        "r_repeat": mode_count * 100 <= ntoks * MAX_TOKEN_SHARE_PCT,
        "r_chars": (F.col("n_chars") >= CHARS_MIN) & (F.col("n_chars") <= CHARS_MAX),
    }


def _rule_sqls() -> dict[str, str]:
    mode_count = (
        "list_max(list_transform(list_distinct(toks), "
        "t -> len(list_filter(toks, x -> x = t))))"
    )
    return {
        "r_len": f"len(toks) >= {MIN_TOKENS}",
        "r_wordlen": (
            f"{tx.token_length_sum_sql()} >= {WORDLEN_MIN} * len(toks)"
            f" AND {tx.token_length_sum_sql()} <= {WORDLEN_MAX} * len(toks)"
        ),
        "r_stopword": f"{tx.stopword_hits_sql(tx.ALL_STOPWORDS)} >= 1",
        "r_repeat": f"{mode_count} * 100 <= len(toks) * {MAX_TOKEN_SHARE_PCT}",
        "r_chars": f"n_chars >= {CHARS_MIN} AND n_chars <= {CHARS_MAX}",
    }


def q_pipeline_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source funnel: how many docs survive each successive filter
    (cumulative ANDs, in the declared rule order) — the report a pipeline
    operator reads to see which rule is eating the corpus. Pure map-side
    rule evaluation + one aggregate on the 20-row source key."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    rules = _rule_cols()
    aggs = [F.count("*").alias("n_total")]
    running = None
    for name, col in rules.items():
        running = col if running is None else (running & col)
        aggs.append(F.sum(running.cast("long")).alias(f"n_{name}"))
    aggs.append(F.sum(running.cast("long")).alias("n_pass"))
    return docs.groupBy("source").agg(*aggs)


def _funnel_oracle() -> str:
    rules = _rule_sqls()
    sels = ["count(*) AS n_total"]
    running: list[str] = []
    for name, sql in rules.items():
        running.append(f"({sql})")
        conj = " AND ".join(running)
        sels.append(
            f"CAST(sum(CASE WHEN {conj} THEN 1 ELSE 0 END) AS BIGINT) AS n_{name}"
        )
    conj = " AND ".join(running)
    sels.append(f"CAST(sum(CASE WHEN {conj} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass")
    cols = ",\n       ".join(sels)
    return f"""
WITH tok AS (
  SELECT source, n_chars, {tx.tokens_sql("text")} AS toks FROM documents
)
SELECT source,
       {cols}
FROM tok
GROUP BY source
"""


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def q_pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill sequence packing: within each (source, salt-bucket)
    lane, docs in doc_id order are assigned to training sequences of
    ~PACK_BUDGET_TOKENS via an exclusive running token total — seq_id =
    floor(prefix_sum / budget).

    Scale shape: the ONLY shuffle is the window partition on (source,
    bucket); the salt bucket bounds every lane regardless of source skew,
    so a billion-doc source becomes PACK_BUCKETS independent lanes instead
    of one straggler partition (raise PACK_BUCKETS with corpus size). Rows
    in flight are (keys, n_toks) — text itself would only be re-joined by
    doc_id at write time.
    """
    docs = load_table(spark, sf_dir, "documents")
    lane = Window.partitionBy("source", "bucket").orderBy("doc_id")
    cum_excl = F.coalesce(
        F.sum("n_toks").over(lane.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        docs.select(
            "doc_id",
            "source",
            (F.col("doc_id") % PACK_BUCKETS).alias("bucket"),
            F.size(tx.tokens_col("text")).alias("n_toks"),
        )
        .withColumn("seq_id", F.floor(cum_excl / PACK_BUDGET_TOKENS))
        .groupBy("source", "bucket", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


_PACK_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, source,
         doc_id % {PACK_BUCKETS} AS bucket,
         len({tx.tokens_sql("text")}) AS n_toks
  FROM documents
), seqd AS (
  SELECT doc_id, source, bucket, n_toks,
         CAST(floor(COALESCE(sum(n_toks) OVER (
             PARTITION BY source, bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {PACK_BUDGET_TOKENS}) AS BIGINT) AS seq_id
  FROM sized
)
SELECT source, bucket, seq_id,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS seq_tokens,
       min(doc_id) AS first_doc_id,
       max(doc_id) AS last_doc_id
FROM seqd
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# packing boundary audit: cross-document attention contamination
# ---------------------------------------------------------------------------

#: contamination fraction above which a packed sequence is flagged as
#: needing document-boundary attention masking
PACK_CONTAM_HI = 0.5


def q_pipeline_pack_boundary_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-document attention-contamination accounting for the packing
    plan of ``pipeline_pack_sequences``: under full (unmasked) attention,
    every token of a later document in a packed sequence attends to every
    token of the earlier documents — the training-quality leak that
    motivates per-document attention masks (Krell et al. 2022; packing
    analyses of Zhao et al. 2024). Per packed sequence this emits the
    exact count of cross-document attention pairs, the total ordered
    pair count T(T-1)/2, their ratio, and the masking verdict.

    Exactness and shape: cross-doc pairs per sequence are
    sum(t_i * (c_i - c_min)) where c_i is the doc's exclusive lane
    prefix and c_min the sequence's first prefix — algebraically
    sum(t_i c_i) - c_min * T, so ONE lane window (the same
    (source, bucket) ordered prefix the packer itself uses — no second
    shuffle) and ONE hash aggregate with min/sum produce everything;
    the fraction is ONE division of exact BIGINTs. Headroom: t*c stays
    under 2^63 while any single lane holds < ~9e15 tokens; PACK_BUCKETS
    scales lanes down long before that.
    Reference scope note: no pipeline surface in the CDC reference —
    SURVEY.md §7 phase-5 corpus-prep extension."""
    docs = load_table(spark, sf_dir, "documents")
    lane = Window.partitionBy("source", "bucket").orderBy("doc_id")
    cum_excl = F.coalesce(
        F.sum("n_toks").over(lane.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    sized = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % PACK_BUCKETS).alias("bucket"),
        F.size(tx.tokens_col("text")).cast("long").alias("n_toks"),
    ).withColumn("c", cum_excl)
    seqd = sized.withColumn(
        "seq_id", F.floor(F.col("c") / PACK_BUDGET_TOKENS)
    )
    agg = seqd.groupBy("source", "bucket", "seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("seq_tokens"),
        F.sum(F.col("n_toks") * F.col("c")).cast("long").alias("s_tc"),
        F.min("c").cast("long").alias("c_min"),
    )
    contaminated = F.col("s_tc") - F.col("c_min") * F.col("seq_tokens")
    total = (
        F.col("seq_tokens") * (F.col("seq_tokens") - F.lit(1)) / F.lit(2)
    ).cast("long")
    frac = contaminated.cast("double") / total.cast("double")
    return agg.select(
        "source",
        "bucket",
        "seq_id",
        "n_docs",
        "seq_tokens",
        (F.col("n_docs") - F.lit(1)).cast("long").alias("n_boundaries"),
        contaminated.alias("contaminated_pairs"),
        total.alias("total_pairs"),
        frac.alias("contamination_frac"),
        F.when(frac > PACK_CONTAM_HI, "needs_doc_mask")
        .otherwise("acceptable")
        .alias("verdict"),
    )


_PACK_BOUNDARY_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, source,
         doc_id % {PACK_BUCKETS} AS bucket,
         CAST(len({tx.tokens_sql("text")}) AS BIGINT) AS n_toks
  FROM documents
), pre AS (
  SELECT doc_id, source, bucket, n_toks,
         CAST(COALESCE(sum(n_toks) OVER (
             PARTITION BY source, bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS c
  FROM sized
), seqd AS (
  SELECT *, CAST(floor(c / {PACK_BUDGET_TOKENS}) AS BIGINT) AS seq_id
  FROM pre
), agg AS (
  SELECT source, bucket, seq_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS seq_tokens,
         CAST(sum(n_toks * c) AS BIGINT) AS s_tc,
         CAST(min(c) AS BIGINT) AS c_min
  FROM seqd GROUP BY 1, 2, 3
)
SELECT source, bucket, seq_id, n_docs, seq_tokens,
       n_docs - 1 AS n_boundaries,
       s_tc - c_min * seq_tokens AS contaminated_pairs,
       CAST(seq_tokens * (seq_tokens - 1) / 2 AS BIGINT) AS total_pairs,
       CAST(s_tc - c_min * seq_tokens AS DOUBLE)
         / CAST(CAST(seq_tokens * (seq_tokens - 1) / 2 AS BIGINT) AS DOUBLE)
         AS contamination_frac,
       CASE WHEN CAST(s_tc - c_min * seq_tokens AS DOUBLE)
                 / CAST(CAST(seq_tokens * (seq_tokens - 1) / 2 AS BIGINT)
                        AS DOUBLE) > {PACK_CONTAM_HI}
            THEN 'needs_doc_mask' ELSE 'acceptable' END AS verdict
FROM agg
"""


# ---------------------------------------------------------------------------
# training-mix manifest (split x sampling composition)
# ---------------------------------------------------------------------------

def q_pipeline_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final training-mix manifest: after stratified sampling, per
    (split, source) document and token totals plus each source's share of
    its split — the one table a training job reads to configure its data
    loader. Composes the two independent hash decisions (sample keeps a
    doc; split routes it), both row-local, so the whole report is one
    scan + one aggregate + a per-split share join."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(_sample_keep_col())
    split = F.when(_split_cell_col() < VAL_CELLS, F.lit("val")).otherwise(
        F.lit("train")
    )
    per = (
        kept.withColumn("toks", tx.tokens_col("text"))
        .select(split.alias("split"), "source", F.size("toks").alias("n_toks"))
        .groupBy("split", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens"))
    )
    totals = per.groupBy("split").agg(F.sum("n_tokens").alias("split_tokens"))
    return per.join(totals, "split").withColumn(
        "token_share",
        F.col("n_tokens").cast("double") / F.col("split_tokens").cast("double"),
    )


_MIX_REPORT_ORACLE = f"""
WITH kept AS (
  SELECT * FROM documents WHERE {_sample_keep_sql()}
), per AS (
  SELECT CASE WHEN {_SPLIT_CELL_SQL} < {VAL_CELLS} THEN 'val' ELSE 'train' END AS split,
         source,
         count(*) AS n_docs,
         CAST(sum(len({tx.tokens_sql("text")})) AS BIGINT) AS n_tokens
  FROM kept
  GROUP BY 1, 2
), totals AS (
  SELECT split, CAST(sum(n_tokens) AS BIGINT) AS split_tokens FROM per GROUP BY 1
)
SELECT per.split, source, n_docs, n_tokens, split_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(split_tokens AS DOUBLE) AS token_share
FROM per JOIN totals ON per.split = totals.split
"""


# ---------------------------------------------------------------------------
# document chunking (overlapping token windows)
# ---------------------------------------------------------------------------

#: Chunk width and stride in tokens (stride < width -> overlapping
#: windows, the standard embedding/RAG chunking layout).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def q_pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping CHUNK_TOKENS-token windows at
    CHUNK_STRIDE — the map-only explode that feeds an embedding model.
    The output carries an md5 over each chunk's text (the downstream
    dedup/cache key) instead of the text itself, so the exploded stream
    stays narrow; a writer joins text back by (doc_id, start_tok) only
    for the rows it actually embeds."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    chunks = F.expr(
        f"transform(sequence(1, size(toks), {CHUNK_STRIDE}), s -> struct("
        f"s AS start_tok, "
        f"size(slice(toks, s, {CHUNK_TOKENS})) AS n_chunk_toks, "
        f"md5(array_join(slice(toks, s, {CHUNK_TOKENS}), ' ')) AS chunk_hash))"
    )
    return (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            "chunk_idx",
            F.col("c.start_tok").alias("start_tok"),
            F.col("c.n_chunk_toks").alias("n_chunk_toks"),
            F.col("c.chunk_hash").alias("chunk_hash"),
        )
    )


_CHUNK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), chunked AS (
  SELECT doc_id,
         unnest(generate_series(1, len(toks), {CHUNK_STRIDE})) AS start_tok,
         toks
  FROM tok
)
SELECT doc_id,
       CAST((start_tok - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       start_tok,
       len(toks[start_tok:start_tok + {CHUNK_TOKENS - 1}]) AS n_chunk_toks,
       md5(array_to_string(toks[start_tok:start_tok + {CHUNK_TOKENS - 1}], ' '))
         AS chunk_hash
FROM chunked
"""


# ---------------------------------------------------------------------------
# corpus vocabulary (top-k tokens)
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 200


def q_pipeline_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus vocabulary head: top-K tokens by occurrence count with
    document frequency — the table a tokenizer-training or stopword-
    mining pass reads first. Explode -> ONE hash aggregate (map-side
    partial combine collapses each partition to its distinct tokens
    before the shuffle) -> TakeOrdered top-K, never a global sort."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select("doc_id", F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(VOCAB_TOP_K)
    )


_VOCAB_ORACLE = f"""
SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM (
  SELECT doc_id, unnest({tx.tokens_sql("text")}) AS token FROM documents
)
GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {VOCAB_TOP_K}
"""


# ---------------------------------------------------------------------------
# Python UDTF chunker (the table-function surface)
# ---------------------------------------------------------------------------

#: fixed chunk width (tokens) for the UDTF form; remainder forms the last chunk
UDTF_CHUNK_TOKENS = 40


def q_pipeline_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF surface: a Python table function lateral-joined per
    document, splitting the token stream into fixed UDTF_CHUNK_TOKENS
    blocks and emitting (chunk_id, n_tokens, md5 chunk key) rows. The
    md5 is computed in PYTHON (hashlib) and checked against DuckDB's md5
    — pinning the UDTF execution path end-to-end, like the Arrow kernels.

    Scale shape: the UDTF is a per-row map (one doc in, its chunks out)
    inside the scan stage — no shuffle, and chunk keys (not text) are
    what downstream stages move. Prefer the declarative transform()
    form (pipeline_chunk_documents) when expressible; the UDTF exists
    for logic that genuinely needs imperative Python per row."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id long, chunk_id int, n_tokens int, chunk_hash string")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):
            import hashlib

            toks = text.split(" ")
            w = UDTF_CHUNK_TOKENS
            for i in range(0, len(toks), w):
                piece = " ".join(toks[i : i + w])
                yield (
                    doc_id,
                    i // w,
                    len(toks[i : i + w]),
                    hashlib.md5(piece.encode()).hexdigest(),
                )

    spark.udtf.register("chunk_doc_udtf", ChunkDoc)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_id, c.n_tokens, c.chunk_hash "
        "FROM documents_v d, LATERAL chunk_doc_udtf(d.doc_id, d.text) c"
    )


_CHUNK_UDTF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS chunk_id,
       CAST(len(toks[(i - 1) * {UDTF_CHUNK_TOKENS} + 1 : i * {UDTF_CHUNK_TOKENS}]) AS INT)
         AS n_tokens,
       md5(array_to_string(
         toks[(i - 1) * {UDTF_CHUNK_TOKENS} + 1 : i * {UDTF_CHUNK_TOKENS}], ' '))
         AS chunk_hash
FROM tok,
     unnest(generate_series(1,
       CAST((len(toks) + {UDTF_CHUNK_TOKENS - 1}) // {UDTF_CHUNK_TOKENS} AS INT))) AS t(i)
"""


# ---------------------------------------------------------------------------
# exact-N per-stratum sampling (deterministic reservoir)
# ---------------------------------------------------------------------------

#: exact number of documents to keep per source
RESERVOIR_N = 12


def q_pipeline_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-source sampling: rank documents within each source by
    a deterministic md5 of the doc key and keep the first RESERVOIR_N —
    the exact-size counterpart of rate-based stratified sampling (which
    only hits N in expectation). Deterministic: a re-run, a recovered
    partition, or the DuckDB oracle selects the identical sample.

    Scale shape: one window partitioned BY SOURCE (parallelism = number of
    strata; each partition holds one stratum and top-N short-circuits the
    sort). For a skewed mega-stratum, pre-filtering by an approximate
    hash-threshold would bound the sorted set; at 20 sources x fixture
    sizes the plain window is the right plan."""
    docs = load_table(spark, sf_dir, "documents")
    rank_hash = F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(rank_hash.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_N)
        .select("doc_id", "source", "lang", F.col("rk").alias("sample_rank"))
    )


_RESERVOIR_ORACLE = f"""
SELECT doc_id, source, lang, sample_rank
FROM (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('res:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {RESERVOIR_N}
"""


# ---------------------------------------------------------------------------
# inverse-frequency (temperature) mixture weighting
# ---------------------------------------------------------------------------

#: temperature for mixture reweighting, as an exact rational (numerator,
#: denominator) so the power computes as integer-exact cross products in
#: neither engine... pow() IS engine-deterministic for 0.5 via sqrt, which
#: both engines IEEE-round correctly, so T=1/2 keeps the oracle exact.
MIX_TEMPERATURE = 0.5


def q_pipeline_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights per source: w_s ∝ tokens_s^T
    with T=0.5 (up-weights small sources, the standard multilingual /
    multi-domain rebalancing rule). One aggregate for per-source token
    totals, one 1-row max broadcast back. Weights are reported relative
    to the LARGEST source (mix_weight = w_raw / max(w_raw)): max is
    reduction-order-independent where a float sum is not, and sqrt is
    correctly-rounded IEEE in both engines — so the gate stays exactly
    deterministic (a sum-normalized weight differed by 1 ulp between
    engines; the loader renormalizes however it likes)."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .groupBy("source")
        .agg(F.sum(F.size("toks")).alias("n_tokens"))
        .withColumn("w_raw", F.sqrt(F.col("n_tokens").cast("double")))
    )
    top = per.agg(F.max("w_raw").alias("w_max"))
    return per.crossJoin(F.broadcast(top)).select(
        "source",
        "n_tokens",
        "w_raw",
        (F.col("w_raw") / F.col("w_max")).alias("mix_weight"),
    )


_MIX_WEIGHTS_ORACLE = f"""
WITH per AS (
  SELECT source,
         CAST(sum(len({tx.tokens_sql("text")})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), w AS (
  SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w_raw FROM per
)
SELECT source, n_tokens, w_raw,
       w_raw / (SELECT max(w_raw) FROM w) AS mix_weight
FROM w
"""


# ---------------------------------------------------------------------------
# sub-document span dedup (C4-style duplicate-span removal signal)
# ---------------------------------------------------------------------------

#: tokens per non-overlapping span; a span repeated ANYWHERE in the corpus
#: marks all its occurrences as duplicated (C4 removed duplicate
#: three-sentence spans — the fixture corpus has no sentence punctuation,
#: so spans are fixed token blocks)
SPAN_TOKENS = 10

#: a document is kept when at most this fraction of its spans is duplicated
SPAN_MAX_DUP_FRAC = 0.5


def q_pipeline_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup signal: split every document into non-overlapping
    SPAN_TOKENS-token spans, count each span's corpus-wide occurrences, and
    report per document how many of its spans are duplicated (appear in any
    other position corpus-wide) plus the keep decision.

    Scale shape: a word-count over (span_hash) — explode to (doc_id,
    span_hash) pairs (never text: the hash is computed in the same map),
    one global hash-aggregate on span_hash with map-side partials, join the
    per-span counts back to the posting list (AQE picks the strategy — the
    hot-span dimension shrinks with dedup pressure), then one per-doc
    aggregate. Linear in corpus size; the widest shuffled row is 16 bytes.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    spans = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, int(size(toks) div {SPAN_TOKENS})), "
                    f"b -> md5(array_join(slice(toks, (b - 1) * {SPAN_TOKENS} + 1, "
                    f"{SPAN_TOKENS}), ' ')))"
                )
            ).alias("span_hash"),
        )
    )
    counts = spans.groupBy("span_hash").agg(F.count("*").alias("n_occ"))
    per_doc = (
        spans.join(counts, "span_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("n_occ") > 1).cast("long")).alias("n_dup_spans"),
        )
    )
    dup_frac = F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double")
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        dup_frac.alias("dup_span_frac"),
        (dup_frac <= SPAN_MAX_DUP_FRAC).alias("keep"),
    )


_SPAN_DEDUP_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), spans AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1,
             CAST(len(toks) // {SPAN_TOKENS} AS INT)),
           b -> md5(array_to_string(
             toks[(b - 1) * {SPAN_TOKENS} + 1 : b * {SPAN_TOKENS}], ' '))))
           AS span_hash
  FROM tok
), counts AS (
  SELECT span_hash, count(*) AS n_occ FROM spans GROUP BY 1
), per_doc AS (
  SELECT doc_id, count(*) AS n_spans,
         CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans
  FROM spans JOIN counts USING (span_hash)
  GROUP BY 1
)
SELECT doc_id, n_spans, n_dup_spans,
       CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE) AS dup_span_frac,
       CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE)
         <= {SPAN_MAX_DUP_FRAC} AS keep
FROM per_doc
"""


# ---------------------------------------------------------------------------
# corpus-frequency (commonness) scoring — the LM-perplexity proxy
# ---------------------------------------------------------------------------

def q_pipeline_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean corpus frequency of its tokens — the integer-
    exact stand-in for unigram-LM perplexity filtering (rare-token-heavy
    docs score low, boilerplate scores high; pipelines cut both tails).

    Plan: ONE token-count aggregate over the corpus (the unigram 'model'),
    broadcast back onto the exploded token stream, then a per-doc sum —
    integer sums with one final division, so both engines agree exactly.
    At 100 TB the unigram table is the only broadcast (vocab-sized) and
    everything else is map-side + one per-doc aggregate.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.withColumn("toks", tx.tokens_col("text")).select(
        "doc_id", F.explode("toks").alias("token")
    )
    freqs = toks.groupBy("token").agg(F.count("*").alias("tok_freq"))
    # vocab grows with the corpus (Heaps' law — plus URLs/typos), so the
    # frequency join is left to AQE rather than force-broadcast
    return (
        toks.join(freqs, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("tok_freq").alias("sum_freq"),
        )
        .withColumn(
            "mean_token_freq",
            F.col("sum_freq").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


_COMMONNESS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({tx.tokens_sql("text")}) AS token FROM documents
), freqs AS (
  SELECT token, count(*) AS tok_freq FROM toks GROUP BY 1
)
SELECT doc_id, count(*) AS n_tokens, CAST(sum(tok_freq) AS BIGINT) AS sum_freq,
       CAST(sum(tok_freq) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_token_freq
FROM toks JOIN freqs USING (token)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# token-budget corpus selection (greedy by quality until the budget is spent)
# ---------------------------------------------------------------------------

#: stop admitting documents once the selected corpus reaches this many tokens
TOKEN_BUDGET = 12_000


def q_pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the highest-quality documents (quality proxy: distinct-token
    count, ties by doc_id) until a token budget is spent — the "give me the
    best N-token corpus" operator every training-mix pipeline ends with.

    Scale shape: the naive form is a GLOBAL sort + running sum — one
    partition holding the whole corpus. Instead: (1) aggregate token totals
    per score value (map-side partials; the score domain is bounded by the
    max per-doc token count, i.e. tiny); (2) a running sum over that tiny
    score frame gives each score bucket its starting offset — the only
    single-partition step touches ~dozens of rows, never documents; (3) a
    window partitioned BY SCORE (parallel across buckets) adds the
    within-bucket running sum, and a plain filter keeps docs whose
    inclusive running total fits the budget. Identical result to the global
    cumsum, with the corpus only ever shuffled on the score key."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        F.size(F.array_distinct(tx.tokens_col("text"))).alias("score"),
        F.size(tx.tokens_col("text")).alias("n_tokens"),
    )
    buckets = scored.groupBy("score").agg(F.sum("n_tokens").alias("bucket_tokens"))
    bucket_w = (
        Window.orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = buckets.select(
        "score",
        (F.sum("bucket_tokens").over(bucket_w) - F.col("bucket_tokens")).alias(
            "prev_tokens"
        ),
    )
    doc_w = (
        Window.partitionBy("score")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.join(F.broadcast(offsets), "score")
        .withColumn(
            "running_tokens",
            F.col("prev_tokens") + F.sum("n_tokens").over(doc_w),
        )
        .filter(F.col("running_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "score", "n_tokens", "running_tokens")
    )


_TOKEN_BUDGET_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
    len(list_distinct({tx.tokens_sql("text")})) AS score,
    len({tx.tokens_sql("text")}) AS n_tokens
  FROM documents
), run AS (
  SELECT doc_id, score, n_tokens,
    CAST(sum(n_tokens) OVER (
      ORDER BY score DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS running_tokens
  FROM scored
)
SELECT doc_id, score, n_tokens, running_tokens
FROM run WHERE running_tokens <= {TOKEN_BUDGET}
"""


# ---------------------------------------------------------------------------
# token-length histogram on power-of-2 buckets (batch-shape planning input)
# ---------------------------------------------------------------------------

def q_pipeline_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length distribution on power-of-2 buckets — the table a
    sequence-packing / batch-shape planner reads to pick context lengths.
    The bucket is ``2^floor(log2(n))`` computed as bit-length arithmetic
    (integer-exact in both engines, no float log); one scan, one tiny
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tx.tokens_col("text"))
    # integer log2: length of the binary representation minus 1
    bucket_lo = F.expr(
        "shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens)) - 1)"
    )
    return (
        docs.select(n_tokens.alias("n_tokens"))
        .select("n_tokens", bucket_lo.alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


_LENGTH_HISTOGRAM_ORACLE = f"""
WITH n AS (
  SELECT len({tx.tokens_sql("text")}) AS n_tokens FROM documents
), b AS (
  SELECT n_tokens,
         CAST(1 AS BIGINT) << (CAST(floor(log2(n_tokens)) AS INT)) AS bucket_lo
  FROM n
)
SELECT bucket_lo, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
FROM b GROUP BY bucket_lo
"""


# ---------------------------------------------------------------------------
# dataset card: the one-row corpus datasheet
# ---------------------------------------------------------------------------

def q_pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus datasheet a training run records next to its checkpoint:
    size, token counts, language/source spread, exact-duplication rate,
    and the Gopher-gate pass rate — ONE scan, per-doc projections, one
    scalar aggregate (every count integer-exact; the two rates are single
    IEEE divisions at the very end)."""
    from mysql_streamer_spark.queries.textops import (
        GOPHER_MAX_TOKENS,
        GOPHER_MAX_TOP_TOKEN_FRAC,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_TOKENS,
        GOPHER_WORDLEN_HI,
        GOPHER_WORDLEN_LO,
    )

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.withColumn("toks", tx.tokens_col("text")).select(
        "lang",
        "source",
        F.md5("text").alias("text_hash"),
        F.size("toks").alias("n_tokens"),
        (
            tx.token_length_sum_col().cast("double") / F.size("toks").cast("double")
        ).alias("mean_word_len"),
        tx.stopword_hits_col("en").alias("stop_hits"),
        F.expr(
            "CAST(array_max(transform(array_distinct(toks), "
            "t -> size(filter(toks, x -> x = t)))) AS DOUBLE) "
            "/ CAST(size(toks) AS DOUBLE)"
        ).alias("top_token_frac"),
    )
    gopher = (
        F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
        & F.col("mean_word_len").between(GOPHER_WORDLEN_LO, GOPHER_WORDLEN_HI)
        & (F.col("stop_hits") >= GOPHER_MIN_STOP_HITS)
        & (F.col("top_token_frac") <= GOPHER_MAX_TOP_TOKEN_FRAC)
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (F.count("*") - F.countDistinct("text_hash")).alias("n_exact_dups"),
        F.sum(F.when(gopher, 1).otherwise(0)).alias("n_gopher_pass"),
    ).select(
        "n_docs",
        "total_tokens",
        "n_langs",
        "n_sources",
        "n_exact_dups",
        "n_gopher_pass",
        (F.col("n_exact_dups").cast("double") / F.col("n_docs").cast("double")).alias(
            "dup_rate"
        ),
        (
            F.col("n_gopher_pass").cast("double") / F.col("n_docs").cast("double")
        ).alias("gopher_pass_rate"),
    )


def _dataset_card_oracle() -> str:
    from mysql_streamer_spark.queries.textops import (
        GOPHER_MAX_TOKENS,
        GOPHER_MAX_TOP_TOKEN_FRAC,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_TOKENS,
        GOPHER_WORDLEN_HI,
        GOPHER_WORDLEN_LO,
    )

    return f"""
WITH per_doc AS (
  SELECT lang, source, md5(text) AS text_hash,
    len({tx.tokens_sql("text")}) AS n_tokens,
    CAST({tx.token_length_sum_sql(tx.tokens_sql("text"))} AS DOUBLE)
      / CAST(len({tx.tokens_sql("text")}) AS DOUBLE) AS mean_word_len,
    {tx.stopword_hits_sql("en", tx.tokens_sql("text"))} AS stop_hits,
    CAST(list_max(list_transform(list_distinct({tx.tokens_sql("text")}),
        t -> len(list_filter({tx.tokens_sql("text")}, x -> x = t)))) AS DOUBLE)
      / CAST(len({tx.tokens_sql("text")}) AS DOUBLE) AS top_token_frac
  FROM documents
), agg AS (
  SELECT count(*) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
    count(DISTINCT lang) AS n_langs,
    count(DISTINCT source) AS n_sources,
    count(*) - count(DISTINCT text_hash) AS n_exact_dups,
    CAST(sum(CASE WHEN n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}
         AND mean_word_len BETWEEN {GOPHER_WORDLEN_LO} AND {GOPHER_WORDLEN_HI}
         AND stop_hits >= {GOPHER_MIN_STOP_HITS}
         AND top_token_frac <= {GOPHER_MAX_TOP_TOKEN_FRAC}
         THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass
  FROM per_doc
)
SELECT n_docs, total_tokens, n_langs, n_sources, n_exact_dups, n_gopher_pass,
       CAST(n_exact_dups AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate,
       CAST(n_gopher_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS gopher_pass_rate
FROM agg
"""


# ---------------------------------------------------------------------------
# epoch shuffle: deterministic per-epoch reshuffling without a global sort
# ---------------------------------------------------------------------------

EPOCH_SHUFFLE_EPOCHS = (0, 1)
EPOCH_SHUFFLE_SHARDS = 8


def q_pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-epoch shuffling at 100 TB: a GLOBAL permutation needs a
    global sort (one range exchange over everything), so instead each
    epoch hashes docs into shards and orders WITHIN the shard by a second
    seeded hash — readers consume shards independently and every epoch's
    order is a fresh deterministic permutation (md5(seed || doc_id),
    re-runnable, no RNG state). One window per (epoch, shard) partition;
    nothing global. Both the shard nibble and the order key derive from
    md5, so the oracle replays the identical permutation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    from pyspark.sql import Window

    epochs = None
    for ep in EPOCH_SHUFFLE_EPOCHS:
        skey = F.md5(F.concat(F.lit(f"shard{ep}:"), F.col("doc_id").cast("string")))
        part = docs.select(
            F.lit(ep).alias("epoch"),
            "doc_id",
            (F.ascii(F.substring(skey, 1, 1)) % EPOCH_SHUFFLE_SHARDS).alias("shard"),
            F.md5(
                F.concat(F.lit(f"order{ep}:"), F.col("doc_id").cast("string"))
            ).alias("okey"),
        )
        epochs = part if epochs is None else epochs.unionByName(part)
    w = Window.partitionBy("epoch", "shard").orderBy("okey")
    return epochs.select(
        "epoch",
        "shard",
        "doc_id",
        F.row_number().over(w).alias("rank_in_shard"),
    )


def _epoch_shuffle_oracle() -> str:
    unions = "\nUNION ALL\n".join(
        f"""SELECT {ep} AS epoch,
       ascii(substring(md5('shard{ep}:' || CAST(doc_id AS VARCHAR)), 1, 1))
         % {EPOCH_SHUFFLE_SHARDS} AS shard,
       doc_id,
       md5('order{ep}:' || CAST(doc_id AS VARCHAR)) AS okey
FROM documents"""
        for ep in EPOCH_SHUFFLE_EPOCHS
    )
    return f"""
WITH epochs AS (
{unions}
)
SELECT epoch, shard, doc_id,
       row_number() OVER (PARTITION BY epoch, shard ORDER BY okey)
         AS rank_in_shard
FROM epochs
"""


# ---------------------------------------------------------------------------
# model-based quality scoring (hashing-trick linear classifier)
# ---------------------------------------------------------------------------

#: Classifier gate: keep a document when its mean per-token score clears
#: this bar, expressed as a cross-multiplied integer bound (score_sum >=
#: SCORE_NUM * n_toks / SCORE_DEN) so neither engine divides.
MODEL_SCORE_NUM = 1
MODEL_SCORE_DEN = 2


#: anneal phase consumes 1/ANNEAL_DIVISOR of the total token budget
ANNEAL_DIVISOR = 5


def q_pipeline_anneal_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase training mix — the midtraining/anneal pattern (Llama-3 /
    MiniCPM style): the final 1/ANNEAL_DIVISOR of the token budget
    re-samples only sources whose mean model-quality score beats the
    corpus mean, proportionally to their token mass. Per source: token
    mass, score sum, the anneal gate, the allocated anneal tokens, and
    the implied epochs over that source in micro-units.

    Exactness: the gate is the integer cross-multiplication
    sum_s * tokens_total > score_total * tokens_s (means compared without
    division); allocations are BIGINT ``div``. At true 100 TB token
    counts the budget*mass product nears the int64 edge — production
    would compute the per-source ratio at reduced precision; the shape
    (two 1-row broadcasts onto a source-count-row dimension) is scale-free.

    Scale shape: ONE map-side scan aggregates (tokens, score) per source;
    everything after runs on the #sources-row dimension."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    per = docs.groupBy("source").agg(
        F.sum(F.size("toks")).alias("n_tokens"),
        F.sum(tx.model_score_col()).alias("score_sum"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum("score_sum").alias("tot_score"),
    )
    gated = per.crossJoin(F.broadcast(tot)).withColumn(
        "anneal_pass",
        F.col("score_sum") * F.col("tot_tokens")
        > F.col("tot_score") * F.col("n_tokens"),
    )
    qual = gated.agg(
        F.sum(F.when(F.col("anneal_pass"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("qual_tokens")
    )
    alloc = F.when(
        F.col("anneal_pass"),
        F.expr(f"(tot_tokens div {ANNEAL_DIVISOR}) * n_tokens div qual_tokens"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        gated.crossJoin(F.broadcast(qual))
        .withColumn("anneal_tokens", alloc)
        .select(
            "source",
            "n_tokens",
            "score_sum",
            "anneal_pass",
            "anneal_tokens",
            F.expr("1000000 * anneal_tokens div n_tokens").alias(
                "anneal_epochs_micros"
            ),
        )
    )


_ANNEAL_MIX_ORACLE = f"""
WITH per AS (
  SELECT source,
         CAST(sum(len({tx.tokens_sql("text")})) AS BIGINT) AS n_tokens,
         CAST(sum({tx.model_score_sql(tx.tokens_sql("text"))}) AS BIGINT)
           AS score_sum
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         CAST(sum(score_sum) AS BIGINT) AS tot_score
  FROM per
), gated AS (
  SELECT per.*, tot.*,
         score_sum * tot_tokens > tot_score * n_tokens AS anneal_pass
  FROM per CROSS JOIN tot
), qual AS (
  SELECT CAST(sum(CASE WHEN anneal_pass THEN n_tokens ELSE 0 END) AS BIGINT)
    AS qual_tokens
  FROM gated
)
SELECT source, n_tokens, score_sum, anneal_pass,
       CASE WHEN anneal_pass
            THEN (tot_tokens // {ANNEAL_DIVISOR}) * n_tokens // qual_tokens
            ELSE 0 END AS anneal_tokens,
       1000000 * (CASE WHEN anneal_pass
            THEN (tot_tokens // {ANNEAL_DIVISOR}) * n_tokens // qual_tokens
            ELSE 0 END) // n_tokens AS anneal_epochs_micros
FROM gated CROSS JOIN qual
"""


def q_pipeline_model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the fineweb-edu / DCLM-style
    classifier gate that follows the heuristic rules in a modern corpus
    pipeline. The 'model' is a hashing-trick linear scorer: each token's
    weight is derived closed-form from md5 (text.model_weight_expr_*), the
    document score is the integer dot product <w, bag-of-words>, and the
    gate is a cross-multiplied integer threshold on the mean weight.

    Scale shape: in production the weight vector is a learned array
    broadcast to executors and indexed by feature hash; deriving it from
    the hash keeps the whole operator a map-side projection in whole-stage
    codegen — ZERO shuffles, no Python, and the oracle replays it exactly.
    A 100 TB corpus scores in one scan at input-bandwidth speed."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    n_toks = F.size("toks")
    score = tx.model_score_col()
    return docs.select(
        "doc_id",
        "source",
        n_toks.alias("n_toks"),
        score.alias("score_sum"),
        (
            score * MODEL_SCORE_DEN >= F.lit(MODEL_SCORE_NUM) * n_toks
        ).alias("quality_pass"),
    )


_MODEL_SCORE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {tx.tokens_sql("text")} AS toks FROM documents
)
SELECT doc_id, source,
       len(toks) AS n_toks,
       {tx.model_score_sql()} AS score_sum,
       {tx.model_score_sql()} * {MODEL_SCORE_DEN}
         >= {MODEL_SCORE_NUM} * len(toks) AS quality_pass
FROM tok
"""


# ---------------------------------------------------------------------------
# model-score calibration (reliability diagram vs the heuristic rules)
# ---------------------------------------------------------------------------

#: reliability-diagram bins per unit of mean token weight — the per-doc
#: mean weight lives in [-MODEL_WEIGHT_CENTER, MODEL_WEIGHT_CENTER], so
#: half-unit bins bound the output at <= 2*15*2+1 rows at ANY corpus size
CAL_BINS_PER_UNIT = 2


def q_pipeline_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the model-based quality scorer against the
    heuristic rule gate — the calibration audit run before trusting a
    cheap classifier to route a 100 TB corpus (does a higher model score
    actually mean a higher chance of passing the C4/Gopher rules?). Each
    document's mean token weight is binned into fixed half-unit cells;
    per cell the table reports the document count, the rule-pass count
    and rate, and the exact integer score/token totals (so the reader can
    recover the exact per-bin mean without any float accumulation).

    The bin index is floor((score_sum * BINS) / n_toks) computed as ONE
    IEEE double division then floor — bit-identical cross-engine, and
    floor (not integer division) so negative means bin toward -inf the
    same way in both engines.

    Scale shape: pure map-side scoring + rule evaluation (the same
    zero-shuffle projection as pipeline_model_quality_score) followed by
    ONE hash aggregate on a bounded bin key (<= 61 cells) — map-side
    partials collapse every partition to the bin dimension before the
    shuffle. No windows, no Python, no text moves."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    rules = _rule_cols()
    rule_pass = None
    for col in rules.values():
        rule_pass = col if rule_pass is None else (rule_pass & col)
    n_toks = F.size("toks")
    score = tx.model_score_col()
    binned = docs.select(
        F.floor(
            score.cast("double") * CAL_BINS_PER_UNIT / n_toks.cast("double")
        ).alias("score_bin"),
        rule_pass.cast("long").alias("rule_pass"),
        score.alias("score_sum"),
        n_toks.alias("n_toks"),
    )
    return (
        binned.groupBy("score_bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("rule_pass").alias("n_rule_pass"),
            F.sum("score_sum").alias("sum_score"),
            F.sum("n_toks").alias("sum_toks"),
        )
        .select(
            "score_bin",
            "n_docs",
            "n_rule_pass",
            (
                F.col("n_rule_pass").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("rule_pass_rate"),
            "sum_score",
            "sum_toks",
        )
    )


def _quality_calibration_oracle() -> str:
    rules = _rule_sqls()
    conj = " AND ".join(f"({sql})" for sql in rules.values())
    return f"""
WITH tok AS (
  SELECT doc_id, n_chars, {tx.tokens_sql("text")} AS toks FROM documents
), binned AS (
  SELECT
    CAST(floor(
      CAST({tx.model_score_sql()} AS DOUBLE) * {CAL_BINS_PER_UNIT}
        / CAST(len(toks) AS DOUBLE)
    ) AS BIGINT) AS score_bin,
    CASE WHEN {conj} THEN 1 ELSE 0 END AS rule_pass,
    {tx.model_score_sql()} AS score_sum,
    len(toks) AS n_toks
  FROM tok
)
SELECT score_bin,
       count(*) AS n_docs,
       CAST(sum(rule_pass) AS BIGINT) AS n_rule_pass,
       CAST(sum(rule_pass) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS rule_pass_rate,
       CAST(sum(score_sum) AS BIGINT) AS sum_score,
       CAST(sum(n_toks) AS BIGINT) AS sum_toks
FROM binned
GROUP BY score_bin
"""


# ---------------------------------------------------------------------------
# full corpus-prep cascade (one-row cross-family attrition report)
# ---------------------------------------------------------------------------

def q_pipeline_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-prep cascade as ONE attrition report: raw corpus →
    eval carve-out → exact dedup (keep min doc_id per content hash) →
    quality rules → benchmark decontamination. Each stage is the
    already-verified operator; this query composes them the way the real
    pipeline runs them and reports cumulative survivor counts — the
    dataset-card number everyone asks for ("how much is left after
    cleaning?").

    Scale shape: one corpus scan computes tokens + rule flags map-side;
    exact-dup keeper is one window on md5(text) (the same shuffle the
    dedup stage itself pays); the contamination flag joins against the
    (small) contaminated-id set — id-only. Final answer is a single
    scalar aggregate."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    rules = _rule_cols()
    passes = None
    for col in rules.values():
        passes = col if passes is None else (passes & col)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    contam = contaminated_docs(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.lit(True).alias("is_contaminated")
    )
    flagged = (
        docs.select(
            "doc_id",
            (F.col("doc_id") % EVAL_MODULUS != 0).alias("is_train"),
            (F.row_number().over(w) == 1).alias("is_exact_keeper"),
            passes.alias("is_quality"),
        )
        .join(contam, "doc_id", "left")
        .withColumn("is_clean", F.col("is_contaminated").isNull())
    )
    train = F.col("is_train")
    kept = train & F.col("is_exact_keeper")
    quality = kept & F.col("is_quality")
    final = quality & F.col("is_clean")
    return flagged.agg(
        F.count("*").alias("n_raw"),
        F.sum(train.cast("long")).alias("n_train"),
        F.sum(kept.cast("long")).alias("n_exact_kept"),
        F.sum(quality.cast("long")).alias("n_quality"),
        F.sum(final.cast("long")).alias("n_final"),
        (F.sum(final.cast("long")) * 100 / F.count("*")).alias("final_pct"),
    )


def _dedup_cascade_oracle() -> str:
    rules = _rule_sqls()
    conj = " AND ".join(f"({sql})" for sql in rules.values())
    return f"""
WITH tok AS (
  SELECT doc_id, text, n_chars, source, {tx.tokens_sql("text")} AS toks
  FROM documents
), contam AS (
  SELECT DISTINCT doc_id FROM ({_DECONTAMINATE_ORACLE}) c
), flagged AS (
  SELECT doc_id,
         doc_id % {EVAL_MODULUS} != 0 AS is_train,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
           AS is_exact_keeper,
         ({conj}) AS is_quality,
         doc_id NOT IN (SELECT doc_id FROM contam) AS is_clean
  FROM tok
)
SELECT
  CAST(count(*) AS BIGINT) AS n_raw,
  CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
  CAST(sum(CASE WHEN is_train AND is_exact_keeper THEN 1 ELSE 0 END) AS BIGINT)
    AS n_exact_kept,
  CAST(sum(CASE WHEN is_train AND is_exact_keeper AND is_quality
           THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
  CAST(sum(CASE WHEN is_train AND is_exact_keeper AND is_quality AND is_clean
           THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
  CAST(sum(CASE WHEN is_train AND is_exact_keeper AND is_quality AND is_clean
           THEN 1 ELSE 0 END) AS DOUBLE) * 100 / CAST(count(*) AS DOUBLE)
    AS final_pct
FROM flagged
"""


# ---------------------------------------------------------------------------
# multi-signal curation (text quality x embedding-space gate)
# ---------------------------------------------------------------------------

#: Embedding admission: quantized norm² must clear this floor — the
#: "drop near-zero/degenerate vectors" gate every embedding-based
#: curation stage runs before similarity work (a zero-norm vector joins
#: every cosine bucket and poisons ANN).
EMB_NORM_SQ_MIN = 100_000


def q_pipeline_multisignal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation by BOTH modalities: the text-side classifier gate joined
    with the embedding-side norm gate on the shared document id — the
    multi-signal admission a modern corpus pipeline runs when text alone
    over-admits (boilerplate scores fine lexically but collapses in
    embedding space). Reports per (source, label): totals and survivors
    of each gate and their conjunction.

    Scale shape: the two gates are map-side projections of their own
    scans; one equi-join on the id (AQE picks broadcast while the
    embedding side fits, shuffle-join beyond) and one small aggregate.
    Nothing wide moves — the embedding array dies inside its scan
    stage."""
    from mysql_streamer_spark import vectors as vx

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    text_side = docs.select(
        "doc_id",
        "source",
        (
            tx.model_score_col() * MODEL_SCORE_DEN
            >= F.lit(MODEL_SCORE_NUM) * F.size("toks")
        ).alias("text_pass"),
    )
    emb = vx.with_quantized(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("doc_id"),
        "label",
        (F.col("nrm") >= EMB_NORM_SQ_MIN).alias("emb_pass"),
    )
    joined = text_side.join(emb, "doc_id")
    return joined.groupBy("source", "label").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("text_pass").cast("long")).alias("n_text_pass"),
        F.sum(F.col("emb_pass").cast("long")).alias("n_emb_pass"),
        F.sum((F.col("text_pass") & F.col("emb_pass")).cast("long")).alias(
            "n_both_pass"
        ),
    )


def _multisignal_oracle() -> str:
    from mysql_streamer_spark import vectors as vx

    return f"""
WITH text_side AS (
  SELECT doc_id, source,
         {tx.model_score_sql(tx.tokens_sql("text"))} * {MODEL_SCORE_DEN}
           >= {MODEL_SCORE_NUM} * len({tx.tokens_sql("text")}) AS text_pass
  FROM documents
), emb AS (
  SELECT vec_id AS doc_id, label,
         {vx.norm_sq_sql(vx.quantized_sql("embedding"))} >= {EMB_NORM_SQ_MIN}
           AS emb_pass
  FROM embeddings
)
SELECT source, label,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN text_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_text_pass,
       CAST(sum(CASE WHEN emb_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_emb_pass,
       CAST(sum(CASE WHEN text_pass AND emb_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both_pass
FROM text_side JOIN emb USING (doc_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# packing-efficiency report (padding waste per source)
# ---------------------------------------------------------------------------

def q_pipeline_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The number that tunes PACK_BUDGET_TOKENS: per source, how many
    training sequences the packer emits, their mean fill, and the
    padding-waste fraction (1 - tokens/capacity) — every padded token is
    compute burned on nothing, so at trillion-token scale a few percent
    here is whole GPU-days. Derived from the same packing plan
    (one extra aggregate over its ~|sequences| output rows); sequences
    that a document OVERFLOWS past the budget count at their real length
    (capacity = max(budget, seq_tokens)), matching the packer's
    contiguous-fill semantics."""
    seqs = q_pipeline_pack_sequences(spark, sf_dir)
    cap = F.greatest(F.col("seq_tokens"), F.lit(PACK_BUDGET_TOKENS))
    per = seqs.groupBy("source").agg(
        F.count("*").alias("n_seqs"),
        F.sum("seq_tokens").alias("packed_tokens"),
        F.sum(cap).alias("capacity_tokens"),
    )
    return per.select(
        "source",
        "n_seqs",
        "packed_tokens",
        "capacity_tokens",
        (
            1.0
            - F.col("packed_tokens").cast("double")
            / F.col("capacity_tokens").cast("double")
        ).alias("padding_waste"),
    )


def _pack_efficiency_oracle() -> str:
    return f"""
WITH seqs AS ({_PACK_ORACLE}), capped AS (
  SELECT source, seq_tokens,
         greatest(seq_tokens, {PACK_BUDGET_TOKENS}) AS cap
  FROM seqs
)
SELECT source,
       count(*) AS n_seqs,
       CAST(sum(seq_tokens) AS BIGINT) AS packed_tokens,
       CAST(sum(cap) AS BIGINT) AS capacity_tokens,
       1.0 - CAST(sum(seq_tokens) AS DOUBLE) / CAST(sum(cap) AS DOUBLE)
         AS padding_waste
FROM capped
GROUP BY source
"""


# ---------------------------------------------------------------------------
# curriculum ordering manifest (quality bands, interleaved schedule)
# ---------------------------------------------------------------------------

#: number of quality bands in the curriculum
CURRICULUM_BANDS = 4


def q_pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order manifest: rank documents by the (integer-exact)
    model quality score, cut rank-based quartile bands, and interleave
    the bands round-robin — the band-stratified schedule that keeps every
    training window sampling the full difficulty spectrum (a pure
    easy→hard curriculum is the degenerate band_rank ordering, also
    derivable from this output). Rank-based bands (not value quantiles)
    keep everything integer so both engines agree exactly.

    Scale shape (the zipWithIndex pattern): repartitionByRange on the
    sort key gives ordered, non-overlapping partitions; the global rank
    is a PARALLEL per-partition row_number plus a broadcast cumulative
    offset computed from the per-partition counts (a bounded
    #partitions-row frame). band, band_rank, and interleave_rank are all
    closed-form over the global rank — a rank band is a contiguous rank
    range, so band_rank = r - ceil((band-1)*n/B) needs no second window.
    The ranged frame is persisted so the count branch and the rank branch
    see the SAME sampled range boundaries."""
    docs = load_table(spark, sf_dir, "documents")
    scored = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select("doc_id", tx.model_score_col().alias("score"))
    )
    B = CURRICULUM_BANDS
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = scored.repartitionByRange(
        nparts, F.col("score").asc(), F.col("doc_id").asc()
    ).withColumn("pid", F.spark_partition_id())
    # range sampling is re-drawn per computation; persist so both
    # consumers below agree on partition boundaries
    parts = parts.persist()
    counts = parts.groupBy("pid").agg(F.count("*").alias("cnt"))
    w_prior = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_prior), F.lit(0)).alias("offset"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.col("score").asc(), F.col("doc_id").asc()
    )
    return (
        parts.withColumn("lr", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .withColumn("r", F.col("offset") + F.col("lr"))
        .withColumn("band", F.expr(f"((r - 1) * {B}) div n + 1").cast("int"))
        .withColumn("band_start", F.expr(f"((band - 1) * n + {B} - 1) div {B}"))
        .select(
            "doc_id",
            "score",
            "band",
            (F.col("r") - F.col("band_start")).alias("band_rank"),
            (
                (F.col("r") - F.col("band_start") - 1) * B + F.col("band")
            ).alias("interleave_rank"),
        )
    )


_CURRICULUM_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, {tx.model_score_sql(tx.tokens_sql("text"))} AS score
  FROM documents
), ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score ASC, doc_id ASC) AS r,
         count(*) OVER () AS n
  FROM scored
), banded AS (
  SELECT doc_id, score, r,
         CAST((r - 1) * {CURRICULUM_BANDS} // n + 1 AS INT) AS band
  FROM ranked
)
SELECT doc_id, score, band,
       CAST(row_number() OVER (PARTITION BY band ORDER BY r) AS BIGINT)
         AS band_rank,
       CAST((row_number() OVER (PARTITION BY band ORDER BY r) - 1)
            * {CURRICULUM_BANDS} + band AS BIGINT) AS interleave_rank
FROM banded
"""


# ---------------------------------------------------------------------------
# DSIR-style importance score (hashed n-gram distribution ratio)
# ---------------------------------------------------------------------------

#: hashing-trick feature space for the importance model
DSIR_BUCKETS = 512

#: Integer log2 proxy: length(bin(x)) = floor(log2(x)) + 1 for x >= 1 —
#: exact in BOTH engines (no float log), so the importance score is a pure
#: integer sum. The +1 inside shifts zero counts to bin(1).
_DSIR_BITLEN_SPARK = "length(bin({x} + 1))"
_DSIR_BITLEN_SQL = "length(bin({x} + 1))"


def q_pipeline_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): score every raw
    document by how much its hashed-unigram distribution looks like the
    TARGET distribution (here: the eval carve-out, doc_id ≡ 0 mod
    EVAL_MODULUS) versus the RAW pool — Σ over tokens of
    log2-proxy(target_count) - log2-proxy(raw_count) on the token's
    feature bucket. Real DSIR uses float log-likelihood ratios; the
    bit-length proxy keeps the ranking integer-exact so both engines
    agree bit-for-bit (the ordering, which drives selection, is what
    matters).

    Plan shape: one tokenize+explode pass computed once (persisted, two
    consumers); bucket counts are a DSIR_BUCKETS-row aggregate broadcast
    back onto the posting stream; one per-doc sum. Token text never
    shuffles — only (doc_id, bucket) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    is_target = F.col("doc_id") % EVAL_MODULUS == 0
    posting = (
        spread(docs)
        .withColumn("is_target", is_target)
        .select(
            "doc_id",
            "source",
            "is_target",
            F.explode(tx.tokens_col("text")).alias("t"),
        )
        .withColumn(
            "bucket",
            F.conv(
                F.substring(F.md5(F.concat(F.lit("dsir:"), F.col("t"))), 1, 8),
                16,
                10,
            ).cast("long")
            % DSIR_BUCKETS,
        )
        .drop("t")
        .persist()
    )
    counts = posting.groupBy("bucket").agg(
        F.sum(F.col("is_target").cast("long")).alias("tgt_n"),
        F.sum((~F.col("is_target")).cast("long")).alias("raw_n"),
    )
    scored = (
        posting.filter(~F.col("is_target"))
        .join(F.broadcast(counts), "bucket")
        .withColumn(
            "tok_score",
            F.expr(_DSIR_BITLEN_SPARK.format(x="tgt_n"))
            - F.expr(_DSIR_BITLEN_SQL.format(x="raw_n")),
        )
    )
    return scored.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_tokens"),
        F.sum("tok_score").cast("long").alias("dsir_score"),
    )


_DSIR_ORACLE = f"""
WITH posting AS (
  SELECT doc_id, source,
         doc_id % {EVAL_MODULUS} = 0 AS is_target,
         CAST('0x' || substring(md5('dsir:' || t), 1, 8) AS BIGINT)
           % {DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, source, unnest({tx.tokens_sql("text")}) AS t
        FROM documents)
), counts AS (
  SELECT bucket,
         sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tgt_n,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS raw_n
  FROM posting GROUP BY 1
), scored AS (
  SELECT doc_id, source,
         {_DSIR_BITLEN_SQL.format(x="tgt_n")}
           - {_DSIR_BITLEN_SQL.format(x="raw_n")} AS tok_score
  FROM posting JOIN counts USING (bucket)
  WHERE NOT is_target
)
SELECT doc_id, source, count(*) AS n_tokens,
       CAST(sum(tok_score) AS BIGINT) AS dsir_score
FROM scored GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# UniMax language-budget allocation (bounded-epoch waterfilling)
# ---------------------------------------------------------------------------

#: no language may repeat more than this many epochs (UniMax's cap);
#: 3 with a 2-epoch budget makes the cap BIND on the fixture's smallest
#: language, so both waterfill branches (saturated + even-split) are live
UNIMAX_MAX_EPOCHS = 3
#: total training budget as a multiple of the corpus token count (between
#: 1 and UNIMAX_MAX_EPOCHS so the waterfill actually splits: low-resource
#: languages saturate at the epoch cap, high-resource ones share the rest)
UNIMAX_BUDGET_EPOCHS = 2


def q_pipeline_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax (Chung et al. 2023) language sampling: allocate a global
    token budget across languages as uniformly as possible subject to a
    per-language epoch cap — low-resource languages take all their
    tokens up to UNIMAX_MAX_EPOCHS epochs; what remains is split evenly
    among high-resource ones. The closed-form waterfill: sort languages
    by cap ascending; a language saturates while cap_i*(L-i)+cumsum_i ≤
    budget; the remainder splits integer-evenly over the unsaturated
    tail (deterministic remainder distribution by rank). All integer
    arithmetic — both engines agree exactly.

    Plan shape: one tokenize aggregate to L rows, then windows over the
    L-row language dimension (L ≈ languages in the corpus — a designed
    singleton plan over a provably tiny aggregate, like the other
    summary queries)."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .groupBy("lang")
        .agg(F.sum(F.size("toks")).cast("long").alias("n_tokens"))
        .withColumn("cap_tokens", F.col("n_tokens") * UNIMAX_MAX_EPOCHS)
    )
    tot = per.agg(
        (F.sum("n_tokens") * UNIMAX_BUDGET_EPOCHS).cast("long").alias("budget"),
        F.count("*").alias("n_langs"),
    )
    w_ord = Window.orderBy(F.col("cap_tokens").asc(), F.col("lang").asc())
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("rk", F.row_number().over(w_ord))
        .withColumn("cumsum_cap", F.sum("cap_tokens").over(w_cum))
        .withColumn(
            "sat_raw",
            (
                F.col("cap_tokens") * (F.col("n_langs") - F.col("rk"))
                + F.col("cumsum_cap")
                <= F.col("budget")
            ).cast("int"),
        )
        .withColumn("saturated", F.min("sat_raw").over(w_cum) == 1)
        .withColumn(
            "k_sat", F.sum(F.col("saturated").cast("int")).over(w_all)
        )
        .withColumn(
            "sat_tokens",
            F.coalesce(
                F.sum(
                    F.when(F.col("saturated"), F.col("cap_tokens"))
                ).over(w_all),
                F.lit(0),
            ),
        )
    )
    ranked = ranked.withColumn(
        "n_unsat", F.col("n_langs") - F.col("k_sat")
    ).withColumn("leftover", F.col("budget") - F.col("sat_tokens"))
    # integer division (`div`), not float `/` + floor: exact at any corpus
    # size, and identical to the oracle's `//`
    base = F.expr("leftover div n_unsat")
    rem = F.col("leftover") % F.col("n_unsat")
    alloc = F.when(F.col("saturated"), F.col("cap_tokens")).otherwise(
        base + ((F.col("rk") - F.col("k_sat")) <= rem).cast("long")
    )
    return ranked.select(
        "lang",
        "n_tokens",
        "cap_tokens",
        "saturated",
        alloc.alias("alloc_tokens"),
        (alloc.cast("double") / F.col("n_tokens")).alias("epochs"),
    )


_UNIMAX_ORACLE = f"""
WITH per AS (
  SELECT lang,
         CAST(sum(len({tx.tokens_sql("text")})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), capd AS (
  SELECT lang, n_tokens, n_tokens * {UNIMAX_MAX_EPOCHS} AS cap_tokens FROM per
), tot AS (
  SELECT CAST(sum(n_tokens) * {UNIMAX_BUDGET_EPOCHS} AS BIGINT) AS budget,
         count(*) AS n_langs
  FROM per
), ranked AS (
  SELECT lang, n_tokens, cap_tokens, budget, n_langs,
         row_number() OVER (ORDER BY cap_tokens ASC, lang ASC) AS rk,
         sum(cap_tokens) OVER (ORDER BY cap_tokens ASC, lang ASC
           ROWS UNBOUNDED PRECEDING) AS cumsum_cap
  FROM capd CROSS JOIN tot
), flagged AS (
  SELECT *,
         CASE WHEN cap_tokens * (n_langs - rk) + cumsum_cap <= budget
              THEN 1 ELSE 0 END AS sat_raw
  FROM ranked
), prefixed AS (
  SELECT *,
         min(sat_raw) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) = 1
           AS saturated
  FROM flagged
), totals AS (
  SELECT *,
         sum(CASE WHEN saturated THEN 1 ELSE 0 END)
           OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS k_sat,
         coalesce(sum(CASE WHEN saturated THEN cap_tokens END)
           OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           0) AS sat_tokens
  FROM prefixed
)
SELECT lang, n_tokens, cap_tokens, saturated,
       CAST(CASE WHEN saturated THEN cap_tokens
            ELSE (budget - sat_tokens) // (n_langs - k_sat)
                 + CASE WHEN rk - k_sat <= (budget - sat_tokens)
                        % (n_langs - k_sat) THEN 1 ELSE 0 END
       END AS BIGINT) AS alloc_tokens,
       CAST(CASE WHEN saturated THEN cap_tokens
            ELSE (budget - sat_tokens) // (n_langs - k_sat)
                 + CASE WHEN rk - k_sat <= (budget - sat_tokens)
                        % (n_langs - k_sat) THEN 1 ELSE 0 END
       END AS DOUBLE) / n_tokens AS epochs
FROM totals
"""


# ---------------------------------------------------------------------------
# hashing-trick features (fastText-style linear-classifier statistics)
# ---------------------------------------------------------------------------

#: feature dimension for the hashing trick — deliberately small so bucket
#: collisions actually occur in the test corpus and the collision metric
#: (n_words > 1) is exercised, not vacuous
HASHED_FEATURE_DIM = 256


def q_pipeline_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words sufficient statistics per source — the feature
    extraction + training aggregates of a fastText-style linear quality
    classifier (the standard cheap doc-quality model in corpus pipelines):
    every token hashes into one of HASHED_FEATURE_DIM buckets (hashing
    trick, md5-based so both engines agree), and the per-(source, bucket)
    token count / document frequency / distinct-word (collision) count are
    exactly the sufficient statistics a multinomial NB or logistic model
    trains from.

    Scale shape: explode to (doc_id, source, w), hash map-side, ONE
    hash-aggregate on (source, bucket) with map-side partials (count and
    the two countDistincts partial-aggregate via Spark's two-phase
    distinct expansion); the result is <= n_sources x DIM rows — a model,
    not a dataset. Text never shuffles, only tokens."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "source", F.explode(tx.tokens_col("text")).alias("w")
    )
    feat = toks.withColumn(
        "bucket",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
        % HASHED_FEATURE_DIM,
    )
    return feat.groupBy("source", "bucket").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("w").alias("n_words"),
    )


_HASHED_FEATURES_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, unnest({tx.tokens_sql("text")}) AS w FROM documents
), f AS (
  SELECT doc_id, source, w,
         CAST('0x' || substring(md5(w), 1, 8) AS BIGINT)
           % {HASHED_FEATURE_DIM} AS bucket
  FROM tok
)
SELECT source, bucket,
       count(*) AS n_tokens,
       count(DISTINCT doc_id) AS n_docs,
       count(DISTINCT w) AS n_words
FROM f
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# BPE merge-pair counting — the tokenizer-training inner loop, vocab-sized
# ---------------------------------------------------------------------------

#: merge candidates reported (the first BPE iteration's ranking)
BPE_TOP_K = 40


def q_pipeline_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training (Sennrich et al.
    2016): count adjacent character pairs over the corpus, weighted by
    word frequency, and rank merge candidates. The load-bearing scale
    trick is the one real BPE trainers use — pair counting runs over the
    DISTINCT-WORD table (vocabulary-sized, Heaps-law sublinear) with
    each word's corpus frequency as a weight, never over the corpus
    itself; a 100 TB corpus costs one word-count aggregate plus work
    proportional to its vocabulary.

    Plan shape: one token-count hash-aggregate (map-side partials), a
    character-pair explode over distinct words only, one fixed-width
    pair aggregate, TakeOrdered top-K. Only (pair, count) rows move."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = (
        docs.select(F.explode(tx.tokens_col("text")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    pairs = words.select(
        "freq",
        "w",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> concat(substring(w, i, 1), '+', substring(w, i + 1, 1)))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").cast("long").alias("n_occurrences"),
            F.countDistinct("w").alias("n_words"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(BPE_TOP_K)
    )


_BPE_MERGES_ORACLE = f"""
WITH words AS (
  SELECT w, count(*) AS freq
  FROM (SELECT unnest({tx.tokens_sql("text")}) AS w FROM documents)
  WHERE length(w) >= 2
  GROUP BY 1
), pairs AS (
  SELECT freq, w, unnest(
    list_transform(generate_series(1, length(w) - 1),
      i -> substring(w, i, 1) || '+' || substring(w, i + 1, 1))) AS pair
  FROM words
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT w) AS BIGINT) AS n_words
FROM pairs GROUP BY 1
ORDER BY n_occurrences DESC, pair ASC
LIMIT {BPE_TOP_K}
"""


# ---------------------------------------------------------------------------
# quantized ROC-AUC — classifier evaluation without a global sort
# ---------------------------------------------------------------------------

#: score quantization buckets — the rank statistic runs over this bounded
#: dimension instead of a corpus-wide sort
AUC_BUCKETS = 256


def q_pipeline_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of a quality signal against gold labels — the evaluation
    every model-based filter needs before it gates a corpus. Signal: the
    English-stopword hit rate (the langid family's scoring feature);
    label: lang == 'en'. The AUC is the Mann-Whitney U statistic
    computed WITHOUT a global sort: scores quantize to AUC_BUCKETS
    integer buckets ((hits * B) div n_toks — exact integer arithmetic),
    per-bucket positive/negative counts aggregate with map-side
    partials, and U folds over the bounded bucket dimension with the
    standard half-credit for ties. 2U stays an exact integer; AUC is ONE
    final division, so both engines agree bit-for-bit.

    Scale shape: one map-side projection + one ≤B-row aggregate + a
    window over the bounded bucket dimension. A corpus-wide sort (the
    textbook AUC plan) would shuffle every row to order by score; this
    plan moves B rows. Quantization costs at most 1/B of rank
    resolution — the documented sketch tradeoff, same family as the
    quantile/CMS sketches.

    On the synthetic fixture the text is label-independent (every doc's
    words are English-like regardless of its ``lang`` tag), so the
    CORRECT answer is AUC ~ 0.5 — the operator reporting a near-null
    result on a signal-free corpus is the honest behaviour, and the
    invariant test verifies the U-statistic against an independent exact
    recomputation rather than against signal strength."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    scored = docs.select(
        (F.col("lang") == "en").alias("is_pos"),
        # exact integer arithmetic: counts are far below 2^53, so the
        # floored double division equals integer division in both engines
        F.floor(
            (tx.stopword_hits_col("en") * AUC_BUCKETS).cast("long")
            / F.greatest(F.size("toks"), F.lit(1)).cast("long")
        )
        .cast("long")
        .alias("bucket"),
    )
    per_bucket = scored.groupBy("bucket").agg(
        F.sum(F.col("is_pos").cast("long")).alias("p_b"),
        F.sum((~F.col("is_pos")).cast("long")).alias("n_b"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    folded = per_bucket.withColumn(
        "cum_n_below", F.coalesce(F.sum("n_b").over(w), F.lit(0))
    ).select(
        (F.col("p_b") * (2 * F.col("cum_n_below") + F.col("n_b"))).alias("u2_b"),
        "p_b",
        "n_b",
    )
    agg = folded.agg(
        F.sum("p_b").cast("long").alias("n_pos"),
        F.sum("n_b").cast("long").alias("n_neg"),
        F.sum("u2_b").cast("long").alias("u2"),
    )
    auc = F.col("u2").cast("double") / (
        F.lit(2.0) * (F.col("n_pos") * F.col("n_neg")).cast("double")
    )
    return agg.select(
        "n_pos", "n_neg", "u2", auc.alias("auc"),
        (auc * 2 - 1).alias("gini"),
    )


_SCORE_AUC_ORACLE = f"""
WITH scored AS (
  SELECT lang = 'en' AS is_pos,
         CAST(({tx.stopword_hits_sql("en", tx.tokens_sql("text"))} * {AUC_BUCKETS})
           // greatest(len({tx.tokens_sql("text")}), 1) AS BIGINT) AS bucket
  FROM documents
), per_bucket AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS p_b,
         CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM scored GROUP BY 1
), folded AS (
  SELECT p_b, n_b,
         COALESCE(CAST(sum(n_b) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS cum_n_below
  FROM per_bucket
), agg AS (
  SELECT CAST(sum(p_b) AS BIGINT) AS n_pos,
         CAST(sum(n_b) AS BIGINT) AS n_neg,
         CAST(sum(p_b * (2 * cum_n_below + n_b)) AS BIGINT) AS u2
  FROM folded
)
SELECT n_pos, n_neg, u2,
       CAST(u2 AS DOUBLE) / (2.0 * CAST(n_pos * n_neg AS DOUBLE)) AS auc,
       CAST(u2 AS DOUBLE) / (2.0 * CAST(n_pos * n_neg AS DOUBLE)) * 2 - 1
         AS gini
FROM agg
"""


# ---------------------------------------------------------------------------
# padding-waste audit — what length-bucketed batching buys the dataloader
# ---------------------------------------------------------------------------

#: dataloader batch size for the padding audit
PAD_BATCH = 16
#: (strategy label, length-bucket width in tokens); the id-shard baseline
#: batches in doc_id order with no length awareness
PAD_STRATEGIES = (("bucket_w64", 64), ("bucket_w16", 16))
#: id-shard width for the no-length-awareness baseline
PAD_ID_SHARD = 64


def q_pipeline_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit of dataloader batching strategies: every
    fixed-length batch pads its members to the batch max, and the audit
    quantifies how much compute that padding burns for (a) the baseline
    — batches formed in doc_id order within id-shards, the shard-local
    batching every distributed dataloader does — versus (b) length-
    bucketed batching at two granularities. Waste per batch is
    count*max(len) - sum(len), exact integers; waste_frac is ONE final
    division. The measured ordering (finer buckets => less padding) is
    asserted in tests.

    Scale shape: every strategy's row_number window partitions by its
    bucket key (id-shards or length buckets — both bounded-width
    partitions), batches aggregate by (bucket, batch) with map-side
    partials, and each strategy reduces to one summary row. No global
    sort, no unpartitioned window; only (bucket, len) pairs move."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    lens = docs.select(
        "doc_id", F.size(tx.tokens_col("text")).alias("n_toks")
    )

    def strategy(label: str, bucket_col) -> DataFrame:
        win = Window.partitionBy("bucket").orderBy("doc_id")
        batched = (
            lens.withColumn("bucket", bucket_col)
            .withColumn("seq", F.row_number().over(win))
            .withColumn("batch", (F.col("seq") - 1) / PAD_BATCH)
            .withColumn("batch", F.floor("batch"))
        )
        per_batch = batched.groupBy("bucket", "batch").agg(
            F.count("*").alias("cnt"),
            F.max("n_toks").alias("mx"),
            F.sum("n_toks").alias("useful"),
        )
        return per_batch.agg(
            F.lit(label).alias("strategy"),
            F.count("*").alias("n_batches"),
            F.sum(F.col("cnt") * F.col("mx")).cast("long").alias("padded_tokens"),
            F.sum("useful").cast("long").alias("useful_tokens"),
        )

    out = strategy("id_shard", (F.col("doc_id") / PAD_ID_SHARD).cast("long"))
    for label, width in PAD_STRATEGIES:
        out = out.unionByName(
            strategy(label, (F.col("n_toks") / width).cast("long"))
        )
    return out.withColumn(
        "waste_frac",
        (F.col("padded_tokens") - F.col("useful_tokens")).cast("double")
        / F.col("padded_tokens").cast("double"),
    )


def _padding_oracle() -> str:
    def leg(label: str, bucket_expr: str) -> str:
        return f"""
  SELECT '{label}' AS strategy, count(*) AS n_batches,
         CAST(sum(cnt * mx) AS BIGINT) AS padded_tokens,
         CAST(sum(useful) AS BIGINT) AS useful_tokens
  FROM (
    SELECT bucket, batch, count(*) AS cnt, max(n_toks) AS mx,
           sum(n_toks) AS useful
    FROM (
      SELECT doc_id, n_toks, bucket,
             (row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
               // {PAD_BATCH} AS batch
      FROM (SELECT doc_id, n_toks, {bucket_expr} AS bucket FROM lens)
    )
    GROUP BY 1, 2
  )"""

    legs = [leg("id_shard", f"doc_id // {PAD_ID_SHARD}")]
    for label, width in PAD_STRATEGIES:
        legs.append(leg(label, f"n_toks // {width}"))
    union = "\n  UNION ALL\n".join(legs)
    return f"""
WITH lens AS (
  SELECT doc_id, len({tx.tokens_sql("text")}) AS n_toks FROM documents
), strategies AS (
{union}
)
SELECT strategy, n_batches, padded_tokens, useful_tokens,
       CAST(padded_tokens - useful_tokens AS DOUBLE)
         / CAST(padded_tokens AS DOUBLE) AS waste_frac
FROM strategies
"""


# ---------------------------------------------------------------------------
# output shard plan — the training-data writer's balance audit
# ---------------------------------------------------------------------------

#: number of output shards the writer would produce (at 100 TB this is
#: thousands; 64 keeps every shard populated from sf0.001 up)
N_SHARDS = 64
#: a shard is overloaded when its char mass exceeds this multiple of the
#: ideal 1/N share (integer cross-multiplication, no float threshold)
SHARD_SKEW_LIMIT = 2


def q_pipeline_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The writer-side shard plan a training-data export runs BEFORE the
    expensive write: every document is assigned a deterministic shard by
    content-independent id hash (md5 — stable across reruns and engine
    versions, unlike Spark's internal ``hash``), and the plan reports
    per-shard document/char/token mass plus a balance audit — the
    ``share_x_n`` column is 1.0 for a perfectly balanced shard and the
    ``overloaded`` flag trips at SHARD_SKEW_LIMIT x ideal, which is the
    condition under which a real writer would re-split before committing
    (skewed output files gate downstream dataloader throughput).

    Scale shape: shard assignment is a scan-projection expression (the
    same expression ``df.repartition(N_SHARDS, shard)`` would shuffle on
    — this query IS the dry run of that writer); ONE fixed-width
    (N_SHARDS-row) aggregate with map-side partials; the corpus total is
    a broadcast 1-row dimension. Nothing scales with corpus size except
    the scan."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    sharded = docs.select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shard:"), F.col("doc_id"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % N_SHARDS
        ).alias("shard"),
        "n_chars",
        F.size(tx.tokens_col("text")).alias("n_toks"),
    )
    per_shard = sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
    )
    totals = per_shard.agg(F.sum("total_chars").alias("corpus_chars"))
    return (
        per_shard.crossJoin(F.broadcast(totals))
        .select(
            "shard",
            F.format_string("part-%05d.parquet", F.col("shard").cast("int")).alias(
                "shard_file"
            ),
            "n_docs",
            "total_chars",
            "total_tokens",
            (
                (F.col("total_chars") * N_SHARDS).cast("double")
                / F.col("corpus_chars").cast("double")
            ).alias("share_x_n"),
            (
                F.col("total_chars") * N_SHARDS
                > F.lit(SHARD_SKEW_LIMIT) * F.col("corpus_chars")
            ).alias("overloaded"),
        )
    )


_SHARD_PLAN_ORACLE = f"""
WITH sharded AS (
  SELECT CAST('0x' || substring(md5('shard:' || doc_id), 1, 8) AS BIGINT)
           % {N_SHARDS} AS shard,
         n_chars,
         len({tx.tokens_sql("text")}) AS n_toks
  FROM documents
), per_shard AS (
  SELECT shard, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(sum(n_toks) AS BIGINT) AS total_tokens
  FROM sharded GROUP BY 1
), totals AS (
  SELECT CAST(sum(total_chars) AS BIGINT) AS corpus_chars FROM per_shard
)
SELECT shard,
       printf('part-%05d.parquet', shard) AS shard_file,
       n_docs, total_chars, total_tokens,
       CAST(total_chars * {N_SHARDS} AS DOUBLE)
         / CAST(corpus_chars AS DOUBLE) AS share_x_n,
       total_chars * {N_SHARDS} > {SHARD_SKEW_LIMIT} * corpus_chars
         AS overloaded
FROM per_shard CROSS JOIN totals
"""


# ---------------------------------------------------------------------------
# PPS systematic sampling — probability-proportional-to-size draws
# ---------------------------------------------------------------------------

#: target number of systematic sample points over the char-mass line
PPS_N_SAMPLE = 64


def q_pipeline_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sampling: lay
    every document's char mass end-to-end in a deterministic md5 order,
    then take one pick every ``stride = total div N`` chars starting at
    ``stride div 2`` — the textbook weighted sampler mixture construction
    uses when draws must be reproducible and big documents must be
    drawable more than once (a doc spanning k sample points yields
    multiplicity k). Output is the per-source audit: corpus char share vs
    realized pick share, which systematic sampling keeps within one pick
    per contiguous run by construction.

    Scale shape: the global running char total uses the zipWithIndex
    pattern (repartitionByRange on the md5 key -> per-partition cumsum +
    broadcast per-partition offsets; the only unpartitioned frame is the
    #partitions-row offset table). Pick multiplicity is closed-form from
    (cum_before, cum_after] — no sample-point table is ever materialized,
    and only (doc_id, source, two longs) move. All arithmetic is BIGINT
    with positive operands, so Spark ``div`` and DuckDB ``//`` agree."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("w"),
        F.md5(F.col("doc_id").cast("string")).alias("key"),
    )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = (
        docs.repartitionByRange(
            nparts, F.col("key").asc(), F.col("doc_id").asc()
        )
        .withColumn("pid", F.spark_partition_id())
        # range boundaries are sampled per computation; persist so the
        # offset branch and the cumsum branch agree on them
        .persist()
    )
    psums = parts.groupBy("pid").agg(F.sum("w").alias("cnt"))
    w_prior = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = psums.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_prior), F.lit(0)).alias("offset"),
    )
    total = docs.agg(F.sum("w").alias("total"))
    w_local = Window.partitionBy("pid").orderBy(
        F.col("key").asc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    laid = (
        parts.withColumn("lcum", F.sum("w").over(w_local))
        .join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(total))
        .withColumn("stride", F.expr(f"total div {PPS_N_SAMPLE}"))
        .withColumn("cum_after", F.col("offset") + F.col("lcum"))
        .withColumn("cum_before", F.col("cum_after") - F.col("w"))
        # picks land at (stride div 2) + k*stride; count of points in
        # (cum_before, cum_after] — the +stride bias keeps every div
        # operand positive so truncation == floor in both engines
        .withColumn(
            "n_picks",
            F.expr(
                "(cum_after + stride - (stride div 2)) div stride"
                " - (cum_before + stride - (stride div 2)) div stride"
            ),
        )
    )
    per_source = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        )
    )
    picked = (
        laid.filter(F.col("n_picks") > 0)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled_docs"),
            F.sum("n_picks").alias("n_picks"),
        )
    )
    return (
        per_source.join(picked, "source", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "total_chars",
            (
                F.col("total_chars").cast("double")
                / F.col("total").cast("double")
            ).alias("char_share"),
            F.coalesce(F.col("n_sampled_docs"), F.lit(0)).alias(
                "n_sampled_docs"
            ),
            F.coalesce(F.col("n_picks"), F.lit(0)).alias("n_picks"),
            (
                F.coalesce(F.col("n_picks"), F.lit(0)).cast("double")
                / F.lit(float(PPS_N_SAMPLE))
            ).alias("pick_share"),
        )
    )


_PPS_SAMPLE_ORACLE = f"""
WITH laid AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
         sum(CAST(n_chars AS BIGINT)) OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS cum_after
  FROM documents
), totals AS (
  SELECT CAST(sum(n_chars) AS BIGINT) AS total,
         CAST(sum(n_chars) AS BIGINT) // {PPS_N_SAMPLE} AS stride
  FROM documents
), picks AS (
  SELECT source,
         (cum_after + stride - (stride // 2)) // stride
           - (cum_after - w + stride - (stride // 2)) // stride AS n_picks
  FROM laid CROSS JOIN totals
), per_source AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY 1
), picked AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_sampled_docs,
         CAST(sum(n_picks) AS BIGINT) AS n_picks
  FROM picks WHERE n_picks > 0 GROUP BY 1
)
SELECT s.source, s.n_docs, s.total_chars,
       CAST(s.total_chars AS DOUBLE) / CAST(t.total AS DOUBLE)
         AS char_share,
       COALESCE(p.n_sampled_docs, 0) AS n_sampled_docs,
       COALESCE(p.n_picks, 0) AS n_picks,
       CAST(COALESCE(p.n_picks, 0) AS DOUBLE) / {float(PPS_N_SAMPLE)}
         AS pick_share
FROM per_source s
LEFT JOIN picked p ON s.source = p.source
CROSS JOIN totals t
"""


SPECS = [
    QuerySpec("pipeline_shard_plan", q_pipeline_shard_plan, _SHARD_PLAN_ORACLE),
    QuerySpec(
        "pipeline_pps_sample", q_pipeline_pps_sample, _PPS_SAMPLE_ORACLE
    ),
    QuerySpec("pipeline_bpe_merges", q_pipeline_bpe_merges, _BPE_MERGES_ORACLE),
    QuerySpec("pipeline_score_auc", q_pipeline_score_auc, _SCORE_AUC_ORACLE),
    QuerySpec(
        "pipeline_padding_waste", q_pipeline_padding_waste, _padding_oracle()
    ),
    QuerySpec("pipeline_decontaminate", q_pipeline_decontaminate, _DECONTAMINATE_ORACLE),
    QuerySpec(
        "pipeline_decontaminate_sweep",
        q_pipeline_decontaminate_sweep,
        _decontaminate_sweep_oracle(),
    ),
    QuerySpec(
        "pipeline_hashed_features",
        q_pipeline_hashed_features,
        _HASHED_FEATURES_ORACLE,
    ),
    QuerySpec("pipeline_dsir_score", q_pipeline_dsir_score, _DSIR_ORACLE),
    QuerySpec(
        "pipeline_curriculum_order", q_pipeline_curriculum_order, _CURRICULUM_ORACLE
    ),
    QuerySpec("pipeline_unimax_budget", q_pipeline_unimax_budget, _UNIMAX_ORACLE),
    QuerySpec(
        "pipeline_multisignal_filter",
        q_pipeline_multisignal_filter,
        _multisignal_oracle(),
    ),
    QuerySpec(
        "pipeline_model_quality_score",
        q_pipeline_model_quality_score,
        _MODEL_SCORE_ORACLE,
    ),
    QuerySpec(
        "pipeline_quality_calibration",
        q_pipeline_quality_calibration,
        _quality_calibration_oracle(),
    ),
    QuerySpec(
        "pipeline_dedup_cascade", q_pipeline_dedup_cascade, _dedup_cascade_oracle()
    ),
    QuerySpec(
        "pipeline_dataset_card", q_pipeline_dataset_card, _dataset_card_oracle()
    ),
    QuerySpec(
        "pipeline_epoch_shuffle", q_pipeline_epoch_shuffle, _epoch_shuffle_oracle()
    ),
    QuerySpec(
        "pipeline_length_histogram",
        q_pipeline_length_histogram,
        _LENGTH_HISTOGRAM_ORACLE,
    ),
    QuerySpec("pipeline_span_dedup", q_pipeline_span_dedup, _SPAN_DEDUP_ORACLE),
    QuerySpec("pipeline_token_budget", q_pipeline_token_budget, _TOKEN_BUDGET_ORACLE),
    QuerySpec("pipeline_chunk_udtf", q_pipeline_chunk_udtf, _CHUNK_UDTF_ORACLE),
    QuerySpec("pipeline_quality_funnel", q_pipeline_quality_funnel, _funnel_oracle()),
    QuerySpec(
        "pipeline_commonness_score", q_pipeline_commonness_score, _COMMONNESS_ORACLE
    ),
    QuerySpec(
        "pipeline_reservoir_sample", q_pipeline_reservoir_sample, _RESERVOIR_ORACLE
    ),
    QuerySpec("pipeline_mix_weights", q_pipeline_mix_weights, _MIX_WEIGHTS_ORACLE),
    QuerySpec("pipeline_anneal_mix", q_pipeline_anneal_mix, _ANNEAL_MIX_ORACLE),
    QuerySpec(
        "pipeline_chunk_documents", q_pipeline_chunk_documents, _CHUNK_ORACLE
    ),
    QuerySpec("pipeline_vocab_topk", q_pipeline_vocab_topk, _VOCAB_ORACLE),
    QuerySpec("pipeline_train_val_split", q_pipeline_train_val_split, _SPLIT_ORACLE),
    QuerySpec(
        "pipeline_stratified_sample", q_pipeline_stratified_sample, _SAMPLE_ORACLE
    ),
    QuerySpec("pipeline_mix_report", q_pipeline_mix_report, _MIX_REPORT_ORACLE),
    QuerySpec("pipeline_pack_sequences", q_pipeline_pack_sequences, _PACK_ORACLE),
    QuerySpec(
        "pipeline_pack_boundary_audit",
        q_pipeline_pack_boundary_audit,
        _PACK_BOUNDARY_ORACLE,
    ),
    QuerySpec(
        "pipeline_split_leakage",
        q_pipeline_split_leakage,
        _split_leakage_oracle(),
    ),
    QuerySpec(
        "pipeline_pack_efficiency",
        q_pipeline_pack_efficiency,
        _pack_efficiency_oracle(),
    ),
]


# ---------------------------------------------------------------------------
# privacy governance: k-anonymity generalization sweep
# ---------------------------------------------------------------------------

#: the k in k-anonymity (every quasi-identifier equivalence class must
#: hold at least this many records before release)
K_ANON_K = 5
#: acctbal generalization ladder: bucket widths from "almost raw" to
#: "fully coarse" — the knob a release process turns until k holds
K_ANON_LEVELS = (1, 10, 100, 1000)


def q_pipeline_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization sweep — the release-side companion of
    the PII/erasure family (cdc_pii_redaction anonymizes one column;
    this AUDITS whether a quasi-identifier combination re-identifies):
    for each generalization level of the numeric quasi-identifier
    (acctbal bucketed at widths 1/10/100/1000, alongside nation and
    market segment), report the equivalence-class profile — class count,
    smallest class, how many ROWS sit in classes smaller than k, and
    l-diversity's floor (the minimum number of distinct sensitive values
    — mktsegment — per (nation, balance-bucket) class one level up).
    The release rule reads off the first level where violating_rows = 0.

    Scale shape: one hash-aggregate per level over bounded class keys
    (map-side partials; the level union is a constant 4-way concat), then
    a second constant-size aggregate per level — no window, no join."""
    cust = load_table(spark, sf_dir, "customer")
    per_level = []
    for width in K_ANON_LEVELS:
        cls = cust.groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal") / width).alias("bal_bucket"),
        ).agg(
            F.count("*").alias("n"),
            F.countDistinct("c_custkey").alias("n_entities"),
        )
        ldiv = (
            cust.groupBy(
                F.col("c_nationkey").alias("nk"),
                F.floor(F.col("c_acctbal") / width).alias("bal_bucket"),
            )
            .agg(F.countDistinct("c_mktsegment").alias("n_sensitive"))
            .agg(F.min("n_sensitive").alias("l_diversity_min"))
        )
        summary = cls.agg(
            F.lit(width).alias("bucket_width"),
            F.count("*").alias("n_classes"),
            F.min("n").alias("min_class_size"),
            F.sum(F.when(F.col("n") < K_ANON_K, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("violating_rows"),
            F.max(F.when(F.col("n") < K_ANON_K, F.lit(1)).otherwise(F.lit(0)))
            .cast("boolean")
            .alias("violates_k"),
        ).crossJoin(ldiv)
        per_level.append(summary)
    out = per_level[0]
    for df in per_level[1:]:
        out = out.unionByName(df)
    return out.select(
        "bucket_width",
        "n_classes",
        "min_class_size",
        "violating_rows",
        "violates_k",
        "l_diversity_min",
    )


def _k_anonymity_oracle() -> str:
    legs = []
    for width in K_ANON_LEVELS:
        legs.append(
            f"""
SELECT {width} AS bucket_width,
  CAST(count(*) AS BIGINT) AS n_classes,
  CAST(min(n) AS BIGINT) AS min_class_size,
  CAST(sum(CASE WHEN n < {K_ANON_K} THEN n ELSE 0 END) AS BIGINT)
    AS violating_rows,
  max(CASE WHEN n < {K_ANON_K} THEN 1 ELSE 0 END) = 1 AS violates_k,
  (SELECT CAST(min(ns) AS BIGINT) FROM (
     SELECT count(DISTINCT c_mktsegment) AS ns FROM customer
     GROUP BY c_nationkey, floor(c_acctbal / {width})
  )) AS l_diversity_min
FROM (
  SELECT count(*) AS n FROM customer
  GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / {width})
)"""
        )
    return " UNION ALL ".join(legs)


SPECS.append(
    QuerySpec(
        "pipeline_k_anonymity",
        q_pipeline_k_anonymity,
        _k_anonymity_oracle(),
    )
)


# ---------------------------------------------------------------------------
# Crawl ingest: WARC containers (the Common Crawl / IIPC format)
# ---------------------------------------------------------------------------

#: Fixed WARC-Date for deterministic serialization (the writer takes dates
#: from the caller by design — connectors/warc.py module docstring).
WARC_DATE = "2026-01-01T00:00:00Z"


def _warc_uri_expr(source_col: str, doc_col: str) -> str:
    """The deterministic WARC-Target-URI derivation, shared by the Spark
    encode kernel (via f-string) and the SQL oracles (via this concat)."""
    return (
        f"'http://' || {source_col} || '.example.com/doc/' || {doc_col}"
    )


def _warc_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents serialized into genuine multi-record WARC containers, one
    blob per Arrow batch: each document contributes a ``response`` record
    (payload = UTF-8 text) AND an interleaved ``metadata`` record the
    downstream walk must length-skip — the unknown-record-skip contract is
    part of what the roundtrip proves."""
    import pandas as pd

    from mysql_streamer_spark.connectors.warc import warc_write
    from mysql_streamer_spark.tables import spread

    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "source", "text")
        .filter(F.length("text") > 0)
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            records = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                records.append(
                    dict(
                        record_type="response",
                        record_id=f"<urn:doc:{doc_id}>",
                        date=WARC_DATE,
                        target_uri=f"http://{source}.example.com/doc/{doc_id}",
                        content_type=(
                            "text/html" if doc_id % 4 == 0 else "text/plain"
                        ),
                        payload=text.encode("utf-8"),
                    )
                )
                records.append(
                    dict(
                        record_type="metadata",
                        record_id=f"<urn:meta:{doc_id}>",
                        date=WARC_DATE,
                        content_type="application/warc-fields",
                        payload=f"via: crawler/{doc_id}".encode("ascii"),
                    )
                )
            yield pd.DataFrame({"blob": [warc_write(records)]})

    return docs.mapInPandas(encode, "blob binary")


def q_pipeline_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-ingest, end-to-end through a REAL container format: documents
    are serialized into multi-record WARC/1.0 files (in-repo pure-Python
    writer, public ISO 28500 spec), then the strict chunk-walking reader
    parses the containers back, length-skipping the interleaved
    ``metadata`` records, and every response's target URI, payload size,
    serialized record size, and payload sha256 hash-match a closed-form
    SQL reconstruction of the record bytes — the PNG/WAV/AVI roundtrip
    proof applied to the ingest format every real 100 TB crawl corpus
    ships in. A wrong header order, a missed pad byte, a lying
    Content-Length, or a skip that consumes the wrong span all hash-fail.

    Scale shape: two map-only Arrow stages (serialize per batch, walk per
    blob) over the documents partitioning — no collect, and the only
    exchange is the spread() fan-out repartition carrying each text once
    into the codec stage (measured 178 B/rec at amplification 1.0; a
    multi-split cluster input needs no repartition at all). Blob
    granularity is the Arrow batch, so container size is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of corpus
    size."""
    import hashlib

    import pandas as pd

    from mysql_streamer_spark.connectors.warc import warc_parse

    blobs = _warc_blobs(spark, sf_dir)

    def walk(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "target_uri": [],
                "payload_bytes": [],
                "record_bytes": [],
                "payload_sha": [],
            }
            for blob in pdf["blob"]:
                for rec in warc_parse(bytes(blob), types=("response",)):
                    rid = rec["headers"]["WARC-Record-ID"]
                    rows["doc_id"].append(int(rid[9:-1]))
                    rows["target_uri"].append(
                        rec["headers"]["WARC-Target-URI"]
                    )
                    rows["payload_bytes"].append(len(rec["payload"]))
                    rows["record_bytes"].append(rec["record_len"])
                    rows["payload_sha"].append(
                        hashlib.sha256(rec["payload"]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(
        walk,
        "doc_id long, target_uri string, payload_bytes long, "
        "record_bytes long, payload_sha string",
    )


def _warc_roundtrip_oracle() -> str:
    uri = _warc_uri_expr("source", "doc_id")
    crlf = "chr(13) || chr(10)"
    # The full record reconstructed as a SQL string; strlen() of it is the
    # serialized size (closed form, like the WAV 44+2n surface).
    record = f"""'WARC/1.0' || {crlf}
    || 'WARC-Type: response' || {crlf}
    || 'WARC-Record-ID: <urn:doc:' || doc_id || '>' || {crlf}
    || 'WARC-Date: {WARC_DATE}' || {crlf}
    || 'WARC-Target-URI: ' || ({uri}) || {crlf}
    || 'Content-Type: ' ||
       CASE WHEN doc_id % 4 = 0 THEN 'text/html' ELSE 'text/plain' END
       || {crlf}
    || 'Content-Length: ' || strlen(text) || {crlf} || {crlf}
    || text || {crlf} || {crlf}"""
    return f"""
SELECT doc_id,
  {uri} AS target_uri,
  CAST(strlen(text) AS BIGINT) AS payload_bytes,
  CAST(strlen({record}) AS BIGINT) AS record_bytes,
  sha256(text) AS payload_sha
FROM documents WHERE length(text) > 0
"""


SPECS.append(
    QuerySpec(
        "pipeline_warc_roundtrip",
        q_pipeline_warc_roundtrip,
        _warc_roundtrip_oracle(),
    )
)

#: Extraction thresholds for the WARC filter stage.
WARC_MIN_PAYLOAD = 200


def q_pipeline_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first real stage of a crawl pipeline AFTER the container walk:
    select only ``response`` records whose Content-Type is text/plain and
    whose payload clears a size floor, attribute each kept record back to
    its crawl source by parsing the HOST out of the WARC-Target-URI it
    was stored under (the pipeline downstream of ingest sees only what
    the container says, not the original table), and aggregate per-source
    admission stats. Proves header-driven selection inside the walk plus
    recovery of lineage from parsed headers alone.

    Scale shape: the serialize+walk stages are map-only Arrow kernels; the
    per-source rollup is one hash-aggregate over ~20 bounded keys with
    map-side partials — no window, no join."""
    import pandas as pd

    from mysql_streamer_spark.connectors.warc import warc_parse

    blobs = _warc_blobs(spark, sf_dir)

    def walk(batches):
        for pdf in batches:
            rows: dict[str, list] = {"target_uri": [], "payload_bytes": []}
            for blob in pdf["blob"]:
                for rec in warc_parse(bytes(blob), types=("response",)):
                    if rec["headers"].get("Content-Type") != "text/plain":
                        continue
                    if len(rec["payload"]) < WARC_MIN_PAYLOAD:
                        continue
                    rows["target_uri"].append(
                        rec["headers"]["WARC-Target-URI"]
                    )
                    rows["payload_bytes"].append(len(rec["payload"]))
            yield pd.DataFrame(rows)

    kept = blobs.mapInPandas(walk, "target_uri string, payload_bytes long")
    return (
        kept.withColumn(
            "source",
            F.regexp_extract("target_uri", r"^http://(.*?)\.example\.com/", 1),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("payload_bytes").cast("long").alias("kept_bytes"),
            F.max("payload_bytes").cast("long").alias("max_payload"),
        )
    )


def _warc_extract_oracle() -> str:
    return f"""
SELECT source,
  CAST(count(*) AS BIGINT) AS n_kept,
  CAST(sum(strlen(text)) AS BIGINT) AS kept_bytes,
  CAST(max(strlen(text)) AS BIGINT) AS max_payload
FROM documents
WHERE length(text) > 0
  AND doc_id % 4 <> 0
  AND strlen(text) >= {WARC_MIN_PAYLOAD}
GROUP BY source
"""


SPECS.append(
    QuerySpec(
        "pipeline_warc_extract",
        q_pipeline_warc_extract,
        _warc_extract_oracle(),
    )
)


# ---------------------------------------------------------------------------
# URL canonicalization + dedup (crawl-frontier hygiene)
# ---------------------------------------------------------------------------

#: Path modulus: distinct docs whose ids collide mod this land on the SAME
#: canonical URL — the duplicate groups the dedup must find.
URL_PATH_MOD = 500


def q_pipeline_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + exact dedup — the crawl-side hygiene pass
    every corpus pipeline runs before content dedup: the same page
    arrives under many spellings (scheme/host case, explicit default
    port, trailing slash, tracking params, fragments), and grouping by
    the RAW url under-merges. Each document gets a deterministically
    MESSY url (mixed-case scheme/host on id mod 2/3, ``:80`` on mod 5,
    trailing slash on mod 7, a ``utm_source`` tracking param on mod 11,
    an unsorted kept-param pair on mod 13, a fragment on mod 17 — path
    is ``doc_id mod URL_PATH_MOD`` so distinct docs genuinely collide),
    then the canonicalizer applies the RFC 3986 §6 normalizations plus
    standard crawl practice: lowercase scheme+authority, strip the
    scheme-default port, drop the fragment, drop ``utm_*`` params, sort
    surviving params, trim the trailing slash. Groups on the canonical
    form, keeping min-doc_id as the survivor. The oracle derives every
    canonical url CLOSED-FORM from the generator arithmetic, so any
    canonicalization rule that fires wrong — or fails to fire — changes
    group membership and hash-fails.

    Scale shape: messy-url synthesis and canonicalization are one
    codegen'd map-side projection (parse_url + array ops, no Python);
    the dedup is one hash-aggregate on the canonical string with
    map-side partials — count/min/sum all combine. No window, no join,
    text never shuffles (only urls + counters)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    messy = docs.withColumn(
        "raw_url",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP")).otherwise(
                F.lit("http")
            ),
            F.lit("://"),
            F.when(
                F.col("doc_id") % 3 == 0, F.upper("source")
            ).otherwise(F.col("source")),
            F.lit(".Example.COM"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(":80")).otherwise(
                F.lit("")
            ),
            F.lit("/page/"),
            (F.col("doc_id") % URL_PATH_MOD).cast("string"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(
                F.lit("")
            ),
            F.when(
                (F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 13 == 0),
                F.lit("?utm_source=feed&b=2&a=1"),
            )
            .when(F.col("doc_id") % 11 == 0, F.lit("?utm_source=feed"))
            .when(F.col("doc_id") % 13 == 0, F.lit("?b=2&a=1"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 17 == 0, F.lit("#s2")).otherwise(
                F.lit("")
            ),
        ),
    )
    canon = messy.withColumn(
        "kept_params",
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split(
                        F.coalesce(
                            F.expr("parse_url(raw_url, 'QUERY')"), F.lit("")
                        ),
                        "&",
                    ),
                    lambda p: (p != "") & ~p.startswith("utm_"),
                )
            ),
            "&",
        ),
    ).withColumn(
        "canonical_url",
        F.concat(
            F.lower(F.expr("parse_url(raw_url, 'PROTOCOL')")),
            F.lit("://"),
            F.regexp_replace(
                F.lower(F.expr("parse_url(raw_url, 'AUTHORITY')")),
                ":80$",
                "",
            ),
            F.regexp_replace(
                F.expr("parse_url(raw_url, 'PATH')"), "/$", ""
            ),
            F.when(
                F.col("kept_params") != "",
                F.concat(F.lit("?"), F.col("kept_params")),
            ).otherwise(F.lit("")),
        ),
    )
    return canon.groupBy("canonical_url").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("keeper_doc"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def _url_dedup_oracle() -> str:
    return f"""
SELECT
  'http://' || source || '.example.com/page/' || (doc_id % {URL_PATH_MOD})
    || CASE WHEN doc_id % 13 = 0 THEN '?a=1&b=2' ELSE '' END
    AS canonical_url,
  CAST(count(*) AS BIGINT) AS n_docs,
  min(doc_id) AS keeper_doc,
  CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
"""


SPECS.append(
    QuerySpec(
        "pipeline_url_dedup",
        q_pipeline_url_dedup,
        _url_dedup_oracle(),
    )
)


# ---------------------------------------------------------------------------
# Crawl-policy admission (robots.txt / RFC 9309 longest-match semantics)
# ---------------------------------------------------------------------------


def _robots_rules() -> list[tuple[str, str, bool, int]]:
    """The per-host policy dimension: for host ``src{i}.example.com`` —
    a Disallow on the path prefix ``/page/{i}`` (which also shadows
    ``/page/{i}0``..``/page/{i}9..`` — genuine PREFIX semantics), an
    Allow on the LONGER prefix ``/page/{i}{i}`` carving an exception back
    out, and the implicit empty-prefix Allow default. Deterministic, so
    the oracle can replay decisions closed-form."""
    rules = []
    for i in range(20):
        host = f"src{i}.example.com"
        rules.append((host, "", True, 0))
        rules.append((host, f"/page/{i}", False, len(f"/page/{i}")))
        rules.append((host, f"/page/{i}{i}", True, len(f"/page/{i}{i}")))
    return rules


def q_pipeline_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-policy admission — the stage between URL canonicalization and
    fetch/ingest: every URL is checked against its host's robots.txt-style
    rule set with RFC 9309 matching semantics (the most-specific — i.e.
    LONGEST — matching path prefix decides; an Allow wins a length tie).
    The rule fixture makes the precedence order load-bearing: host i
    disallows prefix ``/page/{i}`` but allows the longer ``/page/{i}{i}``,
    so e.g. on src1 ``/page/10`` is blocked while ``/page/11`` is allowed
    — a first-match or shortest-match implementation hash-fails.

    Scale shape: the policy dimension is tiny (rules per crawled host) and
    BROADCAST; the corpus side is one map-side projection, the broadcast
    join fans each URL out to only its host's matching rules, and the
    argmax is one hash-aggregate of a max(struct) — map-side combinable,
    shuffling one small row per URL. No window; text never moves."""
    rules = spark.createDataFrame(
        _robots_rules(), "host string, prefix string, allow boolean, plen int"
    )
    return _robots_apply(spark, sf_dir, rules)


def _robots_apply(spark: SparkSession, sf_dir: str, rules: DataFrame) -> DataFrame:
    """The RFC 9309 apply step shared by the robots family: broadcast the
    (host, prefix, allow, plen) rule dimension, fan each URL out to its
    host's matching prefixes, argmax by (plen, allow) — longest prefix
    decides, Allow wins the tie."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("/page/"), (F.col("doc_id") % URL_PATH_MOD).cast("string")
        ).alias("path"),
    )
    matched = docs.join(F.broadcast(rules), "host").filter(
        F.col("path").startswith(F.col("prefix"))
    )
    best = matched.groupBy("doc_id", "host", "path").agg(
        F.max(F.struct("plen", "allow", "prefix")).alias("m")
    )
    return best.select(
        "doc_id",
        "host",
        "path",
        F.col("m.prefix").alias("rule_prefix"),
        F.col("m.allow").alias("allowed"),
    )


def _robots_filter_oracle() -> str:
    # i = the host's numeric suffix; a path /page/N matches prefix
    # /page/{i} iff str(N) starts with str(i), and the longer Allow
    # /page/{i}{i} iff str(N) starts with str(i)||str(i).
    return f"""
WITH d AS (
  SELECT doc_id,
    source || '.example.com' AS host,
    '/page/' || (doc_id % {URL_PATH_MOD}) AS path,
    CAST(doc_id % {URL_PATH_MOD} AS VARCHAR) AS n,
    substring(source, 4) AS i
  FROM documents
)
SELECT doc_id, host, path,
  CASE WHEN starts_with(n, i || i) THEN '/page/' || i || i
       WHEN starts_with(n, i) THEN '/page/' || i
       ELSE '' END AS rule_prefix,
  CASE WHEN starts_with(n, i || i) THEN true
       WHEN starts_with(n, i) THEN false
       ELSE true END AS allowed
FROM d
"""


SPECS.append(
    QuerySpec(
        "pipeline_robots_filter",
        q_pipeline_robots_filter,
        _robots_filter_oracle(),
    )
)


def q_pipeline_warc_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WARC surface as a FILE pipeline — the shape of a real Common
    Crawl ingest, where containers live in object storage: documents are
    written as ``part-*.warc`` files (one per partition, executor-side,
    driver ships only the manifest — connectors/warc.py:warc_write_files),
    then read back through Spark's binaryFile listing with a file-parallel
    chunk walk, metadata records length-skipped, and every response's
    payload proven intact by JVM-side sha2 over the parsed bytes against
    the SQL recomputation. Complements pipeline_warc_roundtrip (in-plan
    blobs) the way cdc_avro_file_roundtrip complements the Avro wire
    queries: same codec, at-rest container files + distributed listing.

    Scale shape: write is one map pass (manifest-only collect); read is
    binaryFile-parallel (one task per container file — the real-world
    parallelism grain of crawl ingest); projection + sha are codegen'd.
    No shuffle beyond the write side's spread() fan-out (the single-split
    local fixture's stand-in for cluster input parallelism)."""
    import atexit
    import shutil
    import tempfile

    from mysql_streamer_spark.connectors.warc import (
        warc_read_files,
        warc_write_files,
    )
    from mysql_streamer_spark.tables import spread

    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "source", "text")
        .filter(F.length("text") > 0)
    )
    work = tempfile.mkdtemp(prefix="mss_warc_")
    atexit.register(shutil.rmtree, work, True)
    warc_write_files(docs, work, WARC_DATE)
    recs = warc_read_files(spark, work, types=("response",))
    return recs.select(
        F.regexp_extract("record_id", r"<urn:doc:(\d+)>", 1)
        .cast("long")
        .alias("doc_id"),
        "content_type",
        F.length("payload").cast("long").alias("payload_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    )


def _warc_file_ingest_oracle() -> str:
    return """
SELECT doc_id,
  CASE WHEN doc_id % 4 = 0 THEN 'text/html' ELSE 'text/plain' END
    AS content_type,
  CAST(strlen(text) AS BIGINT) AS payload_bytes,
  sha256(text) AS payload_sha
FROM documents WHERE length(text) > 0
"""


SPECS.append(
    QuerySpec(
        "pipeline_warc_file_ingest",
        q_pipeline_warc_file_ingest,
        _warc_file_ingest_oracle(),
    )
)


# ---------------------------------------------------------------------------
# BPE tokenizer APPLY (encode) — the fertility the packer actually pays
# ---------------------------------------------------------------------------

#: Ordered merge rules (the artifact a BPE trainer like pipeline_bpe_merges
#: produces over many iterations), applied subword-nmt-style: one global
#: left-to-right non-overlapping replace per rule, in rule order, inside
#: word boundaries. Fixed here so both engines replay the identical
#: transform; chains compress frequent fixture words ('the', 'table',
#: 'value' -> 1 token; 'scan' -> sc|an, 'query' -> qu|er|y — earlier
#: rules legally preempt later chains) while rare words stay
#: char-fragmented — the fertility spread real tokenizers show.
BPE_APPLY_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"),
    ("e", "r"), ("o", "r"), ("a", "n"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
)


def _bpe_apply_sql(word_expr: str, dialect: str) -> str:
    """The merge-apply transform as ONE nested string expression, emitted
    for either engine from the same rule list: sentinel-space the chars
    (' k e y '), then one replace(' a b ' -> ' ab ') per rule in order.
    The space sentinels make matches token-aligned by construction; both
    engines' replace() scans left-to-right non-overlapping, so the
    transforms are bit-identical."""
    if dialect == "spark":
        s = f"' ' || regexp_replace({word_expr}, '(.)', '$1 ')"
    else:
        s = f"' ' || regexp_replace({word_expr}, '(.)', '\\1 ', 'g')"
    for a, b in BPE_APPLY_MERGES:
        s = f"replace({s}, ' {a} {b} ', ' {a}{b} ')"
    return s


def q_pipeline_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE over the corpus — pipeline_bpe_merges shows the trainer's
    pair-count step; this is the other half every pipeline runs millions
    of times more often: applying the learned merge table to text and
    paying the resulting token counts (the packer/budget/fertility
    numbers downstream queries consume). Merges apply subword-nmt-style
    (ordered global replaces inside word boundaries) as a SINGLE nested
    JVM string expression — no Python in the loop — over the DISTINCT
    word table (Heaps-law sublinear, the bpe_merges trick), then token
    counts join back and aggregate per document next to the whitespace
    count the naive budget would use.

    Scale shape: explode moves (doc_id, word) pairs only; the merge chain
    runs once per DISTINCT word; the join back is a vocab-sized equi-join
    and the per-doc rollup is one map-side-combinable hash aggregate.
    Text itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    encoded = (
        words.select("w")
        .distinct()
        .withColumn("enc", F.expr(_bpe_apply_sql("w", "spark")))
        .select(
            "w",
            (
                F.length("enc")
                - F.length(F.regexp_replace("enc", " ", ""))
                - 1
            )
            .cast("long")
            .alias("w_tokens"),
        )
    )
    return (
        words.join(encoded, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("ws_tokens"),
            F.sum("w_tokens").cast("long").alias("bpe_tokens"),
        )
        .select(
            "doc_id",
            "ws_tokens",
            "bpe_tokens",
            (F.col("bpe_tokens").cast("double") / F.col("ws_tokens"))
            .alias("fertility"),
        )
    )


def _bpe_encode_oracle() -> str:
    enc = _bpe_apply_sql("w", "duckdb")
    return f"""
WITH words AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
), vocab AS (
  SELECT w, CAST(strlen(e) - strlen(replace(e, ' ', '')) - 1 AS BIGINT)
           AS w_tokens
  FROM (SELECT w, {enc} AS e FROM (SELECT DISTINCT w FROM words))
), per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS ws_tokens,
         CAST(sum(w_tokens) AS BIGINT) AS bpe_tokens
  FROM words JOIN vocab USING (w)
  GROUP BY doc_id
)
SELECT doc_id, ws_tokens, bpe_tokens,
       CAST(bpe_tokens AS DOUBLE) / ws_tokens AS fertility
FROM per_doc
"""


SPECS.append(
    QuerySpec(
        "pipeline_bpe_encode",
        q_pipeline_bpe_encode,
        _bpe_encode_oracle(),
    )
)


def q_pipeline_http_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Common Crawl payload shape: a WARC ``response`` record
    holds the FULL HTTP response (content-type "application/http;
    msgtype=response"), so ingest must parse TWO nested framings — the
    WARC chunk walk, then the HTTP status line / headers / body split —
    before any text exists. The fixture exercises the status surface a
    crawler actually sees: 200s carry the document body, 404s a short
    error body, 301s an empty body plus a Location header (the redirect
    target the frontier feeds back). Every parsed field — status, body
    size vs the HTTP Content-Length (a torn crawler write trips len_ok),
    body sha256, redirect target — hash-matches the closed-form oracle.

    Scale shape: both framings parse inside the same per-batch Arrow
    kernel (WARC walk -> HTTP split); no shuffle beyond the spread()
    fan-out; output is one narrow row per response."""
    import hashlib

    import pandas as pd

    from mysql_streamer_spark.connectors.warc import (
        http_response_bytes,
        http_response_parse,
        warc_parse,
        warc_write,
    )
    from mysql_streamer_spark.tables import spread

    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "source", "text")
        .filter(F.length("text") > 0)
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            records = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                headers = [
                    ("Content-Type", "text/plain; charset=utf-8"),
                    ("Server", "mss/1.0"),
                ]
                if doc_id % 17 == 0:
                    status, body = 301, b""
                    headers.append(
                        (
                            "Location",
                            f"http://{source}.example.com/doc/{doc_id}?moved=1",
                        )
                    )
                elif doc_id % 13 == 0:
                    status, body = 404, b"not found"
                else:
                    status, body = 200, text.encode("utf-8")
                records.append(
                    dict(
                        record_type="response",
                        record_id=f"<urn:doc:{doc_id}>",
                        date=WARC_DATE,
                        target_uri=f"http://{source}.example.com/doc/{doc_id}",
                        content_type="application/http; msgtype=response",
                        payload=http_response_bytes(status, body, headers),
                    )
                )
            yield pd.DataFrame({"blob": [warc_write(records)]})

    blobs = docs.mapInPandas(encode, "blob binary")

    def walk(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "status": [],
                "body_bytes": [],
                "len_ok": [],
                "body_sha": [],
                "redirect_target": [],
            }
            for blob in pdf["blob"]:
                for rec in warc_parse(bytes(blob), types=("response",)):
                    http = http_response_parse(rec["payload"])
                    rid = rec["headers"]["WARC-Record-ID"]
                    rows["doc_id"].append(int(rid[9:-1]))
                    rows["status"].append(http["status"])
                    rows["body_bytes"].append(len(http["body"]))
                    rows["len_ok"].append(
                        len(http["body"])
                        == int(http["headers"]["Content-Length"])
                    )
                    rows["body_sha"].append(
                        hashlib.sha256(http["body"]).hexdigest()
                    )
                    rows["redirect_target"].append(
                        http["headers"].get("Location")
                    )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(
        walk,
        "doc_id long, status int, body_bytes long, len_ok boolean, "
        "body_sha string, redirect_target string",
    )


def _http_extract_oracle() -> str:
    return """
SELECT doc_id,
  CAST(CASE WHEN doc_id % 17 = 0 THEN 301
            WHEN doc_id % 13 = 0 THEN 404
            ELSE 200 END AS INTEGER) AS status,
  CAST(CASE WHEN doc_id % 17 = 0 THEN 0
            WHEN doc_id % 13 = 0 THEN 9
            ELSE strlen(text) END AS BIGINT) AS body_bytes,
  TRUE AS len_ok,
  CASE WHEN doc_id % 17 = 0 THEN sha256('')
       WHEN doc_id % 13 = 0 THEN sha256('not found')
       ELSE sha256(text) END AS body_sha,
  CASE WHEN doc_id % 17 = 0
       THEN 'http://' || source || '.example.com/doc/' || doc_id
            || '?moved=1'
       ELSE NULL END AS redirect_target
FROM documents WHERE length(text) > 0
"""


SPECS.append(
    QuerySpec(
        "pipeline_http_extract",
        q_pipeline_http_extract,
        _http_extract_oracle(),
    )
)


def _robots_txt_for_host(i: int) -> str:
    """The robots.txt BYTES host src{i} serves — deterministic, and
    deliberately full of material the parser must navigate: a decoy
    group blocking everything for a different bot, a two-agent group
    (ours + a backup) carrying the real rules, comments, unknown
    directives, and a '*' fallback group that must NOT apply to us
    because a specific group matches first (RFC 9309 precedence)."""
    return (
        f"# robots for src{i}.example.com\n"
        "User-agent: other-bot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: mss-crawler\n"
        "User-agent: backup-bot\n"
        "Crawl-delay: 5\n"  # unknown-to-us directive: tolerated
        f"Disallow: /page/{i}\n"
        f"Allow: /page/{i}{i}  # carve the exception back out\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )


def q_pipeline_robots_txt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robots surface END-TO-END from the bytes a webserver serves:
    each host's actual robots.txt text (decoy bot group, multi-agent
    group, comments, unknown directives, a '*' group that blocks
    everything) is parsed DISTRIBUTED by the RFC 9309 parser
    (mysql_streamer_spark/robots.py) into the rule dimension, then the
    same broadcast + longest-match apply as pipeline_robots_filter. The
    shared oracle makes the parser itself the thing under test: picking
    the wrong group (the decoy or the '*' catch-all), mishandling the
    two-agent group, or tripping on comments/Crawl-delay flips decisions
    corpus-wide and hash-fails.

    Scale shape: robots.txt parsing is one Arrow kernel over the host
    dimension (bounded — one row per crawled host); everything after is
    the shared broadcast-join + argmax apply."""
    import pandas as pd

    from mysql_streamer_spark.robots import parse_robots

    hosts = spark.createDataFrame(
        [(f"src{i}.example.com", _robots_txt_for_host(i)) for i in range(20)],
        "host string, robots_txt string",
    )

    def parse(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "host": [], "prefix": [], "allow": [], "plen": []
            }
            for host, txt in zip(pdf["host"], pdf["robots_txt"]):
                for prefix, allow in parse_robots(txt, "mss-crawler"):
                    rows["host"].append(host)
                    rows["prefix"].append(prefix)
                    rows["allow"].append(allow)
                    rows["plen"].append(len(prefix))
            yield pd.DataFrame(rows)

    rules = hosts.mapInPandas(
        parse, "host string, prefix string, allow boolean, plen int"
    )
    return _robots_apply(spark, sf_dir, rules)


SPECS.append(
    QuerySpec(
        "pipeline_robots_txt",
        q_pipeline_robots_txt,
        _robots_filter_oracle(),
    )
)


def q_pipeline_crawl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot crawl drift — the CDX-index diff every recurring
    crawl runs to budget refetches: snapshot A is the current corpus;
    snapshot B (the "next crawl", derived deterministically) loses every
    19th URL (site gone / now 404), changes every 7th's content (text
    drift -> new sha), and discovers a new sibling URL for every 29th.
    The FULL OUTER join on URL classifies each into unchanged / modified
    / gone / new by presence and content-hash comparison — presence and
    hash equality are the only signals a real CDX diff has — and rolls
    up per host, the table that decides per-site refetch cadence.

    Scale shape: both snapshots are map-side projections carrying only
    (url, host, sha) — text never enters the join; the outer join
    shuffles id-width rows on url; the rollup is one hash aggregate on
    the bounded host key with map-side partials."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    url = F.concat(
        F.lit("http://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    snap_a = docs.select(
        url.alias("url"),
        F.col("source").alias("host_a"),
        F.sha2("text", 256).alias("sha_a"),
    )
    in_b = F.col("doc_id") % 19 != 0
    snap_b = (
        docs.filter(in_b)
        .select(
            url.alias("url"),
            F.col("source").alias("host_b"),
            F.sha2(
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.col("text"), F.lit(" updated")),
                ).otherwise(F.col("text")),
                256,
            ).alias("sha_b"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 29 == 0).select(
                F.concat(url, F.lit("/new")).alias("url"),
                F.col("source").alias("host_b"),
                F.sha2(F.col("text"), 256).alias("sha_b"),
            )
        )
    )
    joined = snap_a.join(snap_b, "url", "full_outer").select(
        F.coalesce("host_a", "host_b").alias("host"),
        F.when(F.col("sha_a").isNull(), F.lit("new"))
        .when(F.col("sha_b").isNull(), F.lit("gone"))
        .when(F.col("sha_a") == F.col("sha_b"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
        .alias("verdict"),
    )
    return joined.groupBy("host").agg(
        F.sum(F.when(F.col("verdict") == "unchanged", 1).otherwise(0))
        .cast("long")
        .alias("n_unchanged"),
        F.sum(F.when(F.col("verdict") == "modified", 1).otherwise(0))
        .cast("long")
        .alias("n_modified"),
        F.sum(F.when(F.col("verdict") == "gone", 1).otherwise(0))
        .cast("long")
        .alias("n_gone"),
        F.sum(F.when(F.col("verdict") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
    )


def _crawl_drift_oracle() -> str:
    # presence/hash arithmetic replayed closed-form, no join needed:
    # gone = %19; modified = surviving %7; new = %29 sibling
    return """
SELECT source AS host,
  CAST(sum(CASE WHEN doc_id % 19 <> 0 AND doc_id % 7 <> 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
  CAST(sum(CASE WHEN doc_id % 19 <> 0 AND doc_id % 7 = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_modified,
  CAST(sum(CASE WHEN doc_id % 19 = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_gone,
  CAST(sum(CASE WHEN doc_id % 29 = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_new
FROM documents
GROUP BY source
"""


SPECS.append(
    QuerySpec(
        "pipeline_crawl_drift",
        q_pipeline_crawl_drift,
        _crawl_drift_oracle(),
    )
)
