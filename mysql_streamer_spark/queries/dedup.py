"""Deduplication operator family over ``documents`` (LLM-data-pipeline):
exact content-hash dedup, MinHash signatures with banded LSH, LSH candidate
pairs verified by exact n-gram Jaccard, and SimHash-32.

Scale design (the part that must survive 100 TB):

- Exact dedup is ONE hash-aggregate on sha256(text) — map-side partials,
  one shuffle, no row wider than (hash, count, min_id).
- Near-dup detection NEVER does an all-pairs comparison. Docs are mapped to
  ``BANDS`` band-bucket keys (map-only); only docs sharing a bucket meet in
  the equi-join, so the join's fan-out is bounded by real collision groups
  (the standard banded-LSH argument: P[candidate] = 1-(1-j^r)^b). The
  expensive exact-Jaccard verification runs only on candidate pairs.
- SimHash is again map-only: 32 bit-majority votes folded over the token
  hash array with SQL higher-order aggregates, no explode, no Python.

Cross-engine hashing: md5 / sha256 produce identical hex in Spark and
DuckDB; hex->int uses Spark ``conv(...,16,10)`` vs DuckDB ``'0x'||s`` cast,
both exact on 8-hex-digit (32-bit) values. All Jaccard/majority math is
integer counts with a final double division (bit-identical in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_streamer_spark import text as tx
from mysql_streamer_spark import text_kernels as tk
from mysql_streamer_spark.queries.registry import QuerySpec
from mysql_streamer_spark.tables import load_table, spread, table_path

#: MinHash signature length and band layout: H = BANDS * ROWS_PER_BAND.
N_HASHES = 8
BANDS = 4
ROWS_PER_BAND = N_HASHES // BANDS

#: Candidate pairs below this exact n-gram Jaccard are dropped.
JACCARD_THRESHOLD = 0.3

#: Skew guard: buckets larger than this are "too common to be
#: discriminative" and are dropped from pair generation (the standard LSH
#: mega-bucket cap — without it one degenerate bucket generates O(n²)
#: pairs and a single straggler task at scale).
MAX_BUCKET_SIZE = 1000

#: SimHash width in bits (first 8 md5 hex chars = 32 bits per token).
SIMHASH_BITS = 32


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


_EXACT_ORACLE = """
SELECT sha256(text) AS content_hash,
       count(*) AS n_docs,
       min(doc_id) AS keeper_doc_id
FROM documents
GROUP BY 1
"""


def q_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY form of exact dedup: the surviving corpus (first doc per
    content hash), not just the group report — what a training pipeline
    actually feeds downstream. One aggregate picks keepers; min_by carries
    the full row so no second join back to the corpus is needed."""
    docs = load_table(spark, sf_dir, "documents")
    kept = (
        docs.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(
            F.min_by(
                F.struct("doc_id", "text", "lang", "source", "n_chars"),
                F.col("doc_id"),
            ).alias("d")
        )
        .select("d.doc_id", "d.lang", "d.source", "d.n_chars", "content_hash")
    )
    return kept


_EXACT_SURVIVORS_ORACLE = """
SELECT doc_id, lang, source, n_chars, sha256(text) AS content_hash
FROM (
  SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# MinHash signatures -> banded LSH keys
# ---------------------------------------------------------------------------

def _with_signature(docs: DataFrame, pre_shingled: bool = False) -> DataFrame:
    """doc_id + minhash components sig_0..sig_{H-1} (map-only).

    One md5 per shingle into ``hashes``; each signature component is a
    16-bit slice-min of that array — H components for one hash pass."""
    if pre_shingled:
        df = docs
    else:
        df = (
            spread(docs)
            .withColumn("toks", tx.tokens_col("text"))
            .withColumn("shingles", tx.shingles_col())
            .filter(F.size("shingles") > 0)
        )
    df = df.withColumn("hashes", tx.shingle_hashes_col())
    for i in range(N_HASHES):
        df = df.withColumn(f"sig_{i}", tx.minhash_from_hashes_col(i))
    return df


def _band_hash_col(band: int) -> F.Column:
    parts = [F.lit(str(band))] + [
        F.col(f"sig_{band * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)
    ]
    return F.md5(F.concat_ws(":", *parts))


def _signature_sql_cte() -> str:
    sig_cols = ", ".join(
        f"{tx.minhash_from_hashes_sql(i)} AS sig_{i}" for i in range(N_HASHES)
    )
    return f"""
tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), sh AS (
  SELECT doc_id, {tx.shingles_sql()} AS shingles FROM tok
  WHERE len({tx.shingles_sql("toks")}) > 0
), hashed AS (
  SELECT doc_id, {tx.shingle_hashes_sql()} AS hashes FROM sh
), sigs AS (
  SELECT doc_id, {sig_cols} FROM hashed
)"""


def _band_hash_sql(band: int) -> str:
    cols = ", ".join(f"sig_{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    return f"md5(concat_ws(':', '{band}', {cols}))"


def _bands_sql_cte() -> str:
    selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {_band_hash_sql(b)} AS band_hash FROM sigs"
        for b in range(BANDS)
    )
    return f", bands AS ({selects})"


def lsh_bands(
    docs: DataFrame, pre_shingled: bool = False, pre_signed: bool = False
) -> DataFrame:
    """(doc_id, band_id, band_hash): the LSH bucket keys — the unit that
    gets shuffled, tiny and fixed-width regardless of document size.

    ``pre_signed`` means ``docs`` already carries sig_0..sig_{H-1} (e.g. a
    persisted signature table): band keys derive from the cached columns
    instead of re-running the shingle→hash→slice-min pipeline."""
    sig = docs if pre_signed else _with_signature(docs, pre_shingled)
    stack_args = ", ".join(f"{b}, band_{b}" for b in range(BANDS))
    for b in range(BANDS):
        sig = sig.withColumn(f"band_{b}", _band_hash_col(b))
    return sig.select(
        "doc_id",
        F.expr(f"stack({BANDS}, {stack_args}) AS (band_id, band_hash)"),
    )


def q_dedup_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_bands(load_table(spark, sf_dir, "documents"))


_BANDS_ORACLE = (
    "WITH " + _signature_sql_cte() + _bands_sql_cte() +
    "\nSELECT doc_id, band_id, band_hash FROM bands"
)


# ---------------------------------------------------------------------------
# LSH candidate pairs + exact Jaccard verification
# ---------------------------------------------------------------------------

#: pair⋈dim verification joins broadcast the per-doc dimension at or
#: below this many documents and switch to dim-as-build SHUFFLE_HASH
#: above it. 100k docs of (doc_id, sset) is already ~100s of MB — past
#: any sane broadcast — while the bench/driver fixtures (≤5k docs) sit
#: far below. The decision comes from the parquet FOOTER row count
#: (exact, metadata-only), never from Catalyst's estimates: the static
#: planner mis-ranked these sides (broadcasting the PAIR frame / the
#: wide sset dim) and AQE's runtime demotion is a scheduling race — the
#: same k=100 plan succeeded in one session and aborted on
#: spark.driver.maxResultSize in another (SCALE.md round 11). Both
#: branches are explicit hints, so the chosen plan is deterministic.
DIM_BROADCAST_MAX_DOCS = 100_000


def _docs_dim_hint(sf_dir: str) -> str:
    """'broadcast' when the documents dimension provably fits every
    task; 'shuffle_hash' beyond — or whenever the size is unknowable
    (the scale-safe default)."""
    try:
        import pyarrow.parquet as pq

        from mysql_streamer_spark.connectors.python_source import _parquet_files

        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _parquet_files(table_path(sf_dir, "documents"))
        )
    except Exception:  # noqa: BLE001 - unknown layout -> scale-safe
        return "shuffle_hash"
    return "broadcast" if n <= DIM_BROADCAST_MAX_DOCS else "shuffle_hash"


def _hinted_dim(dim: DataFrame, dim_hint: str) -> DataFrame:
    """Apply the chosen explicit strategy to a per-doc dimension frame.
    Either way the DIM is the build side; the pair frame is never
    collected anywhere."""
    return F.broadcast(dim) if dim_hint == "broadcast" else dim.hint("shuffle_hash")


def minhash_candidate_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    pre_shingled: bool = False,
    pre_signed: bool = False,
    dim_hint: str = "shuffle_hash",
) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, jaccard >= threshold).

    Plan shape: ONE pass computes band keys (no self-join — a self-join
    would execute the whole signature subtree twice); buckets group ids,
    in-bucket pairs generate from the sorted id array (bounded by
    MAX_BUCKET_SIZE), then the two distinct-shingle sets join back for the
    exact-Jaccard filter — the only wide-row movement, candidates only.
    """
    # Shingling is the expensive map work and three consumers need it
    # (band keys + both sides of the Jaccard join). Materialize it once —
    # the in-session form of what a production pipeline does by writing
    # the signature/shingle table before pair generation. The fused Arrow
    # kernel (text_kernels, guide §4.2) computes distinct shingles AND the
    # sliced-min-md5 signature in one compiled pass — identical values to
    # the interpreted JVM lambda chain, differentially pinned — so bands
    # derive from the pre-signed columns and the verify join reads sset.
    if pre_shingled or pre_signed:
        shingled = docs
    else:
        shingled = tk.shingle_sets_signed(spread(docs), N_HASHES).persist()
        pre_signed = True
    bands = lsh_bands(shingled, pre_shingled=True, pre_signed=pre_signed)
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET_SIZE))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # a caller that already carries a distinct shingle set (column `sset`)
    # skips the two array_distinct passes over the cached arrays
    if "sset" in shingled.columns:
        shingle_sets = shingled.select("doc_id", "sset")
    else:
        shingle_sets = shingled.select(
            "doc_id", F.array_distinct("shingles").alias("sset")
        )
    inter = F.size(F.array_intersect("sa.sset", "sb.sset"))
    union = F.size(F.array_union("sa.sset", "sb.sset"))
    # explicit dim-as-build strategy (dim_hint, see DIM_BROADCAST_MAX_DOCS):
    # left alone the static planner broadcasts one side off estimates —
    # EITHER the pair frame (a driver collect that grows with found
    # pairs) or the corpus-cardinality wide-array sset dim; under AQE
    # whether the runtime demotion wins is a stage-scheduling RACE
    # (observed both ways at the k=100 fold: same plan succeeded in one
    # session and aborted on spark.driver.maxResultSize in another).
    return (
        pairs.join(
            _hinted_dim(shingle_sets.alias("sa"), dim_hint),
            F.col("doc_a") == F.col("sa.doc_id"),
        )
        .join(
            _hinted_dim(shingle_sets.alias("sb"), dim_hint),
            F.col("doc_b") == F.col("sb.doc_id"),
        )
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_candidate_pairs(
        load_table(spark, sf_dir, "documents"), dim_hint=_docs_dim_hint(sf_dir)
    )


_PAIRS_ORACLE = (
    "WITH " + _signature_sql_cte() + _bands_sql_cte() + f"""
, bsize AS (
  SELECT band_id, band_hash, count(*) AS n FROM bands GROUP BY 1, 2
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  JOIN bsize s
    ON a.band_id = s.band_id AND a.band_hash = s.band_hash
  WHERE s.n <= {MAX_BUCKET_SIZE}
), ssets AS (
  SELECT doc_id, list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
)
SELECT doc_a, doc_b,
  CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
    / CAST(len(list_distinct(list_concat(sa.sset, sb.sset))) AS DOUBLE) AS jaccard
FROM pairs
JOIN ssets sa ON pairs.doc_a = sa.doc_id
JOIN ssets sb ON pairs.doc_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
    / CAST(len(list_distinct(list_concat(sa.sset, sb.sset))) AS DOUBLE)
    >= {JACCARD_THRESHOLD}
"""
)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via inverted index (the non-LSH near-dup path)
# ---------------------------------------------------------------------------

#: Shingles occurring in more documents than this are excluded from the
#: similarity space entirely: a boilerplate shingle shared by half the
#: corpus would generate O(n²) candidates from one posting list, and
#: counting boilerplate toward similarity inflates Jaccard between
#: unrelated documents anyway (the same reason near-dup pipelines strip
#:  headers/footers before shingling). Jaccard here is therefore EXACT
#: over the sub-cap shingle space: capped shingles count toward neither
#: intersection nor union.
NGRAM_DF_CAP = 100


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    pre_shingled: bool = False,
    dim_hint: str = "shuffle_hash",
    df_cap: int | None = None,  # None -> NGRAM_DF_CAP, read at call time
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle index.

    Unlike MinHash-LSH (probabilistic recall), this finds EVERY pair whose
    sub-cap-shingle Jaccard clears the threshold. Plan shape (each step one
    narrow shuffle, nothing wider than a few longs ever moves):

    1. explode distinct shingles to (doc_id, shingle) postings;
    2. ONE hash-aggregate groups postings into per-shingle sorted id
       lists and drops df > NGRAM_DF_CAP groups (skew guard + boilerplate
       exclusion in the same pass);
    3. per-doc set sizes fall out of the same grouped table (re-explode the
       tiny id lists — ~|postings| rows of two longs, no second scan of the
       documents table);
    4. in-group pair expansion (bounded by the df cap) then ONE count
       aggregate per (doc_a, doc_b) — the count IS the exact intersection
       size, because each shared sub-cap shingle contributes exactly one
       grouped row;
    5. union comes from |A| + |B| - |A∩B| via two joins against the
       per-doc size dimension (two longs per document; AQE broadcasts it
       while it fits and shuffle-joins beyond that) — the wide shingle
       arrays are never shuffled and never compared element-wise.

    The earlier form of this operator self-joined the posting list and then
    re-joined full shingle arrays for an array_intersect/array_union pass;
    at sf0.1 that moved ~1.1M candidate pairs x two 50-element arrays
    through two shuffles (11 s). The count-based form does the same exact
    math on integers (3-4x faster locally, and the gap widens with document
    size since verification cost no longer depends on |sset|).
    """
    if df_cap is None:
        df_cap = NGRAM_DF_CAP
    if pre_shingled:  # docs is (doc_id, sset) — e.g. shared with the LSH path
        posting = docs.select("doc_id", F.explode("sset").alias("shingle"))
    else:
        # one Arrow kernel instead of the interpreted tokenize/shingle/
        # distinct/explode lambda chain (text_kernels, guide §4.2) —
        # identical posting rows, ~6x faster map stage at sf0.1
        posting = tk.shingle_postings(spread(docs))
    groups = (
        posting.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") <= df_cap)
        .select("ids")
        .persist()
    )
    sizes = (
        groups.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("set_sz"))
    )
    inter = (
        groups.filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    jaccard = F.col("n_inter").cast("double") / (
        F.col("sa.set_sz") + F.col("sb.set_sz") - F.col("n_inter")
    ).cast("double")
    # explicit dim-as-build strategy (dim_hint): the static planner's
    # size estimate for the exploded-pair aggregate runs BELOW the
    # dimension's, so left alone it broadcast the PAIR frame — fine at
    # sf0.1 (~20 MB), a 2 GiB driver collect that killed the job at the
    # k=100 fold (maxResultSize), and never the right side at any scale.
    return (
        inter.join(
            _hinted_dim(sizes.alias("sa"), dim_hint),
            F.col("doc_a") == F.col("sa.doc_id"),
        )
        .join(
            _hinted_dim(sizes.alias("sb"), dim_hint),
            F.col("doc_b") == F.col("sb.doc_id"),
        )
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def q_dedup_jaccard_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), dim_hint=_docs_dim_hint(sf_dir)
    )


_JACCARD_NGRAM_ORACLE = f"""
WITH ssets AS (
  SELECT doc_id,
         list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
  WHERE len({tx.shingles_sql(tx.tokens_sql("text"))}) > 0
), posting AS (
  SELECT doc_id, unnest(sset) AS shingle FROM ssets
), rare AS (
  SELECT shingle FROM posting GROUP BY shingle
  HAVING count(*) <= {NGRAM_DF_CAP}
), p AS (
  SELECT posting.doc_id, posting.shingle FROM posting
  JOIN rare USING (shingle)
), sz AS (
  SELECT doc_id, count(*) AS set_sz FROM p GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(n_inter AS DOUBLE)
    / CAST(sa.set_sz + sb.set_sz - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sz sa ON inter.doc_a = sa.doc_id
JOIN sz sb ON inter.doc_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE)
    / CAST(sa.set_sz + sb.set_sz - n_inter AS DOUBLE)
    >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# SimHash-32
# ---------------------------------------------------------------------------

def _simhash_expr_spark() -> str:
    """Sum over bits of CASE WHEN majority-vote(bit_j) > 0 THEN 2^j END,
    folded over the per-token 32-bit hash array ``hvals``."""
    terms = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"aggregate(hvals, 0, (acc, v) -> "
            f"acc + CASE WHEN (v >> {j}) & 1 = 1 THEN 1 ELSE -1 END)"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)")
    return " + ".join(terms)


def _simhash_expr_duck() -> str:
    terms = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform(hvals, v -> "
            f"CASE WHEN (v >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)")
    return " + ".join(terms)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        spread(docs)
        .withColumn("toks", tx.tokens_col("text"))
        .withColumn(
            "hvals",
            F.expr(
                "transform(toks, t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))"
            ),
        )
        .select(
            "doc_id",
            F.expr(_simhash_expr_spark()).alias("simhash"),
        )
    )


_SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), hashed AS (
  SELECT doc_id,
    list_transform(toks, t -> CAST('0x' || substring(md5(t), 1, 8) AS BIGINT)) AS hvals
  FROM tok
)
SELECT doc_id, {_simhash_expr_duck()} AS simhash
FROM hashed
"""


# ---------------------------------------------------------------------------
# incremental dedup: a delta crawl against the existing corpus index
# ---------------------------------------------------------------------------

#: every doc_id divisible by this plays the "newly crawled delta" role;
#: the rest are the already-indexed corpus
INCR_DELTA_MODULUS = 5


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup flow: new documents (the delta) are checked
    against the EXISTING corpus's LSH index, never against each other and
    never all-pairs — per delta doc, how many indexed near-dups it has,
    its best match (min doc_id among verified matches), and the admit
    decision.

    Scale shape: the index side's band table is exactly what a pipeline
    persists between crawls (here recomputed from the fixture — the plan
    from the banded join onward is the steady-state shape). The join is
    delta-bands x index-bands on (band_id, band_hash) with the mega-bucket
    guard on the index side; only candidate id pairs shuffle; exact
    Jaccard verifies candidates only; one final per-delta-doc aggregate.
    Cost scales with |delta| x collision rate, not |corpus|.
    """
    docs = load_table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % INCR_DELTA_MODULUS == 0
    # fused Arrow shingle+signature kernel (text_kernels, guide §4.2);
    # MinHash over the distinct set equals MinHash over the raw bag
    shingled = tk.shingle_sets_signed(spread(docs), N_HASHES).persist()
    bands = lsh_bands(shingled, pre_signed=True).persist()
    delta_bands = bands.filter(is_delta)
    index_bands = bands.filter(~is_delta)
    ok = (
        index_bands.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") <= MAX_BUCKET_SIZE)
        .select("band_id", "band_hash")
    )
    cand = (
        delta_bands.withColumnRenamed("doc_id", "delta_id")
        .join(index_bands.join(ok, ["band_id", "band_hash"]), ["band_id", "band_hash"])
        .select("delta_id", F.col("doc_id").alias("index_id"))
        .distinct()
    )
    ssets = shingled.select("doc_id", "sset")
    inter = F.size(F.array_intersect("sa.sset", "sb.sset"))
    union = F.size(F.array_union("sa.sset", "sb.sset"))
    # explicit dim-as-build strategy — see minhash_candidate_pairs:
    # static broadcast of either side is a driver-collect race at scale
    dim_hint = _docs_dim_hint(sf_dir)
    verified = (
        cand.join(
            _hinted_dim(ssets.alias("sa"), dim_hint),
            F.col("delta_id") == F.col("sa.doc_id"),
        )
        .join(
            _hinted_dim(ssets.alias("sb"), dim_hint),
            F.col("index_id") == F.col("sb.doc_id"),
        )
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("delta_id", "index_id")
    )
    matches = verified.groupBy("delta_id").agg(
        F.count("*").alias("n_index_dups"),
        F.min("index_id").alias("best_match_id"),
    )
    delta_docs = docs.filter(is_delta).select("doc_id")
    return (
        delta_docs.join(
            matches, delta_docs.doc_id == matches.delta_id, "left"
        )
        .select(
            "doc_id",
            F.coalesce("n_index_dups", F.lit(0)).alias("n_index_dups"),
            "best_match_id",
            F.col("n_index_dups").isNull().alias("admit"),
        )
    )


_INCREMENTAL_ORACLE = (
    "WITH " + _signature_sql_cte() + _bands_sql_cte() + f"""
, index_bands AS (
  SELECT * FROM bands WHERE doc_id % {INCR_DELTA_MODULUS} != 0
), delta_bands AS (
  SELECT * FROM bands WHERE doc_id % {INCR_DELTA_MODULUS} = 0
), ok AS (
  SELECT band_id, band_hash FROM index_bands
  GROUP BY 1, 2 HAVING count(*) <= {MAX_BUCKET_SIZE}
), cand AS (
  SELECT DISTINCT d.doc_id AS delta_id, i.doc_id AS index_id
  FROM delta_bands d
  JOIN index_bands i ON d.band_id = i.band_id AND d.band_hash = i.band_hash
  JOIN ok ON d.band_id = ok.band_id AND d.band_hash = ok.band_hash
), ssets AS (
  SELECT doc_id, list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
), verified AS (
  SELECT delta_id, index_id
  FROM cand
  JOIN ssets sa ON cand.delta_id = sa.doc_id
  JOIN ssets sb ON cand.index_id = sb.doc_id
  WHERE CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(sa.sset, sb.sset))) AS DOUBLE)
      >= {JACCARD_THRESHOLD}
), matches AS (
  SELECT delta_id, count(*) AS n_index_dups, min(index_id) AS best_match_id
  FROM verified GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(m.n_index_dups, 0) AS n_index_dups,
       m.best_match_id,
       m.n_index_dups IS NULL AS admit
FROM (SELECT doc_id FROM documents WHERE doc_id % {INCR_DELTA_MODULUS} = 0) d
LEFT JOIN matches m ON d.doc_id = m.delta_id
"""
)


# ---------------------------------------------------------------------------
# near-duplicate clusters (connected components over the candidate graph)
# ---------------------------------------------------------------------------

#: safety bound; real near-dup graphs converge in a handful of rounds
#: (diameter of duplicate clusters is tiny), and each round is one join
MAX_CC_ITERATIONS = 15


#: target edges per CC partition: the loop's state is (long, long) rows, so
#: ~1M rows/partition keeps every round's shuffle block well under executor
#: memory while bounding task count on small graphs (the duplicate-edge
#: graph of a lightly-duplicated corpus is TINY relative to the corpus —
#: without this the loop schedules hundreds of near-empty tasks per round)
CC_EDGES_PER_PARTITION = 1_000_000

#: below this edge count the component computation runs as driver-side
#: union-find on the COLLECTED edge list (two longs per edge -> ~1.6 MB at
#: the cap) instead of iterative Spark rounds: the duplicate graph of a
#: lightly-duplicated corpus is minuscule next to the corpus, and each
#: distributed round costs a join + checkpoint of fixed scheduler latency.
#: The same adaptivity Spark itself applies when it broadcasts a small join
#: side; above the cap the distributed loop takes over unchanged, so the
#: operator never depends on the graph fitting anywhere.
CC_DRIVER_MAX_EDGES = 100_000


def _driver_union_find(spark, both: DataFrame) -> DataFrame:
    """Exact same contract as the distributed loop — (doc_id, label) with
    label = min reachable doc_id — via path-compressed union-find over the
    collected (bounded, see CC_DRIVER_MAX_EDGES) edge list."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in both.toLocalIterator():
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the label (keeper semantics)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(x, find(x)) for x in parent]
    return spark.createDataFrame(rows, schema="doc_id long, label long")


def connected_components(edges: DataFrame) -> DataFrame:
    """Minimum-label propagation: every vertex converges to the smallest
    doc_id reachable from it — the cluster representative ("keeper").

    Iterative joins, NO driver-side graph: each round joins current labels
    across edges and keeps the min; terminates when a round changes
    nothing. Rounds needed = cluster diameter (near-dup clusters are
    shallow), so at scale this is a few narrow shuffles, not a GraphX
    dependency. Input: (doc_a, doc_b) with doc_a < doc_b.

    Per-round cost control: the edge list is materialized ONCE and
    repartitioned to match its measured size (CC_EDGES_PER_PARTITION), so
    rounds on a small duplicate graph don't inherit the corpus-sized task
    count; the convergence check rides on the checkpointed round result
    (old label kept as a column) instead of a separate labels-vs-labels
    join — one aggregate + one join + one short count per round.
    """
    both = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    # materialize the edge list once — every propagation round joins it,
    # and without this each round re-executes the whole pair-generation
    # lineage (measured ~3x the query cost at sf0.1). Lazy: the count()
    # below materializes it, so an eager cut would pay a duplicate job.
    ).localCheckpoint(eager=False)
    n_edges = both.count()
    spark = both.sparkSession
    if n_edges <= 2 * CC_DRIVER_MAX_EDGES:  # `both` holds each edge twice
        return _driver_union_find(spark, both)
    n_parts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-n_edges // CC_EDGES_PER_PARTITION),
        ),
    )
    both = both.repartition(n_parts, "doc_b").localCheckpoint(eager=False)
    labels = (
        both.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    for _ in range(MAX_CC_ITERATIONS):
        neighbor_min = (
            both.join(labels, both.doc_b == labels.doc_id)
            .groupBy(both.doc_a.alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # keep the previous label alongside the new one so the convergence
        # check is a filter over THIS round's checkpointed output
        round_out = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            # truncate lineage per round, or iteration N recomputes all
            # N-1. Lazy: the convergence count below materializes it.
            .localCheckpoint(eager=False)
        )
        changed = (
            round_out.filter(F.col("label") != F.col("old_label")).limit(1).count()
        )
        labels = round_out.select("doc_id", "label")
        if changed == 0:
            break
    return labels


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster summary over the verified near-dup pairs: one row per
    duplicate cluster with its keeper (min doc_id) and member count —
    the dedup decision table a 100 TB pipeline joins against to drop
    non-keepers."""
    pairs = minhash_candidate_pairs(
        load_table(spark, sf_dir, "documents"), dim_hint=_docs_dim_hint(sf_dir)
    )
    labels = connected_components(pairs.select("doc_a", "doc_b"))
    # members is a comma-joined string, not an array: the driver's compare
    # harness canonicalizes rows via pandas sorting, which cannot hash list
    # cells — scalar columns only in any registered query output.
    return labels.groupBy(F.col("label").alias("keeper_doc_id")).agg(
        F.count("*").alias("cluster_size"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("members"),
    )


# Shared CTE chain: the pairs oracle's candidates -> verified edges ->
# recursive min-label closure (used by the clusters report AND the
# surviving-corpus apply form).
_CLUSTERS_CTES = (
    "WITH RECURSIVE "
    + _signature_sql_cte().lstrip()
    + _bands_sql_cte()
    + f"""
, bsize AS (
  SELECT band_id, band_hash, count(*) AS n FROM bands GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  JOIN bsize s
    ON a.band_id = s.band_id AND a.band_hash = s.band_hash
  WHERE s.n <= {MAX_BUCKET_SIZE}
), ssets AS (
  SELECT doc_id, list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
), edges AS (
  SELECT doc_a, doc_b FROM cand
  JOIN ssets sa ON cand.doc_a = sa.doc_id
  JOIN ssets sb ON cand.doc_b = sb.doc_id
  WHERE CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(sa.sset, sb.sset))) AS DOUBLE)
      >= {JACCARD_THRESHOLD}
), sym AS (
  SELECT doc_a, doc_b FROM edges
  UNION ALL SELECT doc_b, doc_a FROM edges
), reach(doc_id, label) AS (
  SELECT doc_a, doc_a FROM sym
  UNION
  SELECT sym.doc_a, reach.label
  FROM sym JOIN reach ON sym.doc_b = reach.doc_id
  WHERE reach.label < sym.doc_a
)
"""
)

_CLUSTERS_ORACLE = _CLUSTERS_CTES + """
SELECT keeper_doc_id,
       count(*) AS cluster_size,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
FROM (SELECT doc_id, min(label) AS keeper_doc_id FROM reach GROUP BY doc_id)
GROUP BY keeper_doc_id
"""


#: containment cutoff: |A∩B| / min(|A|,|B|) — Broder's containment, the
#: measure that catches a short document embedded in a long one (their
#: Jaccard is diluted by the length difference; containment is not)
CONTAINMENT_THRESHOLD = 0.6


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs over the same DF-capped inverted shingle
    index as dedup_jaccard_ngram (steps 1-4 identical: postings -> capped
    groups -> pair counts); only the verification formula changes —
    |A∩B| / min(|A|,|B|) instead of over the union — so subset
    duplication (quote blocks, excerpts, short-in-long mirrors) surfaces
    even where Jaccard stays below any sane threshold. Reports both
    measures per pair so downstream policy can separate 'same doc' from
    'contained doc'."""
    docs = load_table(spark, sf_dir, "documents")
    # Arrow posting kernel — see ngram_jaccard_pairs (identical rows,
    # guide §4.2)
    posting = tk.shingle_postings(spread(docs))
    groups = (
        posting.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") <= NGRAM_DF_CAP)
        .select("ids")
        .persist()
    )
    sizes = (
        groups.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("set_sz"))
    )
    inter = (
        groups.filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    containment = F.col("n_inter").cast("double") / F.least(
        F.col("sa.set_sz"), F.col("sb.set_sz")
    ).cast("double")
    jaccard = F.col("n_inter").cast("double") / (
        F.col("sa.set_sz") + F.col("sb.set_sz") - F.col("n_inter")
    ).cast("double")
    # explicit dim-as-build strategy — see ngram_jaccard_pairs: the
    # static planner otherwise broadcasts the PAIR frame off a bogus
    # estimate (2 GiB driver collect at the k=100 fold)
    dim_hint = _docs_dim_hint(sf_dir)
    return (
        inter.join(
            _hinted_dim(sizes.alias("sa"), dim_hint),
            F.col("doc_a") == F.col("sa.doc_id"),
        )
        .join(
            _hinted_dim(sizes.alias("sb"), dim_hint),
            F.col("doc_b") == F.col("sb.doc_id"),
        )
        .withColumn("containment", containment)
        .withColumn("jaccard", jaccard)
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", "containment", "jaccard")
    )


_CONTAINMENT_ORACLE = f"""
WITH ssets AS (
  SELECT doc_id,
         list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
  WHERE len({tx.shingles_sql(tx.tokens_sql("text"))}) > 0
), posting AS (
  SELECT doc_id, unnest(sset) AS shingle FROM ssets
), rare AS (
  SELECT shingle FROM posting GROUP BY shingle
  HAVING count(*) <= {NGRAM_DF_CAP}
), p AS (
  SELECT posting.doc_id, posting.shingle FROM posting
  JOIN rare USING (shingle)
), sz AS (
  SELECT doc_id, count(*) AS set_sz FROM p GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(n_inter AS DOUBLE) / CAST(least(sa.set_sz, sb.set_sz) AS DOUBLE)
    AS containment,
  CAST(n_inter AS DOUBLE)
    / CAST(sa.set_sz + sb.set_sz - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sz sa ON inter.doc_a = sa.doc_id
JOIN sz sb ON inter.doc_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / CAST(least(sa.set_sz, sb.set_sz) AS DOUBLE)
      >= {CONTAINMENT_THRESHOLD}
"""


def q_dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the near-dup graph: how many clusters
    exist at each size, plus the documents they absorb — the shape that
    distinguishes benign pairwise duplication from a boilerplate blob
    (one giant cluster). Aggregate over the CC labels, then an aggregate
    of THAT aggregate — both tiny after the pair stage."""
    pairs = minhash_candidate_pairs(
        load_table(spark, sf_dir, "documents"), dim_hint=_docs_dim_hint(sf_dir)
    )
    labels = connected_components(pairs.select("doc_a", "doc_b"))
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.count("*") * F.col("cluster_size")).cast("long").alias("n_docs"),
    )


_CLUSTER_HISTOGRAM_ORACLE = _CLUSTERS_CTES + """
, sizes AS (
  SELECT keeper, count(*) AS cluster_size
  FROM (SELECT doc_id, min(label) AS keeper FROM reach GROUP BY doc_id)
  GROUP BY keeper
)
SELECT cluster_size, count(*) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
"""


def q_dedup_fuzzy_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY form of fuzzy dedup: the corpus AFTER dropping every
    near-dup cluster member except its keeper (min doc_id) — what
    actually feeds the tokenizer. The non-keeper id set LEFT ANTI joins
    against the full document table — ids only move, and the join
    strategy is left to AQE: on a lightly-duplicated corpus the set is
    broadcastable, but on crawl data duplicates can be a large fraction
    of the corpus, where a forced broadcast would OOM and a shuffled
    anti join on doc_id is correct."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, dim_hint=_docs_dim_hint(sf_dir))
    labels = connected_components(pairs.select("doc_a", "doc_b"))
    non_keepers = labels.filter(F.col("doc_id") != F.col("label")).select("doc_id")
    return docs.join(non_keepers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


_FUZZY_SURVIVORS_ORACLE = _CLUSTERS_CTES + """
, non_keepers AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(label) AS keeper FROM reach GROUP BY doc_id
  ) WHERE doc_id != keeper
)
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM non_keepers)
"""


def q_dedup_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION table: for each strategy tier — exact content
    hash, fuzzy MinHash-LSH clusters, sub-document span pressure,
    embedding-semantic (SemDeDup, over the shared id space like the
    multisignal gate) — how many documents and TOKENS it would remove,
    as a fraction of the corpus. Fuzzy costs ~10x exact and semantic
    needs embeddings for everything; this report is how an owner decides
    which tiers pay for themselves before burning the compute. Composed
    entirely from the already-oracle-verified stage operators; each tier
    is measured independently (not cascaded — overlaps are visible by
    comparing rows)."""
    from mysql_streamer_spark.queries.pipeline import SPAN_MAX_DUP_FRAC
    from mysql_streamer_spark.queries.pipeline import (
        q_pipeline_span_dedup,
    )
    from mysql_streamer_spark.queries.similarity import q_sim_semdedup

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.size(tx.tokens_col("text")).alias("n_toks")
    ).persist()
    total = tok.agg(
        F.count("*").alias("corpus_docs"),
        F.sum("n_toks").alias("corpus_tokens"),
    )

    exact_removed = (
        docs.select(
            "doc_id",
            F.row_number()
            .over(
                Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
            )
            .alias("rn"),
        )
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    fuzzy_removed = (
        connected_components(
            minhash_candidate_pairs(
                docs, dim_hint=_docs_dim_hint(sf_dir)
            ).select("doc_a", "doc_b")
        )
        .filter(F.col("doc_id") != F.col("label"))
        .select("doc_id")
    )
    span_removed = (
        q_pipeline_span_dedup(spark, sf_dir)
        .filter(~F.col("keep"))
        .select("doc_id")
    )
    sem_removed = (
        q_sim_semdedup(spark, sf_dir)
        .filter(~F.col("keep"))
        .select(F.col("vec_id").alias("doc_id"))
    )

    def tier(name: str, removed: DataFrame) -> DataFrame:
        return (
            removed.join(tok, "doc_id")
            .agg(
                F.count("*").alias("n_docs_removed"),
                F.coalesce(F.sum("n_toks"), F.lit(0)).alias(
                    "n_tokens_removed"
                ),
            )
            .withColumn("stage", F.lit(name))
        )

    report = (
        tier("exact", exact_removed)
        .unionByName(tier("fuzzy", fuzzy_removed))
        .unionByName(tier("span", span_removed))
        .unionByName(tier("semantic", sem_removed))
    )
    return report.crossJoin(F.broadcast(total)).select(
        "stage",
        "n_docs_removed",
        "n_tokens_removed",
        (
            F.col("n_tokens_removed").cast("double")
            / F.col("corpus_tokens").cast("double")
        ).alias("frac_tokens_removed"),
    )


def _budget_report_oracle() -> str:
    from mysql_streamer_spark.queries.pipeline import _SPAN_DEDUP_ORACLE
    from mysql_streamer_spark.queries.similarity import _SEMDEDUP_ORACLE

    return (
        _CLUSTERS_CTES
        + f"""
, btok AS (
  SELECT doc_id, len({tx.tokens_sql("text")}) AS n_toks FROM documents
), total AS (
  SELECT sum(n_toks) AS corpus_tokens FROM btok
), exact_removed AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (
      PARTITION BY sha256(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn > 1
), fuzzy_removed AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(label) AS keeper FROM reach GROUP BY doc_id
  ) WHERE doc_id != keeper
), span_removed AS (
  SELECT doc_id FROM ({_SPAN_DEDUP_ORACLE}) WHERE NOT keep
), sem_removed AS (
  SELECT vec_id AS doc_id FROM ({_SEMDEDUP_ORACLE}) WHERE NOT keep
), tiers AS (
  SELECT 'exact' AS stage, doc_id FROM exact_removed
  UNION ALL SELECT 'fuzzy', doc_id FROM fuzzy_removed
  UNION ALL SELECT 'span', doc_id FROM span_removed
  UNION ALL SELECT 'semantic', doc_id FROM sem_removed
), agg AS (
  SELECT stage,
         count(*) AS n_docs_removed,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens_removed
  FROM tiers JOIN btok USING (doc_id)
  GROUP BY stage
), stage_names(stage) AS (
  VALUES ('exact'), ('fuzzy'), ('span'), ('semantic')
)
SELECT s.stage,
       CAST(coalesce(n_docs_removed, 0) AS BIGINT) AS n_docs_removed,
       CAST(coalesce(n_tokens_removed, 0) AS BIGINT) AS n_tokens_removed,
       CAST(coalesce(n_tokens_removed, 0) AS DOUBLE)
         / CAST((SELECT corpus_tokens FROM total) AS DOUBLE)
         AS frac_tokens_removed
FROM stage_names s LEFT JOIN agg ON s.stage = agg.stage
"""
    )


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplication rate PER SOURCE — the triage table that tells a
    crawl owner which feeds re-send content (dedup effort goes where the
    rate is). One md5 + one aggregate keyed by source; the rate divides
    two exact counts once."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.md5("text").alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            (F.col("n_docs") - F.col("n_unique")).alias("n_dups"),
            (
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
        )
    )


_RATE_BY_SOURCE_ORACLE = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_unique,
       count(*) - count(DISTINCT md5(text)) AS n_dups,
       CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_rate
FROM documents GROUP BY source
"""


def q_dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH sources duplicate WHICH: near-dup pairs rolled up by the
    unordered source pair — the mirror-detection table (a feed that
    near-duplicates another feed is a mirror/scraper and one of them
    should be down-weighted or dropped; the diagonal is in-source
    duplication). min/max Jaccard per cell instead of a mean: exact and
    order-independent, so the cross-engine check stays bit-stable.

    Scale shape: the pair pipeline's cost (id-only shuffles) plus two
    joins against the (doc_id, source) dimension and one aggregate on a
    ≤ |sources|² key."""
    docs = load_table(spark, sf_dir, "documents")
    dim_hint = _docs_dim_hint(sf_dir)
    pairs = minhash_candidate_pairs(docs, dim_hint=dim_hint)
    src = docs.select("doc_id", "source")
    # explicit dim-as-build strategy — see minhash_candidate_pairs
    joined = (
        pairs.join(
            _hinted_dim(
                src.select(
                    F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
                ),
                dim_hint,
            ),
            "doc_a",
        ).join(
            _hinted_dim(
                src.select(
                    F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
                ),
                dim_hint,
            ),
            "doc_b",
        )
    )
    return (
        joined.select(
            F.least("sa", "sb").alias("source_lo"),
            F.greatest("sa", "sb").alias("source_hi"),
            "jaccard",
        )
        .groupBy("source_lo", "source_hi")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


_CROSS_SOURCE_ORACLE = f"""
WITH pairs AS ({_PAIRS_ORACLE}),
src AS (SELECT doc_id, source FROM documents),
joined AS (
  SELECT least(sa.source, sb.source) AS source_lo,
         greatest(sa.source, sb.source) AS source_hi,
         jaccard
  FROM pairs
  JOIN src sa ON pairs.doc_a = sa.doc_id
  JOIN src sb ON pairs.doc_b = sb.doc_id
)
SELECT source_lo, source_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       min(jaccard) AS min_jaccard,
       max(jaccard) AS max_jaccard
FROM joined
GROUP BY 1, 2
"""


#: Jaccard calibration points (>= JACCARD_THRESHOLD so one candidate
#: generation serves every point)
DEDUP_SWEEP_THRESHOLDS = (0.3, 0.5, 0.7)


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard threshold calibration from ONE MinHash pair generation:
    surviving pair / affected-document counts per cutoff — the dedup
    twin of sim_threshold_sweep (pick the production threshold from the
    measured curve, not a guess). Scale shape: pairs explode to
    (doc_id, jaccard) rows and every count is a conditional
    sum/countDistinct — partial-aggregatable and parallel, no
    collect_list pulling all surviving ids into one reducer's buffer
    (each pair holds doc_a < doc_b, so n_pairs = exploded rows / 2)."""
    pairs = minhash_candidate_pairs(
        load_table(spark, sf_dir, "documents"), dim_hint=_docs_dim_hint(sf_dir)
    )
    ids = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc"), "jaccard"
    )
    aggs = []
    for t in DEDUP_SWEEP_THRESHOLDS:
        tag = str(int(t * 100))
        aggs += [
            (F.sum(F.when(F.col("jaccard") >= t, 1).otherwise(0)) / 2)
            .cast("long")
            .alias(f"n_pairs_{tag}"),
            F.countDistinct(
                F.when(F.col("jaccard") >= t, F.col("doc"))
            ).alias(f"n_docs_{tag}"),
        ]
    return ids.agg(*aggs)


def _dedup_sweep_oracle() -> str:
    cols = ",\n  ".join(
        f"CAST(sum(CASE WHEN jaccard >= {t} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_pairs_{int(t * 100)},\n  "
        f"len(list_distinct(flatten(list(CASE WHEN jaccard >= {t}"
        f" THEN [doc_a, doc_b] ELSE CAST([] AS BIGINT[]) END))))"
        f" AS n_docs_{int(t * 100)}"
        for t in DEDUP_SWEEP_THRESHOLDS
    )
    return f"SELECT\n  {cols}\nFROM ({_PAIRS_ORACLE}) scored_pairs"


_DEDUP_SWEEP_ORACLE = _dedup_sweep_oracle()


def q_dedup_pair_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement audit between the two independent near-dup pipelines —
    MinHash-LSH (probabilistic recall, full shingle space) and the
    DF-capped inverted-index exact path. The pair sets legitimately
    differ (LSH can miss; the capped path scores over the sub-cap shingle
    space), and THIS query quantifies that: both/only-LSH/only-ngram
    counts plus the LSH path's agreement rate. The same evaluation shape
    as sim_ann_recall, over text. Cost = both pipelines, which here SHARE
    one tokenize/shingle scan (persisted distinct-shingle sets feed the
    LSH signatures, the LSH Jaccard verify, and the inverted index —
    MinHash over distinct shingles equals MinHash over the raw bag, since
    duplicates never change a min); the final full-outer join moves id
    pairs only."""
    docs = load_table(spark, sf_dir, "documents")
    # fused Arrow shingle+signature kernel (text_kernels, guide §4.2):
    # MinHash over the distinct set equals MinHash over the raw bag, so
    # both consumers read the one persisted signed frame
    shingled = tk.shingle_sets_signed(spread(docs), N_HASHES).persist()
    dim_hint = _docs_dim_hint(sf_dir)
    lsh = minhash_candidate_pairs(
        shingled, pre_signed=True, dim_hint=dim_hint
    ).select("doc_a", "doc_b")
    ng = ngram_jaccard_pairs(
        shingled.select("doc_id", "sset"),
        pre_shingled=True,
        dim_hint=dim_hint,
    ).select(F.col("doc_a").alias("ng_a"), F.col("doc_b").alias("ng_b"))
    joined = lsh.join(
        ng, (lsh.doc_a == ng.ng_a) & (lsh.doc_b == ng.ng_b), "full_outer"
    )
    in_both = F.col("doc_a").isNotNull() & F.col("ng_a").isNotNull()
    return joined.agg(
        F.sum(F.when(in_both, 1).otherwise(0)).alias("n_both"),
        F.sum(F.when(F.col("ng_a").isNull(), 1).otherwise(0)).alias("n_lsh_only"),
        F.sum(F.when(F.col("doc_a").isNull(), 1).otherwise(0)).alias(
            "n_ngram_only"
        ),
    ).select(
        "n_both",
        "n_lsh_only",
        "n_ngram_only",
        (
            F.col("n_both").cast("double")
            / (F.col("n_both") + F.col("n_ngram_only")).cast("double")
        ).alias("lsh_agreement_rate"),
    )


_PAIR_AGREEMENT_ORACLE = f"""
WITH lsh AS (SELECT doc_a, doc_b FROM ({_PAIRS_ORACLE}) t),
     ng  AS (SELECT doc_a AS ng_a, doc_b AS ng_b
             FROM ({_JACCARD_NGRAM_ORACLE}) t),
     j AS (
       SELECT lsh.doc_a, lsh.doc_b, ng.ng_a, ng.ng_b
       FROM lsh FULL OUTER JOIN ng
         ON lsh.doc_a = ng.ng_a AND lsh.doc_b = ng.ng_b
     ),
     agg AS (
       SELECT
         CAST(sum(CASE WHEN doc_a IS NOT NULL AND ng_a IS NOT NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(sum(CASE WHEN ng_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lsh_only,
         CAST(sum(CASE WHEN doc_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ngram_only
       FROM j
     )
SELECT n_both, n_lsh_only, n_ngram_only,
       CAST(n_both AS DOUBLE) / CAST(n_both + n_ngram_only AS DOUBLE)
         AS lsh_agreement_rate
FROM agg
"""


# ---------------------------------------------------------------------------
# MinHash estimator accuracy audit (signature agreement vs exact Jaccard)
# ---------------------------------------------------------------------------

def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ACCURACY audit: for every LSH candidate pair, the Jaccard
    estimate implied by the signature (fraction of agreeing components)
    next to the exact Jaccard — the per-pair twin of the aggregate
    pair-agreement query, and the number that justifies N_HASHES. In a
    production pipeline this runs on a sample to decide whether the
    signature is wide enough before committing to a corpus-wide dedup.

    Scale shape: identical to minhash_candidate_pairs (the signature table
    is computed once and persisted; pairs generate in-bucket, id-only)
    plus one extra join of the fixed-width signature row per pair — no new
    shuffle of document content.

    The persisted frame carries BOTH the shingle array and the 128
    signature components, so the three consumers (band keys, the exact
    Jaccard join, the per-pair agreement join) all read the cache — the
    shingle→md5→slice-min pipeline runs exactly once. Re-deriving the
    signatures for the agreement join (the pre-r7 shape) doubled the map
    work and showed up as a 1.57x bench regression at sf0.1."""
    docs = load_table(spark, sf_dir, "documents")
    # fused Arrow shingle+signature kernel (text_kernels, guide §4.2) —
    # identical sset/sig values to the interpreted JVM lambda chain
    sig_full = tk.shingle_sets_signed(spread(docs), N_HASHES).persist()
    sig = sig_full.select("doc_id", *[f"sig_{i}" for i in range(N_HASHES)])
    dim_hint = _docs_dim_hint(sf_dir)
    pairs = minhash_candidate_pairs(
        sig_full, threshold=0.0, pre_signed=True, dim_hint=dim_hint
    )
    matches = None
    for i in range(N_HASHES):
        term = (F.col(f"sa.sig_{i}") == F.col(f"sb.sig_{i}")).cast("int")
        matches = term if matches is None else (matches + term)
    # explicit dim-as-build strategy — see minhash_candidate_pairs:
    # static broadcast of either side is a driver-collect race at scale
    return (
        pairs.join(
            _hinted_dim(sig.alias("sa"), dim_hint),
            F.col("doc_a") == F.col("sa.doc_id"),
        )
        .join(
            _hinted_dim(sig.alias("sb"), dim_hint),
            F.col("doc_b") == F.col("sb.doc_id"),
        )
        .withColumn("est_matches", matches)
        .select(
            "doc_a",
            "doc_b",
            "est_matches",
            (F.col("est_matches").cast("double") / F.lit(float(N_HASHES))).alias(
                "est_jaccard"
            ),
            "jaccard",
            F.abs(
                F.col("est_matches").cast("double") / F.lit(float(N_HASHES))
                - F.col("jaccard")
            ).alias("abs_err"),
        )
    )


_MINHASH_ESTIMATE_ORACLE = (
    "WITH " + _signature_sql_cte() + _bands_sql_cte() + f"""
, bsize AS (
  SELECT band_id, band_hash, count(*) AS n FROM bands GROUP BY 1, 2
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  JOIN bsize s
    ON a.band_id = s.band_id AND a.band_hash = s.band_hash
  WHERE s.n <= {MAX_BUCKET_SIZE}
), ssets AS (
  SELECT doc_id, list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
), scored AS (
  SELECT doc_a, doc_b,
    ({" + ".join(f"CASE WHEN ga.sig_{i} = gb.sig_{i} THEN 1 ELSE 0 END" for i in range(N_HASHES))})
      AS est_matches,
    CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(sa.sset, sb.sset))) AS DOUBLE)
      AS jaccard
  FROM pairs
  JOIN ssets sa ON pairs.doc_a = sa.doc_id
  JOIN ssets sb ON pairs.doc_b = sb.doc_id
  JOIN sigs ga ON pairs.doc_a = ga.doc_id
  JOIN sigs gb ON pairs.doc_b = gb.doc_id
)
SELECT doc_a, doc_b, est_matches,
       CAST(est_matches AS DOUBLE) / {float(N_HASHES)} AS est_jaccard,
       jaccard,
       abs(CAST(est_matches AS DOUBLE) / {float(N_HASHES)} - jaccard) AS abs_err
FROM scored
"""
)


# ---------------------------------------------------------------------------
# edit-distance verification (record-linkage style fuzzy matching)
# ---------------------------------------------------------------------------

#: candidate pairs at or above this normalized edit similarity
#: (1 - lev/max_len) are confirmed duplicates
EDIT_SIM_THRESHOLD = 0.6


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level verification of LSH candidates: Levenshtein
    distance and normalized edit similarity per candidate pair — the
    record-linkage/entity-resolution form of near-dup confirmation
    (token Jaccard is blind to within-token edits; edit distance is the
    stricter, order-sensitive check). O(len²) per pair is exactly why it
    runs ONLY on LSH candidates, never all-pairs — the same blocking
    discipline as every other near-dup path here.

    Plan shape: bands -> bucket pair generation (id-only, mega-bucket
    capped) -> ONE join back to the two texts -> map-side levenshtein
    (JVM builtin, codegen) -> threshold. The candidate texts are the only
    wide rows that move."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    shingled = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .withColumn("shingles", tx.shingles_col())
        .filter(F.size("shingles") > 0)
        .select("doc_id", "shingles")
    )
    bands = lsh_bands(shingled, pre_shingled=True)
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET_SIZE))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    texts = docs.select("doc_id", "text")
    sim = 1.0 - F.col("lev").cast("double") / F.greatest(
        F.length("ta"), F.length("tb")
    ).cast("double")
    return (
        pairs.join(
            texts.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")),
            "doc_a",
        )
        .join(
            texts.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")),
            "doc_b",
        )
        .withColumn("lev", F.levenshtein("ta", "tb"))
        .select(
            "doc_a",
            "doc_b",
            F.col("lev").cast("long").alias("lev_dist"),
            sim.alias("edit_sim"),
            (sim >= EDIT_SIM_THRESHOLD).alias("is_dup"),
        )
    )


_EDIT_DISTANCE_ORACLE = (
    "WITH " + _signature_sql_cte() + _bands_sql_cte() + f"""
, bsize AS (
  SELECT band_id, band_hash, count(*) AS n FROM bands GROUP BY 1, 2
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  JOIN bsize ON a.band_id = bsize.band_id AND a.band_hash = bsize.band_hash
  WHERE bsize.n BETWEEN 2 AND {MAX_BUCKET_SIZE}
), scored AS (
  SELECT doc_a, doc_b,
         CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev_dist,
         1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
             / CAST(greatest(len(da.text), len(db.text)) AS DOUBLE)
           AS edit_sim
  FROM pairs
  JOIN documents da ON pairs.doc_a = da.doc_id
  JOIN documents db ON pairs.doc_b = db.doc_id
)
SELECT doc_a, doc_b, lev_dist, edit_sim,
       edit_sim >= {EDIT_SIM_THRESHOLD} AS is_dup
FROM scored
"""
)


# ---------------------------------------------------------------------------
# Bloom-filter delta membership (approximate set-membership dedup)
# ---------------------------------------------------------------------------

#: Bloom geometry: BLOOM_M bit positions, BLOOM_K probes per document.
#: Deliberately undersized for the fixture (m/n ≈ 2.6 → theoretical FP
#: rate (1-e^(-kn/m))^k ≈ 30%): the report's whole purpose is MEASURING
#: the realized false-positive rate, so the filter must be tight enough
#: to produce some — production sizes m/k from exactly this table.
BLOOM_M = 1024
BLOOM_K = 3


def _bloom_pos_spark(j: int, h: str = "h") -> str:
    return (
        f"CAST(conv(substring(md5(concat('bloom{j}:', {h})), 1, 8), 16, 10) "
        f"AS BIGINT) % {BLOOM_M}"
    )


def _bloom_pos_sql(j: int, h: str = "h") -> str:
    return (
        f"CAST('0x' || substring(md5('bloom{j}:' || {h}), 1, 8) AS BIGINT) "
        f"% {BLOOM_M}"
    )


def q_dedup_bloom_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership test of a freshly crawled delta against the
    already-indexed corpus — the constant-memory cousin of
    ``dedup_incremental``: the index compresses to BLOOM_M bits however
    many billions of documents it holds, so the delta check is a pure
    map pass against a broadcast bitmap. Per delta doc: did all BLOOM_K
    probe bits hit (bloom_maybe), is it REALLY in the index (exact_dup,
    the ground truth), and is it a false positive — the measured FP rate
    that sizes m and k for the production corpus.

    Plan shape: the bit set is a ≤BLOOM_M-row distinct aggregate of the
    index side (at scale: per-partition bitmap OR, 512 bytes total — the
    relational form here has identical semantics and stays oracle-
    checkable); probes explode to BLOOM_K rows per delta doc and join the
    broadcast bit set; ground truth is one broadcast semi-join on the
    16-byte content hash. Document text never shuffles."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "h", F.md5(F.col("text"))
    )
    is_delta = F.col("doc_id") % INCR_DELTA_MODULUS == 0
    index = docs.filter(~is_delta)
    delta = docs.filter(is_delta)

    pos_arr = F.array(
        *[F.expr(_bloom_pos_spark(j)) for j in range(BLOOM_K)]
    )
    index_bits = (
        index.select(F.explode(pos_arr).alias("pos")).distinct()
        .withColumn("bit_set", F.lit(True))
    )
    probes = delta.select(
        "doc_id", "h", F.explode(pos_arr).alias("pos")
    )
    hits = (
        probes.join(F.broadcast(index_bits), "pos", "left")
        .groupBy("doc_id", "h")
        .agg(
            # misses are nulls from the left join; an all-miss group must
            # aggregate to 0, not null
            F.coalesce(
                F.sum(F.col("bit_set").cast("int")), F.lit(0)
            ).alias("n_hits")
        )
    )
    index_hashes = index.select("h").distinct().withColumn("in_index", F.lit(True))
    return (
        hits.join(F.broadcast(index_hashes), "h", "left")
        .select(
            "doc_id",
            (F.col("n_hits") == BLOOM_K).alias("bloom_maybe"),
            F.coalesce(F.col("in_index"), F.lit(False)).alias("exact_dup"),
            (
                (F.col("n_hits") == BLOOM_K)
                & ~F.coalesce(F.col("in_index"), F.lit(False))
            ).alias("false_positive"),
        )
    )


_BLOOM_POS_LIST_SQL = ", ".join(_bloom_pos_sql(j) for j in range(BLOOM_K))

_BLOOM_ORACLE = f"""
WITH hashed AS (
  SELECT doc_id, md5(text) AS h,
         doc_id % {INCR_DELTA_MODULUS} = 0 AS is_delta
  FROM documents
), index_bits AS (
  SELECT DISTINCT unnest([{_BLOOM_POS_LIST_SQL}]) AS pos
  FROM hashed WHERE NOT is_delta
), probes AS (
  SELECT doc_id, h, unnest([{_BLOOM_POS_LIST_SQL}]) AS pos
  FROM hashed WHERE is_delta
), hits AS (
  SELECT probes.doc_id, probes.h,
         sum(CASE WHEN index_bits.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
  FROM probes LEFT JOIN index_bits ON probes.pos = index_bits.pos
  GROUP BY 1, 2
), index_hashes AS (
  SELECT DISTINCT h FROM hashed WHERE NOT is_delta
)
SELECT hits.doc_id,
       n_hits = {BLOOM_K} AS bloom_maybe,
       index_hashes.h IS NOT NULL AS exact_dup,
       n_hits = {BLOOM_K} AND index_hashes.h IS NULL AS false_positive
FROM hits LEFT JOIN index_hashes ON hits.h = index_hashes.h
"""


# ---------------------------------------------------------------------------
# boilerplate-phrase report (the table reviewed before writing removal rules)
# ---------------------------------------------------------------------------

#: report the top-K most document-spread shingles
BOILERPLATE_TOP_K = 20
#: only phrases appearing in at least this many distinct docs qualify
BOILERPLATE_MIN_DOCS = 3


def q_dedup_boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate DISCOVERY: the k-token phrases
    that recur across the most distinct documents — headers, footers,
    license blurbs, templated navigation — ranked by document spread.
    This is the table a curation owner reads BEFORE writing removal
    rules; span-level removal itself is pipeline_span_dedup.

    Scale shape: one explode -> one (phrase-hash) aggregate whose map-side
    partial min(phrase) sends at most ONE phrase string per hash per
    partition into the shuffle (occurrences travel as counts), then
    TakeOrderedAndProject keeps the top K — the unbounded phrase universe
    never sorts globally and never lands on one reducer."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    phrases = (
        docs.withColumn("toks", tx.tokens_col("text"))
        .select("doc_id", F.explode(tx.shingles_col()).alias("phrase"))
    )
    counts = phrases.groupBy(F.md5("phrase").alias("h")).agg(
        F.min("phrase").alias("phrase"),
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return (
        counts.filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
        .select("phrase", "n_occurrences", "n_docs")
        .orderBy(F.col("n_docs").desc(), F.col("phrase").asc())
        .limit(BOILERPLATE_TOP_K)
    )


_BOILERPLATE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), phr AS (
  SELECT doc_id, unnest({tx.shingles_sql()}) AS phrase FROM tok
), counts AS (
  SELECT phrase,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM phr GROUP BY 1
)
SELECT phrase, n_occurrences, n_docs
FROM counts WHERE n_docs >= {BOILERPLATE_MIN_DOCS}
ORDER BY n_docs DESC, phrase ASC
LIMIT {BOILERPLATE_TOP_K}
"""


# ---------------------------------------------------------------------------
# substring-level duplication profile (exact-substring dedup metric)
# ---------------------------------------------------------------------------

#: token width of the exact-substring window — small enough that the
#: synthetic corpus contains real duplicated runs, wide enough that a
#: match is a meaningful repeated passage, not a common phrase
SUBSTR_K = 8


def q_dedup_substring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring profile: the fraction of each
    document's k-token windows that occur more than once corpus-wide —
    the document-level triage metric of exact-substring deduplication
    (which documents carry repeated passages, and whether the repeats are
    self-repetition or cross-document boilerplate). ``n_dup_kgrams``
    counts windows whose content appears >1 time anywhere (including
    within the same document); ``n_crossdoc_kgrams`` the subset whose
    content spans documents.

    Scale shape: the inverted-index pattern shared by the n-gram Jaccard
    family — only (doc_id, 32-hex window hash) postings shuffle, never
    text; one count aggregate on the hash (map-side partials), one
    shuffle join of postings against the duplicated-hash side (which is
    the vast minority of windows — the join's build side shrinks with
    corpus cleanliness), one final per-doc aggregate. At 100 TB each
    stage is the standard postings shape with no skew hotter than the
    most-repeated passage; dup_frac is ONE exact-integer division.

    The postings frame feeds THREE consumers (df counts, per-doc
    totals, the dup join) with NO persist — measured deliberate (r10
    A/B, min-of-6 warm: persist 1.31s vs 1.21s without): AQE reuses the
    repeated subplan exchanges at runtime, so a persist only adds
    materialization cost."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.withColumn("toks", tx.tokens_col("text"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {SUBSTR_K} THEN "
                f"transform(sequence(1, size(toks) - {SUBSTR_K} + 1), "
                f"i -> md5(concat_ws(' ', slice(toks, i, {SUBSTR_K})))) "
                "ELSE array() END"
            )
        ).alias("h"),
    )
    counts = grams.groupBy("h").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs_g"),
    )
    dup = counts.filter(F.col("n_occ") > 1)
    per_doc_all = grams.groupBy("doc_id").agg(F.count("*").alias("n_kgrams"))
    per_doc_dup = (
        grams.join(dup, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("dup_k"),
            F.sum(F.when(F.col("n_docs_g") > 1, 1).otherwise(0)).alias("cross_k"),
        )
    )
    return per_doc_all.join(per_doc_dup, "doc_id", "left").select(
        "doc_id",
        "n_kgrams",
        F.coalesce(F.col("dup_k"), F.lit(0)).cast("long").alias("n_dup_kgrams"),
        F.coalesce(F.col("cross_k"), F.lit(0))
        .cast("long")
        .alias("n_crossdoc_kgrams"),
        (
            F.coalesce(F.col("dup_k"), F.lit(0)).cast("double")
            / F.col("n_kgrams").cast("double")
        ).alias("dup_frac"),
    )


_SUBSTRING_PROFILE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), g AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= {SUBSTR_K} THEN
      list_transform(generate_series(1, len(toks) - {SUBSTR_K} + 1),
        i -> md5(array_to_string(list_slice(toks, i, i + {SUBSTR_K} - 1), ' ')))
    ELSE [] END) AS h
  FROM tok
), c AS (
  SELECT h, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs_g
  FROM g GROUP BY 1
), alln AS (
  SELECT doc_id, count(*) AS n_kgrams FROM g GROUP BY 1
), d AS (
  SELECT doc_id, count(*) AS dup_k,
         CAST(sum(CASE WHEN n_docs_g > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS cross_k
  FROM g JOIN c USING (h)
  WHERE n_occ > 1
  GROUP BY 1
)
SELECT doc_id, n_kgrams,
       COALESCE(dup_k, 0) AS n_dup_kgrams,
       COALESCE(cross_k, 0) AS n_crossdoc_kgrams,
       CAST(COALESCE(dup_k, 0) AS DOUBLE) / CAST(n_kgrams AS DOUBLE)
         AS dup_frac
FROM alln LEFT JOIN d USING (doc_id)
"""


# ---------------------------------------------------------------------------
# cross-document exact-substring dedup — APPLY form (Lee et al. 2022)
# ---------------------------------------------------------------------------


def q_dedup_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring deduplication, apply form — the
    corpus-wide span-removal tier of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), which
    ``dedup_substring_profile`` only measures: every SUBSTR_K-token
    window whose content occurs in MORE THAN ONE document is removed
    from every document except a deterministic keeper (the smallest
    doc_id containing that content), overlapping/adjacent removals merge
    into maximal cut spans, and the output is the scrubbed corpus plus
    the removed-token accounting. Exact-duplicate documents therefore
    collapse to one full-length survivor (the min doc_id) with every
    other copy scrubbed empty — the invariant the tests recompute.

    Keeper rule: per window CONTENT (hash), the minimum doc_id holding it
    keeps all its occurrences (including within-doc repeats); all other
    documents lose theirs. Within-doc-only repeats (n_docs == 1) are NOT
    cut — that is self-repetition, a different tier (see the profile's
    n_dup_kgrams vs n_crossdoc_kgrams split).

    Scale shape: the same inverted window-hash index as the profile —
    only (doc_id, 32-hex hash, int position) postings shuffle, never
    text; keeper election is one map-side-partial aggregate on the hash;
    coverage union is (doc_id, position) longs with the classic
    islands-by-row_number merge PARTITIONED BY doc_id (no unpartitioned
    window); the scrub itself is map-side — the slim per-doc span array
    joins back once on doc_id and a higher-order filter drops covered
    tokens inside codegen, so the corpus' tokens are never exploded for
    reconstruction. At 100 TB the span/cut-list columns are the artifact
    to persist; materializing scrubbed_text costs exactly one corpus
    rewrite, which is the definition of an apply form."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.withColumn("toks", tx.tokens_col("text")).select(
        "doc_id", "toks"
    )
    w = (
        base.filter(F.size("toks") >= SUBSTR_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {SUBSTR_K} + 1), "
                    f"i -> struct(i AS i, md5(concat_ws(' ', "
                    f"slice(toks, i, {SUBSTR_K}))) AS h))"
                )
            ).alias("w"),
        )
        .select("doc_id", F.col("w.i").alias("i"), F.col("w.h").alias("h"))
    )
    keepers = (
        w.groupBy("h")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .filter(F.col("nd") > 1)
        .select("h", "keeper")
    )
    marked = (
        w.join(keepers, "h")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id", "i")
    )
    covered = marked.select(
        "doc_id", F.explode(F.expr(f"sequence(i, i + {SUBSTR_K} - 1)")).alias("p")
    ).distinct()
    isl = covered.withColumn(
        "grp",
        F.col("p")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("p")),
    )
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("p").alias("s"), F.max("p").alias("e")
    )
    span_arr = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_cut_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("n_removed"),
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"),
    )
    return base.join(span_arr, "doc_id", "left").select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_removed"), F.lit(0))
        .cast("long")
        .alias("n_removed_tokens"),
        F.coalesce(F.col("n_cut_spans"), F.lit(0))
        .cast("long")
        .alias("n_cut_spans"),
        F.coalesce(
            F.expr(
                "array_join(transform(spans, x -> "
                "concat(cast(x.s AS string), '-', cast(x.e AS string))), ',')"
            ),
            F.lit(""),
        ).alias("cut_spans"),
        F.expr(
            "CASE WHEN spans IS NULL THEN concat_ws(' ', toks) ELSE "
            "array_join(transform(filter("
            "  transform(toks, (t, i0) -> struct(t AS t, i0 + 1 AS p)), "
            "  x -> NOT exists(spans, sp -> x.p >= sp.s AND x.p <= sp.e)"
            "), x -> x.t), ' ') END"
        ).alias("scrubbed_text"),
    )


_SUBSTRING_APPLY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), g AS (
  SELECT doc_id, i,
         md5(array_to_string(list_slice(toks, i, i + {SUBSTR_K} - 1), ' '))
           AS h
  FROM tok, unnest(generate_series(1, len(toks) - {SUBSTR_K} + 1)) AS u(i)
  WHERE len(toks) >= {SUBSTR_K}
), keepers AS (
  SELECT h, min(doc_id) AS keeper FROM g GROUP BY h
  HAVING count(DISTINCT doc_id) > 1
), marked AS (
  SELECT g.doc_id, g.i FROM g JOIN keepers USING (h)
  WHERE g.doc_id != keepers.keeper
), covered AS (
  SELECT DISTINCT doc_id, p
  FROM marked, unnest(generate_series(i, i + {SUBSTR_K} - 1)) AS u(p)
), isl AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM covered
), spans AS (
  SELECT doc_id, min(p) AS s, max(p) AS e FROM isl GROUP BY doc_id, grp
), agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_cut_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS n_removed,
         string_agg(CAST(s AS VARCHAR) || '-' || CAST(e AS VARCHAR),
                    ',' ORDER BY s) AS cut_spans
  FROM spans GROUP BY doc_id
), pos AS (
  SELECT doc_id, u.p, toks[u.p] AS t
  FROM tok, unnest(generate_series(1, len(toks))) AS u(p)
), kept AS (
  SELECT pos.doc_id, pos.p, pos.t FROM pos
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = pos.doc_id AND c.p = pos.p
  )
), scrub AS (
  SELECT doc_id, string_agg(t, ' ' ORDER BY p) AS scrubbed_text
  FROM kept GROUP BY doc_id
)
SELECT tok.doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       COALESCE(n_removed, 0) AS n_removed_tokens,
       COALESCE(n_cut_spans, 0) AS n_cut_spans,
       COALESCE(cut_spans, '') AS cut_spans,
       COALESCE(scrubbed_text, '') AS scrubbed_text
FROM tok
LEFT JOIN agg USING (doc_id)
LEFT JOIN scrub USING (doc_id)
"""


# ---------------------------------------------------------------------------
# content-defined chunking (CDC) dedup — variable-size chunks, shift-robust
# ---------------------------------------------------------------------------

#: rolling-window width (tokens) for the boundary hash
CDC_W = 4
#: boundary divisor: a window ends a chunk when its hash ≡ 0 (mod this),
#: giving ~CDC_DIVISOR-token average chunks on random content
CDC_DIVISOR = 16


def _cdc_window_hash_spark(end: str, toks: str = "toks") -> str:
    return (
        f"CAST(conv(substring(md5(concat_ws(' ', "
        f"slice({toks}, {end} - {CDC_W - 1}, {CDC_W}))), 1, 8), 16, 10) AS BIGINT)"
    )


def _cdc_window_hash_sql(end: str, toks: str = "toks") -> str:
    return (
        f"CAST('0x' || substring(md5(array_to_string("
        f"list_slice({toks}, {end} - {CDC_W - 1}, {end}), ' ')), 1, 8) AS BIGINT)"
    )


def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the FastCDC/LBFS idea, token
    granularity): chunk boundaries are placed where a W-token rolling
    window's hash ≡ 0 (mod CDC_DIVISOR), so boundaries are a function of
    LOCAL content — insert a sentence into a document and every chunk
    outside the edited neighborhood keeps its identity, which is exactly
    what fixed k-gram windows (``dedup_substring_profile``) and whole-doc
    hashes cannot offer. Chunks are then deduplicated corpus-wide and
    each document reports its duplicated / cross-document chunk token
    mass.

    Scale shape: boundary detection and chunk hashing are pure array
    expressions in the scan projection (codegen, no Python, no shuffle);
    the corpus-wide chunk index is the standard postings shape — only
    (doc_id, 32-hex chunk hash, chunk length) shuffles, never text; one
    count aggregate with map-side partials plus one join of postings
    against the duplicated minority. Average chunk size is set by
    CDC_DIVISOR, so postings volume is ~n_tokens/CDC_DIVISOR rows — an
    order less than the k-gram profile's one-posting-per-position."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.withColumn("toks", tx.tokens_col("text"))
    with_bends = toks.withColumn(
        "bends",
        F.expr(
            f"concat(CASE WHEN size(toks) > {CDC_W} THEN "
            f"filter(sequence({CDC_W}, size(toks) - 1), "
            f"e -> {_cdc_window_hash_spark('e')} % {CDC_DIVISOR} = 0) "
            "ELSE array() END, array(size(toks)))"
        ),
    )
    start = (
        "CASE WHEN c = 1 THEN 1 ELSE element_at(bends, c - 1) + 1 END"
    )
    chunks = with_bends.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(bends)), c -> struct("
                f"md5(concat_ws(' ', slice(toks, {start}, "
                f"element_at(bends, c) - ({start}) + 1))) AS ch, "
                f"element_at(bends, c) - ({start}) + 1 AS clen))"
            )
        ).alias("k"),
    ).select("doc_id", "k.ch", "k.clen")
    counts = chunks.groupBy("ch").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs_c"),
    )
    return (
        chunks.join(counts, "ch")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("clen").alias("n_tokens"),
            F.sum(F.when(F.col("n_occ") > 1, F.col("clen")).otherwise(0))
            .cast("long")
            .alias("dup_chunk_tokens"),
            F.sum(F.when(F.col("n_docs_c") > 1, F.col("clen")).otherwise(0))
            .cast("long")
            .alias("crossdoc_chunk_tokens"),
        )
        .withColumn(
            "chunk_dup_frac",
            F.col("dup_chunk_tokens").cast("double")
            / F.col("n_tokens").cast("double"),
        )
    )


_CDC_START_SQL = "CASE WHEN c = 1 THEN 1 ELSE bends[c - 1] + 1 END"

_CDC_CHUNKS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {tx.tokens_sql("text")} AS toks FROM documents
), b AS (
  SELECT doc_id, toks,
         list_concat(
           CASE WHEN len(toks) > {CDC_W} THEN
             list_filter(generate_series({CDC_W}, len(toks) - 1),
               e -> {_cdc_window_hash_sql('e')} % {CDC_DIVISOR} = 0)
           ELSE [] END,
           [len(toks)]) AS bends
  FROM tok
), ck AS (
  SELECT doc_id, unnest(
    list_transform(generate_series(1, len(bends)), c -> struct_pack(
      ch := md5(array_to_string(
        list_slice(toks, {_CDC_START_SQL}, bends[c]), ' ')),
      clen := bends[c] - ({_CDC_START_SQL}) + 1))) AS k
  FROM b
), chunks AS (
  SELECT doc_id, k.ch AS ch, k.clen AS clen FROM ck
), counts AS (
  SELECT ch, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs_c
  FROM chunks GROUP BY 1
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(clen) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN n_occ > 1 THEN clen ELSE 0 END) AS BIGINT)
         AS dup_chunk_tokens,
       CAST(sum(CASE WHEN n_docs_c > 1 THEN clen ELSE 0 END) AS BIGINT)
         AS crossdoc_chunk_tokens,
       CAST(sum(CASE WHEN n_occ > 1 THEN clen ELSE 0 END) AS DOUBLE)
         / CAST(sum(clen) AS DOUBLE) AS chunk_dup_frac
FROM chunks JOIN counts USING (ch)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# normalized (canonicalization) dedup — the C4/RefinedWeb "exact-ish" tier
# ---------------------------------------------------------------------------

def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization dedup: lowercase, collapse every non-alphanumeric
    run to one space, trim, THEN hash — the cheap tier between byte-exact
    and MinHash that catches trivially reformatted copies (case flips,
    punctuation/whitespace churn) production corpus preps run first
    (C4-style). Emits one row per normalized-content group with the raw
    variant count, so ``normalization_only`` marks clusters invisible to
    ``dedup_exact``.

    Scale shape: identical to ``dedup_exact`` — normalization is a
    codegen'd regexp in the scan projection, then ONE hash-aggregate with
    map-side partials over (norm_hash); only the 64-hex hash + counters
    shuffle, never text."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    return (
        docs.select(
            F.sha2(norm, 256).alias("norm_hash"),
            F.sha2("text", 256).alias("raw_hash"),
            "doc_id",
            "n_chars",
        )
        .groupBy("norm_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("raw_hash").alias("n_raw_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.sum("n_chars").alias("total_chars"),
        )
        .withColumn(
            "normalization_only",
            (F.col("n_docs") > 1) & (F.col("n_raw_variants") > 1),
        )
    )


_NORMALIZED_ORACLE = """
SELECT sha256(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
         AS norm_hash,
       count(*) AS n_docs,
       CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_raw_variants,
       min(doc_id) AS keeper_doc_id,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(*) > 1 AND count(DISTINCT sha256(text)) > 1
         AS normalization_only
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sorted-neighborhood dedup — rank-adjacency blocking (Hernandez-Stolfo)
# ---------------------------------------------------------------------------

#: sliding-window size: each document meets its SNM_W - 1 predecessors in
#: the normalized-key sort order
SNM_W = 4
#: normalized sort-key prefix length (chars)
SNM_KEY_LEN = 40
#: edit-distance-on-key threshold for calling a windowed pair a match
SNM_MAX_DIST = 12


def q_dedup_sorted_neighborhood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sorted-neighborhood blocking: sort the corpus by a canonicalized
    key, slide a width-SNM_W window over the sort order, and verify each
    windowed pair with edit distance on the key prefix — the classic
    record-linkage alternative to hash blocking (LSH meets docs that
    agree on a band; SNM meets docs that are merely CLOSE in sort order,
    catching near-misses hashing scatters). One row per windowed pair
    with the rank gap, key distance, and match verdict.

    Scale shape (rank without a global window): repartitionByRange on the
    key gives ordered non-overlapping partitions; the global rank is a
    parallel per-partition row_number plus broadcast cumulative offsets
    (the zipWithIndex pattern, #partitions-row frame only). Window pairs
    form by an EQUI-join on rank after a map-only (SNM_W - 1)-way explode
    — no non-equi range join, no boundary loss at partition edges, and
    only (doc_id, rank, SNM_KEY_LEN-char key) triples shuffle, never
    text. Pair volume is exactly n * (SNM_W - 1) — linear by
    construction, the whole point of SNM blocking."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", ""),
            1,
            SNM_KEY_LEN,
        ).alias("key"),
    )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = (
        docs.repartitionByRange(
            nparts, F.col("key").asc(), F.col("doc_id").asc()
        )
        .withColumn("pid", F.spark_partition_id())
        # range boundaries are sampled per computation; persist so the
        # count branch and the rank branch agree on them
        .persist()
    )
    counts = parts.groupBy("pid").agg(F.count("*").alias("cnt"))
    w_prior = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_prior), F.lit(0)).alias("offset"),
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.col("key").asc(), F.col("doc_id").asc()
    )
    ranked = (
        parts.withColumn("lr", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select("doc_id", "key", (F.col("offset") + F.col("lr")).alias("r"))
        .persist()
    )
    probe = ranked.withColumn(
        "gap",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(1, SNM_W)])),
    ).select(
        F.col("doc_id").alias("doc_b"),
        F.col("key").alias("key_b"),
        (F.col("r") - F.col("gap")).alias("ra"),
        "gap",
    )
    pairs = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("key").alias("key_a"),
        F.col("r").alias("ra"),
    ).join(probe, "ra")
    return pairs.select(
        "doc_a",
        "doc_b",
        "gap",
        F.levenshtein("key_a", "key_b").cast("long").alias("key_dist"),
        (F.levenshtein("key_a", "key_b") <= SNM_MAX_DIST).alias("is_match"),
    )


_SORTED_NEIGHBORHOOD_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         substring(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g'),
                   1, {SNM_KEY_LEN}) AS key
  FROM documents
), ranked AS (
  SELECT doc_id, key, row_number() OVER (ORDER BY key, doc_id) AS r
  FROM keyed
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       b.r - a.r AS gap,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS key_dist,
       levenshtein(a.key, b.key) <= {SNM_MAX_DIST} AS is_match
FROM ranked a
JOIN ranked b ON b.r - a.r BETWEEN 1 AND {SNM_W - 1}
"""


# ---------------------------------------------------------------------------
# shingle document-frequency profile (the DF-cap calibration curve)
# ---------------------------------------------------------------------------

def q_dedup_shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency distribution of the shingle postings,
    log2-bucketed — the calibration report behind ``NGRAM_DF_CAP``:
    every inverted-index operator in this family prunes shingles with
    df > cap (skew guard + boilerplate exclusion), and this curve shows
    exactly what any power-of-two cap keeps. Per bucket
    [2^(b-1), 2^b): distinct shingles, postings mass (sum of df), the
    mass today's cap retains within the bucket, each bucket's share of
    total postings, and the cumulative mass CDF — "cap at 2^b - 1 keeps
    cum_mass_share of the index" read directly off the row.

    Shape: postings -> ONE df hash-aggregate -> <=64-row bucket fold +
    1-row totals broadcast + a cumulative window over the bucket dim
    only (the sketch_log_histogram discipline). Fixed output cardinality
    at any corpus size.
    Reference scope note: no dedup surface in the CDC reference —
    SURVEY.md §7 phase-4 extension."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    # Arrow posting kernel — see ngram_jaccard_pairs (identical rows,
    # guide §4.2)
    posting = tk.shingle_postings(docs)
    dfreq = posting.groupBy("shingle").agg(
        F.count("*").cast("long").alias("df")
    )
    # <=64 rows with TWO consumers (totals + the main select); the
    # static plan shows 2x Scan parquet but persisting here measured
    # SLOWER (r10 A/B: 3.66s vs 3.33s min-of-6 warm) — AQE reuses the
    # repeated exchanges at runtime, so the no-persist form stands
    buckets = (
        dfreq.withColumn("bucket", F.expr("length(bin(df))").cast("long"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("postings_mass"),
            F.sum(
                F.expr(f"CASE WHEN df <= {NGRAM_DF_CAP} THEN df ELSE 0 END")
            )
            .cast("long")
            .alias("mass_under_cap"),
            F.max("df").cast("long").alias("max_df"),
        )
    )
    totals = buckets.agg(
        F.sum("postings_mass").cast("long").alias("t_mass")
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        buckets.crossJoin(F.broadcast(totals))
        .withColumn(
            "cum_mass", F.sum("postings_mass").over(w).cast("long")
        )
        .select(
            "bucket",
            F.expr("CAST(1 AS BIGINT) << CAST(bucket - 1 AS INT)").alias(
                "lo_df"
            ),
            "n_shingles",
            "postings_mass",
            "mass_under_cap",
            "max_df",
            (
                F.col("postings_mass").cast("double")
                / F.col("t_mass").cast("double")
            ).alias("mass_share"),
            (
                F.col("cum_mass").cast("double") / F.col("t_mass").cast("double")
            ).alias("cum_mass_share"),
        )
    )


_SHINGLE_DF_ORACLE = f"""
WITH ssets AS (
  SELECT doc_id,
         list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
  WHERE len({tx.shingles_sql(tx.tokens_sql("text"))}) > 0
), dfreq AS (
  SELECT shingle, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(sset) AS shingle FROM ssets)
  GROUP BY 1
), buckets AS (
  SELECT CAST(length(bin(df)) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(df) AS BIGINT) AS postings_mass,
         CAST(sum(CASE WHEN df <= {NGRAM_DF_CAP} THEN df ELSE 0 END)
              AS BIGINT) AS mass_under_cap,
         CAST(max(df) AS BIGINT) AS max_df
  FROM dfreq GROUP BY 1
), t AS (
  SELECT CAST(sum(postings_mass) AS BIGINT) AS t_mass FROM buckets
)
SELECT bucket,
       CAST(1 AS BIGINT) << (bucket - 1) AS lo_df,
       n_shingles, postings_mass, mass_under_cap, max_df,
       CAST(postings_mass AS DOUBLE) / CAST(t_mass AS DOUBLE) AS mass_share,
       CAST(sum(postings_mass) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(t_mass AS DOUBLE) AS cum_mass_share
FROM buckets CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# LSH parameter tuning: the (bands, rows) S-curve report
# ---------------------------------------------------------------------------

#: Fixed signature budget H = 16, swept across every power-of-two band
#: layout. Powers of two only, so s^r and (1-s^r)^b unroll to repeated
#: squaring — pure IEEE multiplies with the IDENTICAL textual expression in
#: both engines (library pow() differs by ULPs between Java and C++ and
#: would break the value-hash gate).
LSH_TUNE_GRID = ((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))
LSH_TUNE_RECALL_BAR = 0.9


def _pow_int_expr(x: str, n: int) -> str:
    """x**n as left-nested repeated squaring — dialect-neutral arithmetic
    text (`*`, parentheses) that Spark and DuckDB evaluate in the same
    order, multiply for multiply."""
    if n == 1:
        return x
    h = _pow_int_expr(x, n // 2)
    sq = f"({h} * {h})"
    return sq if n % 2 == 0 else f"({sq} * {x})"


def _catch_prob_expr(s: str, b: int, r: int) -> str:
    """1 - (1 - s^r)^b, fully unrolled to multiplies."""
    return f"1.0 - {_pow_int_expr(f'(1.0 - {_pow_int_expr(s, r)})', b)}"


def _lsh_tune_agg_sql(s: str = "jaccard") -> list[tuple[str, str, str]]:
    """Per grid point: (caught-micros expr, false-micros expr, suffix).
    Expected catch probability is floor-quantized to integer micro-units
    per pair so the per-grid sums are exact BIGINTs (the
    text_lm_perplexity discipline — no float accumulation order to drift
    between engines)."""
    out = []
    for b, r in LSH_TUNE_GRID:
        micros = (
            f"CAST(floor(({_catch_prob_expr(s, b, r)}) * 1000000.0) AS BIGINT)"
        )
        caught = (
            f"CASE WHEN {s} >= {JACCARD_THRESHOLD} THEN {micros} ELSE 0 END"
        )
        false_ = f"CASE WHEN {s} < {JACCARD_THRESHOLD} THEN {micros} ELSE 0 END"
        out.append((caught, false_, f"{b}_{r}"))
    return out


def q_dedup_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-layout tuning report (Leskovec, Rajaraman & Ullman, MMDS
    ch. 3): for every power-of-two (bands b, rows-per-band r) layout of a
    16-hash MinHash signature, the S-curve catch probability
    1-(1-s^r)^b is integrated over the corpus's OWN observed pair-
    similarity distribution (the exact DF-capped inverted-index Jaccard
    pairs of ``dedup_jaccard_ngram`` with no threshold), yielding the
    expected recall of true near-dups (s >= JACCARD_THRESHOLD) and the
    expected false-candidate mass per layout, plus the S-curve midpoint
    s* = (1/b)^(1/r). This is the report an operator reads before
    picking BANDS x ROWS_PER_BAND for a 100 TB dedup run — the
    recall/cost trade is corpus-specific, not theoretical.

    Exactness: every per-pair catch probability is a fixed sequence of
    IEEE multiplies (repeated squaring, no library pow), floor-quantized
    to integer micro-units; sums are exact BIGINTs and each output ratio
    is ONE division. False-candidate mass counts only pairs sharing a
    sub-cap shingle (pairs with zero shingle overlap have catch
    probability ~s=0 under MinHash on the same shingle space, and the
    banded layout can only bucket them via hash collisions, which this
    model ignores by construction).

    Scale shape: one pass over the id-only pair stream into a map-side
    scalar aggregate (2 x |grid| partial sums); the 5-row report is
    unstacked from the single reduced row. Nothing wider than two longs
    and a double ever shuffles.
    Reference scope note: no dedup surface in the CDC reference —
    SURVEY.md §7 phase-4 extension."""
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.0,
        dim_hint=_docs_dim_hint(sf_dir),
    )
    aggs = [
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(
            F.expr(f"CASE WHEN jaccard >= {JACCARD_THRESHOLD} THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("n_dup_pairs"),
    ]
    for caught, false_, sfx in _lsh_tune_agg_sql():
        aggs.append(F.sum(F.expr(caught)).cast("long").alias(f"caught_{sfx}"))
        aggs.append(F.sum(F.expr(false_)).cast("long").alias(f"false_{sfx}"))
    one = pairs.agg(*aggs)
    stack_args = ", ".join(
        f"{b}, {r}, CAST({(1.0 / b) ** (1.0 / r)!r} AS DOUBLE), "
        f"caught_{b}_{r}, false_{b}_{r}"
        for b, r in LSH_TUNE_GRID
    )
    stacked = one.select(
        "n_pairs",
        "n_dup_pairs",
        F.expr(
            f"stack({len(LSH_TUNE_GRID)}, {stack_args}) AS "
            "(n_bands, rows_per_band, s_star, caught_micros, false_micros)"
        ),
    )
    recall = F.col("caught_micros").cast("double") / (
        F.lit(1000000.0) * F.col("n_dup_pairs").cast("double")
    )
    return stacked.select(
        F.col("n_bands").cast("long").alias("n_bands"),
        F.col("rows_per_band").cast("long").alias("rows_per_band"),
        "s_star",
        "n_pairs",
        "n_dup_pairs",
        "caught_micros",
        "false_micros",
        recall.alias("exp_recall"),
        (
            F.col("caught_micros").cast("double")
            / (F.col("caught_micros") + F.col("false_micros")).cast("double")
        ).alias("precision_proxy"),
        F.when(recall >= LSH_TUNE_RECALL_BAR, "ok")
        .otherwise("low_recall")
        .alias("verdict"),
    )


def _lsh_tuning_oracle() -> str:
    per_point = []
    for (caught, false_, sfx), (b, r) in zip(_lsh_tune_agg_sql(), LSH_TUNE_GRID):
        per_point.append(
            f"""SELECT CAST({b} AS BIGINT) AS n_bands,
       CAST({r} AS BIGINT) AS rows_per_band,
       CAST({(1.0 / b) ** (1.0 / r)!r} AS DOUBLE) AS s_star,
       n_pairs, n_dup_pairs,
       caught_{sfx} AS caught_micros, false_{sfx} AS false_micros
FROM agg"""
        )
    points = "\nUNION ALL\n".join(per_point)
    sums = ",\n".join(
        f"         CAST(coalesce(sum({caught}), 0) AS BIGINT) AS caught_{sfx},\n"
        f"         CAST(coalesce(sum({false_}), 0) AS BIGINT) AS false_{sfx}"
        for caught, false_, sfx in _lsh_tune_agg_sql()
    )
    return f"""
WITH ssets AS (
  SELECT doc_id,
         list_distinct({tx.shingles_sql(tx.tokens_sql("text"))}) AS sset
  FROM documents
  WHERE len({tx.shingles_sql(tx.tokens_sql("text"))}) > 0
), posting AS (
  SELECT doc_id, unnest(sset) AS shingle FROM ssets
), rare AS (
  SELECT shingle FROM posting GROUP BY shingle
  HAVING count(*) <= {NGRAM_DF_CAP}
), p AS (
  SELECT posting.doc_id, posting.shingle FROM posting
  JOIN rare USING (shingle)
), sz AS (
  SELECT doc_id, count(*) AS set_sz FROM p GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT CAST(n_inter AS DOUBLE)
           / CAST(sa.set_sz + sb.set_sz - n_inter AS DOUBLE) AS jaccard
  FROM inter
  JOIN sz sa ON inter.doc_a = sa.doc_id
  JOIN sz sb ON inter.doc_b = sb.doc_id
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(coalesce(sum(CASE WHEN jaccard >= {JACCARD_THRESHOLD}
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_pairs,
{sums}
  FROM pairs
)
SELECT n_bands, rows_per_band, s_star, n_pairs, n_dup_pairs,
       caught_micros, false_micros,
       CAST(caught_micros AS DOUBLE)
         / (1000000.0 * CAST(n_dup_pairs AS DOUBLE)) AS exp_recall,
       CAST(caught_micros AS DOUBLE)
         / CAST(caught_micros + false_micros AS DOUBLE) AS precision_proxy,
       CASE WHEN CAST(caught_micros AS DOUBLE)
                 / (1000000.0 * CAST(n_dup_pairs AS DOUBLE))
                 >= {LSH_TUNE_RECALL_BAR}
            THEN 'ok' ELSE 'low_recall' END AS verdict
FROM ({points})
"""


_LSH_TUNING_ORACLE = _lsh_tuning_oracle()


SPECS = [
    QuerySpec("dedup_exact", q_dedup_exact, _EXACT_ORACLE),
    QuerySpec(
        "dedup_sorted_neighborhood",
        q_dedup_sorted_neighborhood,
        _SORTED_NEIGHBORHOOD_ORACLE,
    ),
    QuerySpec("dedup_normalized", q_dedup_normalized, _NORMALIZED_ORACLE),
    QuerySpec("dedup_cdc_chunks", q_dedup_cdc_chunks, _CDC_CHUNKS_ORACLE),
    QuerySpec(
        "dedup_substring_profile",
        q_dedup_substring_profile,
        _SUBSTRING_PROFILE_ORACLE,
    ),
    QuerySpec(
        "dedup_substring_apply",
        q_dedup_substring_apply,
        _SUBSTRING_APPLY_ORACLE,
    ),
    QuerySpec(
        "dedup_boilerplate_phrases",
        q_dedup_boilerplate_phrases,
        _BOILERPLATE_ORACLE,
    ),
    QuerySpec("dedup_bloom_delta", q_dedup_bloom_delta, _BLOOM_ORACLE),
    QuerySpec(
        "dedup_edit_distance", q_dedup_edit_distance, _EDIT_DISTANCE_ORACLE
    ),
    QuerySpec(
        "dedup_minhash_estimate", q_dedup_minhash_estimate, _MINHASH_ESTIMATE_ORACLE
    ),
    QuerySpec(
        "dedup_pair_agreement", q_dedup_pair_agreement, _PAIR_AGREEMENT_ORACLE
    ),
    QuerySpec(
        "dedup_threshold_sweep", q_dedup_threshold_sweep, _DEDUP_SWEEP_ORACLE
    ),
    QuerySpec("dedup_rate_by_source", q_dedup_rate_by_source, _RATE_BY_SOURCE_ORACLE),
    QuerySpec(
        "dedup_budget_report", q_dedup_budget_report, _budget_report_oracle()
    ),
    QuerySpec(
        "dedup_cross_source_matrix",
        q_dedup_cross_source_matrix,
        _CROSS_SOURCE_ORACLE,
    ),
    QuerySpec(
        "dedup_cluster_histogram",
        q_dedup_cluster_histogram,
        _CLUSTER_HISTOGRAM_ORACLE,
    ),
    QuerySpec("dedup_containment", q_dedup_containment, _CONTAINMENT_ORACLE),
    QuerySpec("dedup_lsh_tuning", q_dedup_lsh_tuning, _LSH_TUNING_ORACLE),
    QuerySpec(
        "dedup_shingle_df_profile",
        q_dedup_shingle_df_profile,
        _SHINGLE_DF_ORACLE,
    ),
    QuerySpec(
        "dedup_fuzzy_survivors", q_dedup_fuzzy_survivors, _FUZZY_SURVIVORS_ORACLE
    ),
    QuerySpec("dedup_incremental", q_dedup_incremental, _INCREMENTAL_ORACLE),
    QuerySpec("dedup_minhash_bands", q_dedup_minhash_bands, _BANDS_ORACLE),
    QuerySpec("dedup_simhash", q_dedup_simhash, _SIMHASH_ORACLE),
    QuerySpec("dedup_exact_survivors", q_dedup_exact_survivors, _EXACT_SURVIVORS_ORACLE),
    QuerySpec("dedup_minhash_pairs", q_dedup_minhash_pairs, _PAIRS_ORACLE),
    QuerySpec("dedup_jaccard_ngram", q_dedup_jaccard_ngram, _JACCARD_NGRAM_ORACLE),
    QuerySpec("dedup_clusters", q_dedup_clusters, _CLUSTERS_ORACLE),
]


# ---------------------------------------------------------------------------
# entity resolution over STRUCTURED records (record linkage)
# ---------------------------------------------------------------------------

#: Fellegi-Sunter-style field agreement weights and the decision threshold
ER_NAME_W, ER_BAL_W, ER_SEG_W = 2.0, 1.5, 1.0
ER_THRESHOLD = 2.5


def q_dedup_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity resolution) over structured records — the
    classic blocking + weighted-field-agreement pipeline the TEXT dedup
    family does not cover: link a clean customer register against a
    deterministically DIRTIED copy (reversed names every 3rd key, shifted
    balances every 5th, nulled-out segments every 7th) by (1) BLOCKING on
    stable keys — nation + the name's last-4 suffix — so candidate pairs
    come from one bounded equi-join, never all-pairs; (2) scoring each
    candidate with Fellegi-Sunter-style per-field agreement weights;
    (3) accepting pairs STRICTLY above the threshold. The fixture
    exercises every decision path: clean records link at full score
    (4.5), single-field corruptions still link (3.0 / 3.5), double
    corruptions fall BELOW the threshold (bal+seg corrupted leaves only
    name agreeing at 2.0) and are rejected, and reversed names fall out
    of their block entirely — the measured blocking-recall loss every
    real linkage deployment tunes against. The exact boundary (bal+seg
    agreement without name = 2.5, rejected by the strict >) is exercised
    by a constructed cross-key pair in tests/test_dedup.py.

    Scale shape: two map-side projections and ONE equi-join on the block
    key (nation x name-suffix keeps blocks near-constant size as the
    register grows — finer suffixes are the standard knob at larger
    scale); scoring is a codegen'd expression; no window, no cartesian."""
    cust = load_table(spark, sf_dir, "customer")
    clean = cust.select(
        F.col("c_custkey").alias("clean_key"),
        F.col("c_nationkey").alias("c_nk"),
        F.expr("right(c_name, 4)").alias("c_blk"),
        F.col("c_name").alias("c_name"),
        F.col("c_acctbal").alias("c_bal"),
        F.col("c_mktsegment").alias("c_seg"),
    )
    k = F.col("c_custkey")
    dirty = cust.select(
        F.col("c_custkey").alias("dirty_key"),
        F.col("c_nationkey").alias("d_nk"),
        F.when(k % 3 == 0, F.reverse(F.col("c_name")))
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.when(k % 5 == 0, F.col("c_acctbal") + 0.5)
        .otherwise(F.col("c_acctbal"))
        .alias("d_bal"),
        F.when(k % 7 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("d_seg"),
    ).withColumn("d_blk", F.expr("right(d_name, 4)"))
    return er_link(clean, dirty)


def er_link(clean: DataFrame, dirty: DataFrame) -> DataFrame:
    """The linkage core — block join, Fellegi-Sunter field scoring, strict
    threshold accept — factored so the exact-boundary semantics (a pair
    scoring exactly ER_THRESHOLD must be REJECTED) are directly testable
    on constructed frames. Expects the q_dedup_entity_resolution column
    contract (clean_key/c_nk/c_blk/c_name/c_bal/c_seg and the d_ twins)."""
    j = clean.join(
        dirty,
        (clean["c_nk"] == dirty["d_nk"]) & (clean["c_blk"] == dirty["d_blk"]),
        "inner",
    )
    name_agree = F.col("c_name") == F.col("d_name")
    bal_agree = F.col("c_bal").eqNullSafe(F.col("d_bal"))
    seg_agree = F.col("c_seg") == F.col("d_seg")
    score = (
        F.when(name_agree, F.lit(ER_NAME_W)).otherwise(F.lit(0.0))
        + F.when(bal_agree, F.lit(ER_BAL_W)).otherwise(F.lit(0.0))
        + F.when(seg_agree, F.lit(ER_SEG_W)).otherwise(F.lit(0.0))
    )
    return (
        j.withColumn("score", score)
        .filter(F.col("score") > ER_THRESHOLD)
        .select(
            "clean_key",
            "dirty_key",
            name_agree.alias("name_agree"),
            bal_agree.alias("bal_agree"),
            seg_agree.alias("seg_agree"),
            "score",
        )
    )


_ENTITY_RESOLUTION_ORACLE = f"""
WITH clean AS (
  SELECT c_custkey AS clean_key, c_nationkey AS nk,
         right(c_name, 4) AS blk,
         c_name, c_acctbal AS c_bal, c_mktsegment AS c_seg
  FROM customer
), dirty AS (
  SELECT c_custkey AS dirty_key, c_nationkey AS nk,
    CASE WHEN c_custkey % 3 = 0 THEN reverse(c_name) ELSE c_name END AS d_name,
    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.5 ELSE c_acctbal END AS d_bal,
    CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS d_seg
  FROM customer
), scored AS (
  SELECT clean_key, dirty_key,
    c.c_name = d.d_name AS name_agree,
    c.c_bal = d.d_bal AS bal_agree,
    c.c_seg = d.d_seg AS seg_agree,
    CASE WHEN c.c_name = d.d_name THEN {ER_NAME_W} ELSE 0.0 END
      + CASE WHEN c.c_bal = d.d_bal THEN {ER_BAL_W} ELSE 0.0 END
      + CASE WHEN c.c_seg = d.d_seg THEN {ER_SEG_W} ELSE 0.0 END AS score
  FROM clean c JOIN dirty d
    ON c.nk = d.nk AND c.blk = right(d.d_name, 4)
)
SELECT * FROM scored WHERE score > {ER_THRESHOLD}
"""

SPECS.append(
    QuerySpec(
        "dedup_entity_resolution",
        q_dedup_entity_resolution,
        _ENTITY_RESOLUTION_ORACLE,
    )
)
