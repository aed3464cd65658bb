"""Text-analysis primitives for LLM-data-pipeline operators over the
``documents`` table: tokenization, w-shingling, stopword scoring, seeded
hashing for MinHash.

Design rules (100 TB posture):

- Everything here is a per-row column expression — built-in
  ``pyspark.sql.functions`` / SQL higher-order functions only, so the whole
  family stays inside whole-stage codegen with NO Python UDFs and NO shuffle
  until an explicit aggregation.
- Every builder has a Spark form (``*_col``) and a DuckDB form (``*_sql``)
  generated from the SAME constants, so the oracle can never drift from the
  engine (the lesson encoded in cdc/source.py's lock-step CTE).
- Hashing is md5-based because Spark and DuckDB produce identical lowercase
  hex for identical input — giving cross-engine-checkable MinHash/SimHash
  without relying on engine-private hash functions. (Reference scope: the
  original system has no text operators; this family is the scale extension
  mandated by SURVEY.md §7 phases 4-5.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The driver's documents.text is single-space-delimited lowercase words.
TOKEN_DELIM = " "

#: w-shingling width for fingerprints / MinHash (standard near-dup width
#: for word-level shingles on short documents).
SHINGLE_K = 3

#: Tiny per-language stopword lists for the n-gram/stopword lang-ID
#: heuristic. Deliberately small: the heuristic is argmax-of-hits with a
#: deterministic tie order (the list order below).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "de", "y", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "un"),
}

#: Quality-score weights: coverage (doc long enough), lexical diversity,
#: information density (1 - stopword ratio).
QUALITY_WEIGHTS = (0.4, 0.3, 0.3)
QUALITY_TOKEN_TARGET = 100.0
QUALITY_THRESHOLDS = (0.6, 0.4)  # >= hi -> 'high', >= lo -> 'medium'


def _quoted(words: tuple[str, ...]) -> str:
    return ",".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------------------
# tokens
# ---------------------------------------------------------------------------

def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), TOKEN_DELIM)


def tokens_sql(text_expr: str = "text") -> str:
    return f"string_split({text_expr}, '{TOKEN_DELIM}')"


def token_length_sum_col(toks: str = "toks") -> Column:
    """Sum of token lengths (integer math — exact in both engines)."""
    return F.expr(f"aggregate({toks}, 0, (acc, t) -> acc + length(t))")


def token_length_sum_sql(toks: str = "toks") -> str:
    # CAST: DuckDB's list_sum yields HUGEINT, which pandas converts to
    # float64 — it must land as an integer to hash-match Spark's int.
    return f"CAST(list_sum(list_transform({toks}, t -> length(t))) AS BIGINT)"


def subword_count_col(toks: str = "toks", width: int = 3) -> Column:
    """BPE-ish subword count: ceil(len/width) chunks per token, summed."""
    return F.expr(
        f"aggregate({toks}, 0, (acc, t) -> acc + int((length(t) + {width - 1}) div {width}))"
    )


def subword_count_sql(toks: str = "toks", width: int = 3) -> str:
    return (
        f"CAST(list_sum(list_transform({toks}, "
        f"t -> (length(t) + {width - 1}) // {width})) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# stopword hits / language ID
# ---------------------------------------------------------------------------

#: Union of every per-language list — the generic "is a stopword" set.
ALL_STOPWORDS = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))


def _words(lang_or_words: str | tuple[str, ...]) -> tuple[str, ...]:
    return STOPWORDS[lang_or_words] if isinstance(lang_or_words, str) else lang_or_words


def stopword_hits_col(lang_or_words: str | tuple[str, ...], toks: str = "toks") -> Column:
    return F.expr(
        f"size(filter({toks}, t -> t IN ({_quoted(_words(lang_or_words))})))"
    )


def stopword_hits_sql(lang_or_words: str | tuple[str, ...], toks: str = "toks") -> str:
    return (
        f"len(list_filter({toks}, "
        f"t -> list_contains([{_quoted(_words(lang_or_words))}], t)))"
    )


def lang_pred_case_sql(hit_cols: dict[str, str]) -> str:
    """Argmax with deterministic tie order = STOPWORDS key order. Works on
    already-computed per-language hit-count columns; the identical CASE
    shape is used by the Spark side via F.expr."""
    langs = list(STOPWORDS)
    clauses = []
    for i, lang in enumerate(langs):
        others = [hit_cols[o] for o in langs[i + 1 :]]
        cond = " AND ".join(
            [f"{hit_cols[lang]} > 0"]
            + [f"{hit_cols[lang]} >= {o}" for o in others]
        )
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


# ---------------------------------------------------------------------------
# shingles + hashing
# ---------------------------------------------------------------------------

def shingles_col(toks: str = "toks", k: int = SHINGLE_K) -> Column:
    """All k-token shingles as an array<string> (empty if doc too short)."""
    return F.expr(
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> array_join(slice({toks}, i, {k}), '{TOKEN_DELIM}')) "
        f"ELSE array() END"
    )


def shingles_sql(toks: str = "toks", k: int = SHINGLE_K) -> str:
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(generate_series(1, len({toks}) - {k - 1}), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], '{TOKEN_DELIM}')) "
        f"ELSE [] END"
    )


#: Each MinHash component is a 4-hex-char (16-bit) slice of ONE md5 per
#: shingle — md5's 32 hex chars yield 8 statistically independent slices,
#: so the whole 8-component signature costs one hash pass instead of eight
#: (measured 2-3x on the signature stage at sf0.1). min over hex strings is
#: a valid MinHash (uniform over the string order) and avoids any
#: engine-specific hex->int conversion.
MINHASH_SLICE_CHARS = 4
MAX_MINHASH_SEED = 32 // MINHASH_SLICE_CHARS  # 8


def _slice_bounds(seed: int) -> tuple[int, int]:
    if not 0 <= seed < MAX_MINHASH_SEED:
        raise ValueError(f"seed must be in [0, {MAX_MINHASH_SEED})")
    return 1 + seed * MINHASH_SLICE_CHARS, MINHASH_SLICE_CHARS


def minhash_col(seed: int, shingles: str = "shingles") -> Column:
    start, width = _slice_bounds(seed)
    return F.expr(
        f"array_min(transform({shingles}, s -> substring(md5(s), {start}, {width})))"
    )


def minhash_sql(seed: int, shingles: str = "shingles") -> str:
    start, width = _slice_bounds(seed)
    return (
        f"list_min(list_transform({shingles}, "
        f"s -> substring(md5(s), {start}, {width})))"
    )


def min_md5_col(shingles: str = "shingles") -> Column:
    """Full-width min-md5 — the document fingerprint (128-bit, no slicing)."""
    return F.expr(f"array_min(transform({shingles}, s -> md5(s)))")


def min_md5_sql(shingles: str = "shingles") -> str:
    return f"list_min(list_transform({shingles}, s -> md5(s)))"


def shingle_hashes_col(shingles: str = "shingles") -> Column:
    """md5 per shingle, computed ONCE into an array column — the signature
    components then slice this array instead of re-hashing (hashing per
    component multiplied the md5 work 8x; measured dominant at sf0.1)."""
    return F.expr(f"transform({shingles}, s -> md5(s))")


def shingle_hashes_sql(shingles: str = "shingles") -> str:
    return f"list_transform({shingles}, s -> md5(s))"


def minhash_from_hashes_col(seed: int, hashes: str = "hashes") -> Column:
    start, width = _slice_bounds(seed)
    return F.expr(
        f"array_min(transform({hashes}, h -> substring(h, {start}, {width})))"
    )


def minhash_from_hashes_sql(seed: int, hashes: str = "hashes") -> str:
    start, width = _slice_bounds(seed)
    return (
        f"list_min(list_transform({hashes}, h -> substring(h, {start}, {width})))"
    )


# ---------------------------------------------------------------------------
# hashing-trick linear model weights (model-based quality scoring)
# ---------------------------------------------------------------------------

#: Per-token "learned" weight derived closed-form from md5: two hex chars
#: of the token's hash → a deterministic integer in
#: [-MODEL_WEIGHT_CENTER, MODEL_WEIGHT_MOD - 1 - MODEL_WEIGHT_CENTER].
#: This is the hashing trick with the weight vector shipped as an
#: expression instead of a broadcast array — the document score stays a
#: pure map-side integer aggregate in whole-stage codegen, and Spark and
#: DuckDB agree bit-for-bit (ascii/substring/md5 are identical in both).
MODEL_WEIGHT_MOD = 31
MODEL_WEIGHT_CENTER = 15


def model_weight_expr_spark(tok: str = "t") -> str:
    return (
        f"((ascii(substring(md5({tok}), 1, 1)) * 16 "
        f"+ ascii(substring(md5({tok}), 2, 1))) % {MODEL_WEIGHT_MOD} "
        f"- {MODEL_WEIGHT_CENTER})"
    )


def model_weight_expr_sql(tok: str = "t") -> str:
    return (
        f"((ascii(substring(md5({tok}), 1, 1)) * 16 "
        f"+ ascii(substring(md5({tok}), 2, 1))) % {MODEL_WEIGHT_MOD} "
        f"- {MODEL_WEIGHT_CENTER})"
    )


def model_score_col(toks: str = "toks") -> Column:
    """Integer dot product <w, bag-of-words(doc)> — the linear-classifier
    score, exact in both engines (no floats until the caller divides)."""
    return F.expr(
        f"aggregate({toks}, CAST(0 AS BIGINT), "
        f"(acc, t) -> acc + {model_weight_expr_spark('t')})"
    )


def model_score_sql(toks: str = "toks") -> str:
    return (
        f"CAST(list_sum(list_transform({toks}, "
        f"t -> {model_weight_expr_sql('t')})) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# rolling (polynomial / Rabin-Karp) hashing over characters
# ---------------------------------------------------------------------------

#: base/modulus chosen so acc*BASE + code stays < 2^36 — exact in a 64-bit
#: long in BOTH engines (no overflow, no bigint promotion differences)
ROLLING_BASE = 31
ROLLING_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne)


def rolling_hash_col(text_expr: str = "text") -> Column:
    """Polynomial hash folded left-to-right over character codes:
    ``h = (h * B + code) mod M`` — the classic Rabin-Karp fingerprint."""
    return F.expr(
        f"aggregate(transform(split({text_expr}, ''), c -> ascii(c)), "
        f"CAST(0 AS BIGINT), "
        f"(acc, c) -> (acc * {ROLLING_BASE} + c) % {ROLLING_MOD})"
    )


def rolling_hash_sql(text_expr: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split_regex({text_expr}, ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {ROLLING_BASE} + c) % {ROLLING_MOD})"
    )
