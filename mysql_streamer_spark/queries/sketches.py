"""Sketch operators over the ``events`` stream: HyperLogLog distinct-count
sketches (Apache DataSketches, built into Spark as ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) and quantile sketches
(``percentile_approx``).

Why sketches are first-class at 100 TB: an exact COUNT(DISTINCT) over a
high-cardinality key shuffles every distinct value; an HLL sketch is a
fixed ~2^lgK-byte register array that partial-aggregates map-side and
merges associatively — the shuffle moves ONE sketch per partition per
group, independent of cardinality. Mergeability is the whole point: per-day
sketches persisted once can answer any rollup (week, month, ad-hoc unions)
without rescanning the raw data. The reference system has no analytics
surface (it is a CDC relay); this family is part of the SURVEY.md §7
phase-4/5 scale extension alongside dedup/similarity.

Oracle discipline: a DuckDB oracle cannot reproduce DataSketches register
values, but it CAN verify the *contract*: every estimate — direct or
rebuilt from merged per-day sketches — must land within the sketch's
published error bound of the exact distinct count. (Merged and direct are
NOT required to be equal: the direct-fed sketch carries the
order-sensitive HIP estimator, which a union legitimately discards; the
accuracy guarantee survives merging, the estimator identity does not.)
Each query therefore emits the EXACT answer plus boolean accuracy flags;
the oracle computes the exact answer and literal TRUEs. A hash match then
proves the sketch path worked — far stronger than a rows-only check,
without asking two engines to agree on register bits.

Determinism notes: HLL estimates are order-insensitive (max over per-value
register updates) — safe to emit the estimate value itself.
``percentile_approx``'s GK summary is merge-order-DEPENDENT, so its raw
value is not emitted, only its within-guarantee flag (rank error <= 1/acc
is guaranteed for any merge order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_streamer_spark.queries.registry import QuerySpec
from mysql_streamer_spark.tables import load_table

#: lgConfigK = 12 -> 4 KiB sketch, relative standard error ~1.04/sqrt(2^12)
#: = 1.6%. The accuracy flag allows 5 RSE (~8%) — loose enough to never
#: flake, tight enough that a broken sketch path (e.g. double-counting)
#: trips it.
HLL_LG_K = 12
HLL_REL_TOL = 0.08

#: percentile_approx accuracy: rank error <= 1/PCT_ACCURACY of n.
PCT_ACCURACY = 1000
PCT_POINTS = (0.5, 0.95, 0.99)


# ---------------------------------------------------------------------------
# sketch_hll_distinct — per-event-type distinct users: exact + HLL-in-bound
# ---------------------------------------------------------------------------

def q_sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distinct-cardinality via HLL, validated against the exact
    count computed in the same plan. At scale the exact branch is the one
    you drop; here it doubles as the in-plan oracle anchor."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_distinct"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LG_K))
            ).alias("hll_estimate"),
        )
        .select(
            "event_type",
            "exact_distinct",
            (
                F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * HLL_REL_TOL
            ).alias("hll_within_bound"),
        )
    )


_HLL_DISTINCT_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_distinct,
       TRUE AS hll_within_bound
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# sketch_hll_merge — per-day sketches union to the whole-corpus sketch
# ---------------------------------------------------------------------------

def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability contract: build one sketch per day, union the
    binary sketches with ``hll_union_agg``, and require the MERGED
    estimate to stay within the published error bound of the exact count,
    same as the direct whole-corpus sketch. (The two estimates are NOT
    required to be equal: register-max union is associative, but
    DataSketches' direct-fed sketch carries the order-sensitive HIP
    estimator, which a union legitimately discards — the accuracy
    GUARANTEE survives merging, the estimator identity does not.) This is
    the plan shape that replaces re-scanning raw data for every rollup
    window at 100 TB: persisted daily sketches answer any window."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LG_K)).alias("day_sketch")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("day_sketch")).alias("merged_estimate"),
        F.count("*").alias("n_days"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(HLL_LG_K))
        ).alias("direct_estimate"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    in_bound = lambda c: (  # noqa: E731 - tiny local predicate builder
        F.abs(F.col(c) - F.col("exact_distinct"))
        <= F.col("exact_distinct") * HLL_REL_TOL
    )
    return merged.crossJoin(direct).select(
        "n_days",
        "exact_distinct",
        in_bound("merged_estimate").alias("merged_within_bound"),
        in_bound("direct_estimate").alias("hll_within_bound"),
    )


_HLL_MERGE_ORACLE = """
SELECT count(DISTINCT date_trunc('day', ts)) AS n_days,
       count(DISTINCT user_id) AS exact_distinct,
       TRUE AS merged_within_bound,
       TRUE AS hll_within_bound
FROM events
"""


# ---------------------------------------------------------------------------
# sketch_hll_rolling — rolling-window rollup from persisted daily sketches
# ---------------------------------------------------------------------------

#: rolling window width in days
HLL_ROLL_DAYS = 3


def q_sketch_hll_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The re-aggregation payoff the sketch family's design claims: once
    per-day HLL sketches exist, ANY rolling window is a union of
    sketches — here the trailing ``HLL_ROLL_DAYS``-day distinct-user
    count per day, rebuilt purely from the daily sketches (the raw data
    is scanned once for the sketches and once for the exact audit; a
    production pipeline persists the sketches and never rescans). Each
    rolling estimate must land within the published error bound of the
    exact windowed distinct count.

    Scale shape: the union runs on the D-row day dimension (a bounded
    self range-join, D^2 pairs of ~KB sketches); the exact audit leg
    fans events out at most HLL_ROLL_DAYS x against the broadcast D-row
    day dim — the bounded ground-truth pattern of the recall audits.
    At 100 TB only the daily-sketch build touches the data; everything
    downstream is day-dimension-sized."""
    from mysql_streamer_spark.tables import spread

    # the exact-audit leg fans events against the broadcast day dim via a
    # range BNLJ whose parallelism is the PROBE side's partitioning — a
    # single-split events table would run it serially (measured 3x
    # superlinear on the k=10 single-file fold); spread restores it
    ev = spread(load_table(spark, sf_dir, "events"), "event_id")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LG_K)).alias("day_sketch")
    )
    d2 = daily.select(
        F.col("day").alias("day2"), F.col("day_sketch").alias("sk2")
    )
    rolled = (
        daily.select("day")
        .join(
            F.broadcast(d2),
            F.expr(
                f"day2 >= day - INTERVAL {HLL_ROLL_DAYS - 1} DAYS"
                " AND day2 <= day"
            ),
        )
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_days_in_window"),
            F.hll_sketch_estimate(F.hll_union_agg("sk2")).alias("est"),
        )
    )
    days = daily.select("day")
    exact = (
        ev.withColumn("eday", F.date_trunc("day", "ts"))
        .join(
            F.broadcast(days),
            F.expr(
                f"eday >= day - INTERVAL {HLL_ROLL_DAYS - 1} DAYS"
                " AND eday <= day"
            ),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_rolling"))
    )
    return rolled.join(exact, "day").select(
        "day",
        "n_days_in_window",
        "exact_rolling",
        (
            F.abs(F.col("est") - F.col("exact_rolling"))
            <= F.col("exact_rolling") * HLL_REL_TOL
        ).alias("rolling_within_bound"),
    )


_HLL_ROLLING_ORACLE = f"""
WITH days AS (
  SELECT DISTINCT date_trunc('day', ts) AS day FROM events
)
SELECT d.day,
       CAST((SELECT count(*) FROM days d2
             WHERE d2.day >= d.day - INTERVAL {HLL_ROLL_DAYS - 1} DAY
               AND d2.day <= d.day) AS BIGINT) AS n_days_in_window,
       CAST((SELECT count(DISTINCT e.user_id) FROM events e
             WHERE date_trunc('day', e.ts)
                   >= d.day - INTERVAL {HLL_ROLL_DAYS - 1} DAY
               AND date_trunc('day', e.ts) <= d.day) AS BIGINT)
         AS exact_rolling,
       TRUE AS rolling_within_bound
FROM days d
"""


# ---------------------------------------------------------------------------
# sketch_hll_overlap — pairwise audience overlap via inclusion-exclusion
# ---------------------------------------------------------------------------

#: The intersection estimate |A|+|B|-|A∪B| compounds three estimates whose
#: errors each scale with THEIR OWN cardinality, so the bound is relative
#: to the UNION size (the dominant term), not the (possibly tiny)
#: intersection — the standard caveat with inclusion-exclusion on HLL.
HLL_OVERLAP_TOL = 3 * HLL_REL_TOL


def q_sketch_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types from PERSISTED
    sketches: |A∩B| ≈ est(A) + est(B) − est(A∪B), where est(A∪B) unions
    the two stored register arrays — no rescan of the raw events, which
    is the entire 100 TB win (the T per-type sketches answer all T²/2
    pair overlaps). The exact intersection is computed in-plan as the
    anchor, and the flag asserts the estimate lands within
    HLL_OVERLAP_TOL of the union size.

    Plan shape: one sketch aggregate to T rows (T = event types), a T²
    self-join of 4 KiB sketches (tiny), and one distinct-pairs aggregate
    for the exact anchor (dropped in production)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LG_K)).alias("sk"),
        F.countDistinct("user_id").alias("exact_n"),
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("exact_n").alias("exact_a"),
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("exact_n").alias("exact_b"),
    )
    est = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .withColumn("est_a", F.hll_sketch_estimate("sk_a"))
        .withColumn("est_b", F.hll_sketch_estimate("sk_b"))
        .withColumn(
            "est_union",
            F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")),
        )
        .withColumn(
            "est_intersection",
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        )
    )
    ud = ev.select("event_type", "user_id").distinct()
    exact_pairs = (
        ud.alias("x")
        .join(ud.alias("y"), F.col("x.user_id") == F.col("y.user_id"))
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.countDistinct("x.user_id").alias("exact_intersection"))
    )
    return (
        est.join(exact_pairs, ["type_a", "type_b"], "left")
        .withColumn(
            "exact_intersection",
            F.coalesce(F.col("exact_intersection"), F.lit(0)),
        )
        .withColumn(
            "exact_union",
            F.col("exact_a") + F.col("exact_b") - F.col("exact_intersection"),
        )
        .select(
            "type_a",
            "type_b",
            "exact_intersection",
            (
                F.abs(F.col("est_intersection") - F.col("exact_intersection"))
                <= F.col("exact_union") * HLL_OVERLAP_TOL
            ).alias("overlap_within_bound"),
        )
    )


_HLL_OVERLAP_ORACLE = """
WITH ud AS (
  SELECT DISTINCT event_type, user_id FROM events
), pairs AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         count(DISTINCT x.user_id) AS exact_intersection
  FROM ud x JOIN ud y ON x.user_id = y.user_id
  WHERE x.event_type < y.event_type
  GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type FROM events
), all_pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type
)
SELECT all_pairs.type_a, all_pairs.type_b,
       coalesce(exact_intersection, 0) AS exact_intersection,
       TRUE AS overlap_within_bound
FROM all_pairs
LEFT JOIN pairs ON all_pairs.type_a = pairs.type_a
               AND all_pairs.type_b = pairs.type_b
"""


# ---------------------------------------------------------------------------
# sketch_heavy_hitters — Misra-Gries candidates, exact-verified
# ---------------------------------------------------------------------------

#: counters per partition summary. The MG guarantee: a partition summary
#: keeps every item whose partition count exceeds n_p/MG_COUNTERS, so the
#: UNION of summaries contains every item with GLOBAL count > n/MG_COUNTERS
#: (averaging argument) — choose the report threshold 1/HH_K coarser than
#: 1/MG_COUNTERS and the candidate set provably covers it.
MG_COUNTERS = 64
HH_K = 32


def q_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide frequent tokens via the two-phase heavy-hitters plan:
    each partition streams its tokens through a Misra-Gries summary
    (MG_COUNTERS counters, O(K) memory however many billions of tokens
    pass), the tiny candidate union broadcasts back, and ONE exact count
    restricted to candidates yields the final > n/HH_K report. This is
    the shape that replaces a full (token, count) shuffle at 100 TB: the
    shuffle carries ≤ K x partitions candidate rows, never the vocabulary.

    The Python stage only PROPOSES candidates (its correctness bar is the
    coverage guarantee, tested in pytest); everything the query RETURNS
    is exact and oracle-checked."""
    from mysql_streamer_spark.tables import load_table, spread

    from mysql_streamer_spark import text as tx

    docs = spread(load_table(spark, sf_dir, "documents"))
    posting = docs.select(F.explode(tx.tokens_col("text")).alias("t")).filter(
        F.col("t") != ""
    )

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["t"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < MG_COUNTERS:
                    counters[t] = 1
                else:  # decrement-all step: evict zeroed counters
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame(
            {"t": list(counters), "lower": list(counters.values())}
        )

    cands = posting.mapInPandas(mg, "t string, lower long").select("t").distinct()
    tot = posting.agg(F.count("*").alias("n_total"))
    return (
        posting.join(F.broadcast(cands), "t")
        .groupBy("t")
        .agg(F.count("*").alias("n_occ"))
        .crossJoin(F.broadcast(tot))
        # integer cross-multiplication, no float threshold
        .filter(F.col("n_occ") * HH_K > F.col("n_total"))
        .select(
            F.col("t").alias("token"),
            "n_occ",
            (F.col("n_occ").cast("double") / F.col("n_total").cast("double")).alias(
                "share"
            ),
        )
    )


from mysql_streamer_spark import text as _tx

_HEAVY_HITTERS_ORACLE = f"""
WITH posting AS (
  SELECT unnest({_tx.tokens_sql("text")}) AS t FROM documents
), filtered AS (
  SELECT t FROM posting WHERE t != ''
), tot AS (
  SELECT count(*) AS n_total FROM filtered
)
SELECT t AS token,
       count(*) AS n_occ,
       CAST(count(*) AS DOUBLE) / CAST(max(n_total) AS DOUBLE) AS share
FROM filtered CROSS JOIN tot
GROUP BY t, n_total
HAVING count(*) * {HH_K} > n_total
"""


# ---------------------------------------------------------------------------
# sketch_quantile_bound — percentile_approx within its rank-error guarantee
# ---------------------------------------------------------------------------

def q_sketch_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK quantile summary vs the exact percentile. The guarantee is on
    RANK (within n/PCT_ACCURACY positions, i.e. quantile fraction within
    1/PCT_ACCURACY), not value, so the check brackets the approximate VALUE
    between the exact percentiles at p -/+ 2/PCT_ACCURACY (double the
    guarantee to absorb interpolation at the band edges) — one single-pass
    aggregate, no driver-side count. Only exact-derived values and the pass
    flags are emitted (GK summary state is merge-order-dependent; its raw
    value is not cross-engine stable)."""
    ev = load_table(spark, sf_dir, "events").select("value")
    band = 2.0 / PCT_ACCURACY
    aggs = [F.count("*").alias("n")]
    for p in PCT_POINTS:
        tag = str(int(p * 100))
        lo_q = max(0.0, p - band)
        hi_q = min(1.0, p + band)
        aggs += [
            F.percentile_approx("value", F.lit(p), F.lit(PCT_ACCURACY)).alias(
                f"approx_{tag}"
            ),
            F.expr(f"percentile(value, {lo_q!r})").alias(f"lo_{tag}"),
            F.expr(f"percentile(value, {hi_q!r})").alias(f"hi_{tag}"),
        ]
    wide = ev.agg(*aggs)
    out_cols = [F.col("n")]
    for p in PCT_POINTS:
        tag = str(int(p * 100))
        out_cols.append(
            (
                (F.col(f"approx_{tag}") >= F.col(f"lo_{tag}"))
                & (F.col(f"approx_{tag}") <= F.col(f"hi_{tag}"))
            ).alias(f"p{tag}_within_bound")
        )
    return wide.select(*out_cols)


def _quantile_oracle() -> str:
    flags = ",\n       ".join(
        f"TRUE AS p{int(p * 100)}_within_bound" for p in PCT_POINTS
    )
    return f"SELECT count(*) AS n,\n       {flags}\nFROM events"


# ---------------------------------------------------------------------------
# count-min sketch (approximate frequency, never-underestimate contract)
# ---------------------------------------------------------------------------

#: depth (independent hash rows) x width (buckets per row). 4x512 keeps
#: the counter table at 2048 cells — a model-sized broadcast — while the
#: sf0.01 events table (~60k rows) makes real collisions, so the
#: overcount column is exercised, not vacuous.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOP_K = 40


def _cms_bucket_spark(j: int, key: str) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{j}:"), F.col(key).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH
    )


def _cms_bucket_sql(j: str, key: str) -> str:
    return (
        f"CAST('0x' || substring(md5('cms' || CAST({j} AS VARCHAR) || ':' || "
        f"CAST({key} AS VARCHAR)), 1, 8) AS BIGINT) % {CMS_WIDTH}"
    )


def _cms_with_buckets(df: DataFrame, key: str) -> DataFrame:
    """Explode each row DEPTH ways and attach its per-row CMS bucket —
    the shared sketch-fold front half (one when-chain dispatched on j,
    seed inside the md5 input, same as the oracle)."""
    rows = df.withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)]))
    )
    bucket = F.lit(None).cast("long")
    for j in range(CMS_DEPTH):
        bucket = F.when(F.col("j") == j, _cms_bucket_spark(j, key)).otherwise(
            bucket
        )
    return rows.withColumn("bucket", bucket)


def _cms_grid(df: DataFrame, key: str) -> DataFrame:
    """The folded DEPTHxWIDTH grid: (j, bucket) -> count."""
    return _cms_with_buckets(df, key).groupBy("j", "bucket").agg(
        F.count("*").alias("c")
    )


def q_sketch_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over per-user event counts, audited against exact
    counts for the top-K heaviest users. The CMS is the streaming-side
    frequency sketch HLL cannot provide: a fixed DEPTHxWIDTH counter grid
    that partial-aggregates map-side and merges by cell-wise addition, so
    the shuffle moves 2048 longs per partition regardless of user
    cardinality. The md5-derived hash rows make the sketch a pure function
    of the data — both engines build the identical grid, so the estimate
    itself is hash-checkable (stronger than a bound-only check), and
    ``never_under`` states the CMS contract (min over rows can only
    overcount, never undercount) as a literal TRUE the oracle must match.

    Scale shape: a DEPTH-way explode (map-only), ONE fixed-size aggregate,
    exact top-K true counts (hash-aggregate + TakeOrdered), then the K x
    DEPTH probe side joins the 2048-cell grid — broadcast-sized both
    sides. Nothing scales with user cardinality except the exact-count
    audit, which is the point of comparison, not the sketch."""
    from mysql_streamer_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    counters = _cms_grid(ev, "user_id")
    true_counts = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("user_id").asc())
        .limit(CMS_TOP_K)
    )
    est = (
        _cms_with_buckets(true_counts, "user_id")
        .join(counters, ["j", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").alias("est_n"))
    )
    return est.select(
        "user_id",
        "true_n",
        "est_n",
        (F.col("est_n") >= F.col("true_n")).alias("never_under"),
        (F.col("est_n") - F.col("true_n")).alias("overcount"),
    )


def _cms_oracle() -> str:
    js = ", ".join(str(j) for j in range(CMS_DEPTH))
    return f"""
WITH ev AS (
  SELECT user_id FROM events
), r AS (
  SELECT user_id, j FROM ev CROSS JOIN (SELECT unnest([{js}]) AS j) js
), b AS (
  SELECT j, {_cms_bucket_sql("j", "user_id")} AS bucket FROM r
), counters AS (
  SELECT j, bucket, count(*) AS c FROM b GROUP BY 1, 2
), t AS (
  SELECT user_id, count(*) AS true_n FROM ev GROUP BY 1
  ORDER BY true_n DESC, user_id ASC LIMIT {CMS_TOP_K}
), kb AS (
  SELECT user_id, true_n, j, {_cms_bucket_sql("j", "user_id")} AS bucket
  FROM t CROSS JOIN (SELECT unnest([{js}]) AS j) js
), est AS (
  SELECT user_id, true_n, min(c) AS est_n
  FROM kb JOIN counters USING (j, bucket)
  GROUP BY 1, 2
)
SELECT user_id, true_n, est_n,
       est_n >= true_n AS never_under,
       est_n - true_n AS overcount
FROM est
"""


# ---------------------------------------------------------------------------
# count-sketch (signed frequency sketch, unbiased median-of-rows estimate)
# ---------------------------------------------------------------------------

#: same grid geometry as the CMS so the two sketches are directly
#: comparable on the fixture: 4 independent (sign, bucket) hash rows over
#: 512 counters each.
CS_DEPTH = 4
CS_WIDTH = 512
CS_TOP_K = 40


def _cs_bucket_spark(j: int, key: str) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cs{j}:"), F.col(key).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CS_WIDTH
    )


def _cs_sign_spark(j: int, key: str) -> "F.Column":
    parity = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"cs-sign{j}:"), F.col(key).cast("string"))
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    return F.lit(1) - F.lit(2) * parity


def _cs_bucket_sql(j: str, key: str) -> str:
    return (
        f"CAST('0x' || substring(md5('cs' || CAST({j} AS VARCHAR) || ':' || "
        f"CAST({key} AS VARCHAR)), 1, 8) AS BIGINT) % {CS_WIDTH}"
    )


def _cs_sign_sql(j: str, key: str) -> str:
    return (
        f"1 - 2 * (CAST('0x' || substring(md5('cs-sign' || "
        f"CAST({j} AS VARCHAR) || ':' || CAST({key} AS VARCHAR)), 1, 1) "
        f"AS BIGINT) % 2)"
    )


def q_sketch_count_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Sketch over per-user event counts, audited against exact
    counts for the top-K heaviest users — the signed sibling of
    ``sketch_cms_counts``. Where the CMS only ever overcounts (min over
    unsigned rows), the Count-Sketch multiplies each update by a
    +/-1 hash so colliding keys cancel in expectation, and the
    median over depth rows is an UNBIASED estimate that can err in
    either direction. That property is what makes it the sketch behind
    heavy-hitter detection in adversarial/skewed streams and the
    hashing-trick feature compressor (`pipeline_hashed_features` is the
    learning-side cousin). The md5-derived (bucket, sign) rows make the
    grid a pure function of the data, so the estimate is hash-checked
    against DuckDB building the identical grid; ``err`` exposes the
    signed deviation the CMS cannot represent. Median over an even
    DEPTH=4 is the midpoint of the two central values in both engines —
    exact .5 arithmetic on integer counters, no rounding hazard.

    Scale shape: identical to the CMS — a DEPTH-way explode (map-only),
    ONE fixed 2048-cell signed aggregate (map-side partials), exact
    top-K true counts via hash-aggregate + TakeOrdered, then the K x
    DEPTH probe side joins the grid. Shuffle volume is constant in user
    cardinality; only the exact-count audit scales with rows."""
    from mysql_streamer_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    rows = ev.withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(CS_DEPTH)]))
    )
    bucket = F.lit(None).cast("long")
    sign = F.lit(None).cast("long")
    for j in range(CS_DEPTH):
        bucket = F.when(
            F.col("j") == j, _cs_bucket_spark(j, "user_id")
        ).otherwise(bucket)
        sign = F.when(F.col("j") == j, _cs_sign_spark(j, "user_id")).otherwise(
            sign
        )
    counters = (
        rows.withColumn("bucket", bucket)
        .withColumn("s", sign)
        .groupBy("j", "bucket")
        .agg(F.sum("s").alias("c"))
    )
    true_counts = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("user_id").asc())
        .limit(CS_TOP_K)
    )
    probes = true_counts.withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(CS_DEPTH)]))
    )
    pbucket = F.lit(None).cast("long")
    psign = F.lit(None).cast("long")
    for j in range(CS_DEPTH):
        pbucket = F.when(
            F.col("j") == j, _cs_bucket_spark(j, "user_id")
        ).otherwise(pbucket)
        psign = F.when(
            F.col("j") == j, _cs_sign_spark(j, "user_id")
        ).otherwise(psign)
    est = (
        probes.withColumn("bucket", pbucket)
        .withColumn("s", psign)
        .join(counters, ["j", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.median(F.col("s") * F.col("c")).alias("est_n"))
    )
    return est.select(
        "user_id",
        "true_n",
        F.col("est_n").cast("double").alias("est_n"),
        (F.col("est_n").cast("double") - F.col("true_n")).alias("err"),
    )


def _count_sketch_oracle() -> str:
    js = ", ".join(str(j) for j in range(CS_DEPTH))
    return f"""
WITH ev AS (
  SELECT user_id FROM events
), r AS (
  SELECT user_id, j FROM ev CROSS JOIN (SELECT unnest([{js}]) AS j) js
), b AS (
  SELECT j, {_cs_bucket_sql("j", "user_id")} AS bucket,
         {_cs_sign_sql("j", "user_id")} AS s
  FROM r
), counters AS (
  SELECT j, bucket, CAST(sum(s) AS BIGINT) AS c FROM b GROUP BY 1, 2
), t AS (
  SELECT user_id, count(*) AS true_n FROM ev GROUP BY 1
  ORDER BY true_n DESC, user_id ASC LIMIT {CS_TOP_K}
), kb AS (
  SELECT user_id, true_n, j,
         {_cs_bucket_sql("j", "user_id")} AS bucket,
         {_cs_sign_sql("j", "user_id")} AS s
  FROM t CROSS JOIN (SELECT unnest([{js}]) AS j) js
), est AS (
  SELECT user_id, true_n, median(s * c) AS est_n
  FROM kb JOIN counters USING (j, bucket)
  GROUP BY 1, 2
)
SELECT user_id, true_n, CAST(est_n AS DOUBLE) AS est_n,
       CAST(est_n AS DOUBLE) - true_n AS err
FROM est
"""


# ---------------------------------------------------------------------------
# Bloom-filter membership (semi-join pruning sketch, no-false-negatives)
# ---------------------------------------------------------------------------

#: bit-array size / hash count. 8192 bits over ~300 hot customers at
#: sf0.01 gives a low-but-nonzero false-positive rate, so the FP audit
#: column is exercised; BLOOM_K=5 is near-optimal for that load factor.
BLOOM_M = 8192
BLOOM_K = 5

#: build-side predicate: the "hot customer" set the filter summarizes
BLOOM_ACCTBAL_MIN = 7000.0


def _bloom_pos_spark(i: int, key: str) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"bloom{i}:"), F.col(key).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


def _bloom_pos_sql(i: str, key: str) -> str:
    return (
        f"CAST('0x' || substring(md5('bloom' || CAST({i} AS VARCHAR) || ':' "
        f"|| CAST({key} AS VARCHAR)), 1, 8) AS BIGINT) % {BLOOM_M}"
    )


def q_sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, audited per market segment: the
    hot-customer set (acctbal above BLOOM_ACCTBAL_MIN) is summarized as
    an M-bit array, then every ordering customer probes it, and the
    result is compared to the exact semi-join. This is the sketch behind
    Spark's own runtime bloom-filter join pruning (and every distributed
    semi-join pushdown): the build side compresses to M bits broadcast
    everywhere, the probe side never shuffles. The md5-derived positions
    make the bit array a pure function of the data, so per-segment
    probe/hit/false-positive counts are hash-checked against DuckDB
    building the identical array; ``no_false_negatives`` states the Bloom
    contract (a set bit can lie positive, never negative) as a literal
    the oracle must agree on.

    Scale shape: build side folds to <= M distinct positions (map-side
    partials) and BROADCASTS; probe side is a K-way explode (map-only)
    joined to that broadcast, then one segment-sized aggregate. Nothing
    shuffles with customer cardinality except the exact-truth audit,
    which is the point of comparison."""
    from mysql_streamer_spark.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    hot = cust.filter(F.col("c_acctbal") > BLOOM_ACCTBAL_MIN).select(
        "c_custkey"
    )
    bits = (
        hot.withColumn(
            "i", F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)]))
        )
        .select(_seeded_bloom_pos().alias("pos"))
        .distinct()
    )
    probes = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    probe_pos = probes.withColumn(
        "i", F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)]))
    ).select("c_custkey", _seeded_bloom_pos().alias("pos"))
    matched = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_set"))
    )
    flags = (
        probes.join(matched, "c_custkey", "left")
        .withColumn(
            "est_member", F.coalesce(F.col("n_set"), F.lit(0)) == BLOOM_K
        )
        .join(hot.withColumn("true_member", F.lit(True)), "c_custkey", "left")
        .withColumn(
            "true_member", F.coalesce(F.col("true_member"), F.lit(False))
        )
        .join(F.broadcast(cust.select("c_custkey", "c_mktsegment")), "c_custkey")
    )
    return flags.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_probes"),
        F.sum(F.col("true_member").cast("long")).alias("n_true"),
        F.sum(F.col("est_member").cast("long")).alias("n_est"),
        F.sum(
            (F.col("est_member") & ~F.col("true_member")).cast("long")
        ).alias("n_false_pos"),
        (
            F.sum((F.col("true_member") & ~F.col("est_member")).cast("long"))
            == 0
        ).alias("no_false_negatives"),
    )


def _seeded_bloom_pos() -> "F.Column":
    """Dispatch the per-seed position expression on the exploded i."""
    pos = F.lit(None).cast("long")
    for i in range(BLOOM_K):
        pos = F.when(F.col("i") == i, _bloom_pos_spark(i, "c_custkey")).otherwise(
            pos
        )
    return pos


def _bloom_oracle() -> str:
    seeds = ", ".join(str(i) for i in range(BLOOM_K))
    return f"""
WITH hot AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {BLOOM_ACCTBAL_MIN}
), bits AS (
  SELECT DISTINCT {_bloom_pos_sql("i", "c_custkey")} AS pos
  FROM hot CROSS JOIN (SELECT unnest([{seeds}]) AS i) seeds
), probes AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
), probe_pos AS (
  SELECT c_custkey, {_bloom_pos_sql("i", "c_custkey")} AS pos
  FROM probes CROSS JOIN (SELECT unnest([{seeds}]) AS i) seeds
), matched AS (
  SELECT c_custkey, count(*) AS n_set
  FROM probe_pos JOIN bits USING (pos)
  GROUP BY 1
), flags AS (
  SELECT p.c_custkey,
         COALESCE(m.n_set, 0) = {BLOOM_K} AS est_member,
         h.c_custkey IS NOT NULL AS true_member,
         c.c_mktsegment
  FROM probes p
  LEFT JOIN matched m ON p.c_custkey = m.c_custkey
  LEFT JOIN hot h ON p.c_custkey = h.c_custkey
  JOIN customer c ON p.c_custkey = c.c_custkey
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN true_member THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN est_member THEN 1 ELSE 0 END) AS BIGINT) AS n_est,
       CAST(sum(CASE WHEN est_member AND NOT true_member THEN 1 ELSE 0 END)
         AS BIGINT) AS n_false_pos,
       sum(CASE WHEN true_member AND NOT est_member THEN 1 ELSE 0 END) = 0
         AS no_false_negatives
FROM flags
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sketch_kmv_distinct — k-minimum-values distinct estimator + merge proof
# ---------------------------------------------------------------------------

#: KMV sketch size. 64 keeps the sketch saturated (estimator branch live)
#: from sf0.01 up (150 distinct users per event_type) while the sf0.001
#: fixture (15 users) exercises the exact under-fill branch. RSE for KMV is
#: 1/sqrt(K-2) ~ 12.7%; the audit flag allows 5 RSE, same policy as HLL.
KMV_K = 64
KMV_HASH_SPACE = 1 << 32


def _kmv_hash_spark(col: str) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kmv:"), F.col(col))), 1, 8), 16, 10
        ).cast("long")
        + 1
    )


def _kmv_hash_sql(expr: str) -> str:
    return f"CAST('0x' || substring(md5('kmv:' || {expr}), 1, 8) AS BIGINT) + 1"


def q_sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002) per
    event_type, plus an ``__all__`` row REBUILT BY MERGING the per-type
    sketches — the union of per-group k-smallest sets re-truncated to its
    k smallest is exactly the KMV of the union, which is the mergeability
    property that makes the sketch useful at 100 TB (per-day / per-shard
    sketches persisted once answer any rollup without rescanning raw
    data; cf. the HLL family above — KMV adds set-INTERSECTION support
    HLL lacks, via the Jaccard of the combined sample).

    Both engines derive the hash from md5, so the sketch is a pure
    function of the data and the ESTIMATE ITSELF hash-checks (same
    standard as ``sketch_cms_counts``): estimate = (K-1) * 2^32 / h_(K)
    is one division of exact integers. Under-filled groups (< K distinct)
    report the sketch's exact count — KMV is lossless below K.

    Scale shape: distinct (event_type, user_id) hash-aggregates with
    map-side partials, and the ``rnk <= K`` filter is rewritten by
    Catalyst into Partial -> Final ``WindowGroupLimit`` (verified in the
    physical plan), so every input partition truncates to its k smallest
    hashes per group BEFORE the shuffle — the shuffle moves ≤ K rows per
    group per partition regardless of user cardinality, which is the
    production sketch plan, not an audit shortcut. The merged ``__all__``
    re-rank runs over ≤ K * n_groups already-truncated rows (bounded by
    construction). Only the exact-count audit column scales with
    cardinality — it is the point of comparison, not the sketch."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hashed = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn("h", _kmv_hash_spark("user_id"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    ranked = hashed.withColumn("rnk", F.row_number().over(w))
    sketch = ranked.filter(F.col("rnk") <= KMV_K)

    # merged '__all__' sketch: k smallest of the union of per-type sketches
    merged = (
        sketch.select("h")
        .distinct()
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(F.col("h").asc())
            ),
        )
        .filter(F.col("rnk") <= KMV_K)
        .withColumn("event_type", F.lit("__all__"))
    )

    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    exact_all = ev.agg(F.countDistinct("user_id").alias("n_exact"))

    def finalize(sk: DataFrame) -> DataFrame:
        return sk.groupBy("event_type").agg(
            F.count("*").alias("sketch_fill"),
            F.max(F.when(F.col("rnk") == KMV_K, F.col("h"))).alias("kth_hash"),
        )

    per_type = finalize(sketch).join(exact, "event_type")
    # 1-row merged summary x 1-row exact total — a designed scalar cross
    all_row = finalize(merged).crossJoin(F.broadcast(exact_all))
    combined = per_type.unionByName(all_row)
    est = F.when(
        F.col("sketch_fill") < KMV_K, F.col("sketch_fill").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1) * KMV_HASH_SPACE) / F.col("kth_hash").cast("double")
    )
    return combined.select(
        "event_type",
        "n_exact",
        "sketch_fill",
        "kth_hash",
        est.alias("est_distinct"),
        (
            F.abs(est - F.col("n_exact").cast("double"))
            <= F.lit(5.0 / (KMV_K - 2) ** 0.5) * F.col("n_exact").cast("double")
        ).alias("within_bound"),
    )


_KMV_ORACLE = f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
), hashed AS (
  SELECT event_type, {_kmv_hash_sql("user_id")} AS h FROM du
), ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rnk
  FROM hashed
), sketch AS (
  SELECT event_type, h, rnk FROM ranked WHERE rnk <= {KMV_K}
), merged AS (
  SELECT '__all__' AS event_type, h,
         row_number() OVER (ORDER BY h ASC) AS rnk
  FROM (SELECT DISTINCT h FROM sketch)
), both_sketches AS (
  SELECT * FROM sketch
  UNION ALL
  SELECT * FROM merged WHERE rnk <= {KMV_K}
), finalized AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS sketch_fill,
         max(CASE WHEN rnk = {KMV_K} THEN h END) AS kth_hash
  FROM both_sketches GROUP BY 1
), exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
  UNION ALL
  SELECT '__all__', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
), joined AS (
  SELECT f.event_type, e.n_exact, f.sketch_fill, f.kth_hash,
         CASE WHEN f.sketch_fill < {KMV_K}
              THEN CAST(f.sketch_fill AS DOUBLE)
              ELSE CAST({float(KMV_K - 1) * KMV_HASH_SPACE} AS DOUBLE)
                   / CAST(f.kth_hash AS DOUBLE)
         END AS est_distinct
  FROM finalized f JOIN exact e USING (event_type)
)
SELECT event_type, n_exact, sketch_fill, kth_hash, est_distinct,
       abs(est_distinct - CAST(n_exact AS DOUBLE))
         <= {5.0 / (KMV_K - 2) ** 0.5} * CAST(n_exact AS DOUBLE)
         AS within_bound
FROM joined
"""


# ---------------------------------------------------------------------------
# sketch_ams_f2 — second frequency moment (self-join size) via AMS
# ---------------------------------------------------------------------------

#: AMS estimator rows (mean-of-R); variance of the mean is 2*F2^2/R
AMS_R = 16


def _ams_sign_spark(r: int, col: str) -> F.Column:
    """±1 four-wise-ish sign for row r, md5-derived like every sketch
    hash here (pure function of the data — both engines agree)."""
    return (
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"ams{r}:"), F.col(col))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
    )


def _ams_sign_sql(r: str, expr: str) -> str:
    return (
        f"CASE WHEN CAST('0x' || substring(md5('ams' || {r} || ':' || {expr}),"
        f" 1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
    )


def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second frequency moment F2 = Σ_u c_u² (the self-join size /
    skew statistic that sizes shuffle-join outputs and flags hot keys)
    via the AMS tug-of-war sketch (Alon-Matias-Szegedy 1996): R
    independent ±1-signed sums X_r = Σ_u s_r(u)·c_u, each X_r² an
    unbiased F2 estimate, averaged. This completes the sketch family:
    HLL/KMV estimate F0, CMS answers point queries, AMS estimates F2 —
    none substitutes for another.

    The signs are md5-derived, so the sketch is a pure function of the
    data and the ESTIMATE ITSELF hash-checks; X_r and ΣX_r² are exact
    integers, the estimate is ONE division, and ``within_bound`` states
    the mean-of-R variance contract (|est−F2| ≤ 3·√(2/R)·F2) as a value
    the oracle must reproduce.

    Scale shape: an R-way explode (map-only), then ONE aggregate whose
    state is R signed longs per partition — constant-size regardless of
    user cardinality, the same partial-aggregate story as CMS. Only the
    exact-F2 audit (one count aggregate on user_id) scales with data."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    rows = ev.withColumn(
        "r", F.explode(F.array(*[F.lit(r) for r in range(AMS_R)]))
    )
    sign = F.lit(None).cast("long")
    for r in range(AMS_R):
        sign = F.when(F.col("r") == r, _ams_sign_spark(r, "user_id")).otherwise(
            sign
        )
    sketch = (
        rows.withColumn("s", sign)
        .groupBy("r")
        .agg(F.sum("s").cast("long").alias("x"))
        .agg(F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_x2"))
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    )
    est = F.col("sum_x2").cast("double") / F.lit(float(AMS_R))
    bound = F.lit(3.0 * (2.0 / AMS_R) ** 0.5)
    return sketch.crossJoin(F.broadcast(exact)).select(
        "f2_exact",
        "sum_x2",
        est.alias("f2_est"),
        (
            (est - F.col("f2_exact").cast("double"))
            / F.col("f2_exact").cast("double")
        ).alias("rel_err"),
        (
            F.abs(est - F.col("f2_exact").cast("double"))
            <= bound * F.col("f2_exact").cast("double")
        ).alias("within_bound"),
    )


def _ams_oracle() -> str:
    rs = ", ".join(str(r) for r in range(AMS_R))
    bound = 3.0 * (2.0 / AMS_R) ** 0.5
    return f"""
WITH ev AS (
  SELECT user_id FROM events
), rows_r AS (
  SELECT user_id, r FROM ev CROSS JOIN (SELECT unnest([{rs}]) AS r) js
), signed AS (
  SELECT r, {_ams_sign_sql("r", "user_id")} AS s FROM rows_r
), sketch AS (
  SELECT CAST(sum(x * x) AS BIGINT) AS sum_x2 FROM (
    SELECT r, CAST(sum(s) AS BIGINT) AS x FROM signed GROUP BY 1
  )
), exact AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM (
    SELECT user_id, count(*) AS c FROM ev GROUP BY 1
  )
)
SELECT f2_exact, sum_x2,
       CAST(sum_x2 AS DOUBLE) / {float(AMS_R)} AS f2_est,
       (CAST(sum_x2 AS DOUBLE) / {float(AMS_R)} - CAST(f2_exact AS DOUBLE))
         / CAST(f2_exact AS DOUBLE) AS rel_err,
       abs(CAST(sum_x2 AS DOUBLE) / {float(AMS_R)}
           - CAST(f2_exact AS DOUBLE))
         <= {bound} * CAST(f2_exact AS DOUBLE) AS within_bound
FROM sketch CROSS JOIN exact
"""


# ---------------------------------------------------------------------------
# sketch_kmv_jaccard — set intersection from merged KMV samples (HLL can't)
# ---------------------------------------------------------------------------

def q_sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard similarity between event-type activity sets from
    KMV sketches — the capability that justifies KMV next to HLL:
    because a KMV sketch is a uniform bottom-k SAMPLE of the set's hash
    space, the k smallest hashes of A ∪ B form an unbiased sample of the
    union, and the fraction of that sample present in BOTH per-set
    sketches estimates |A∩B|/|A∪B| directly (Beyer et al. 2007). HLL
    supports union only; intersection via inclusion-exclusion explodes
    the relative error for small overlaps.

    The item domain is (user_id, day-of-month) activity cells — the
    fixture's per-type user sets are identical (every user emits every
    type), so user-level Jaccard would be degenerately 1.0; activity
    cells give real overlaps (~0.2-0.6). Hashes derive from md5, so the
    estimate itself hash-checks against the exact Jaccard, and the
    ``within_bound`` contract flag allows 5 standard errors of the
    bottom-k binomial (σ ≈ √(J(1−J)/K)).

    Scale shape: per-type sketches truncate map-side via
    WindowGroupLimit exactly like ``sketch_kmv_distinct``; every pair
    stage after that operates on ≤ 2K rows per pair (union tag, re-rank,
    fold) — constant work per pair regardless of set cardinality. Only
    the exact-Jaccard audit columns scale with the data."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    items = (
        ev.select(
            "event_type",
            (F.col("user_id") * 100 + F.dayofmonth("ts")).alias("item"),
        )
        .distinct()
        .withColumn("h", _kmv_hash_spark("item"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    sketch = (
        items.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KMV_K)
        .select("event_type", "h")
    )
    types = sketch.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    tagged = (
        pairs.join(sketch, F.col("event_type").isin(F.col("ta"), F.col("tb")))
        .groupBy("ta", "tb", "h")
        .agg(
            F.max((F.col("event_type") == F.col("ta")).cast("int")).alias("in_a"),
            F.max((F.col("event_type") == F.col("tb")).cast("int")).alias("in_b"),
        )
    )
    wu = Window.partitionBy("ta", "tb").orderBy(F.col("h").asc())
    union_k = tagged.withColumn("rnk", F.row_number().over(wu)).filter(
        F.col("rnk") <= KMV_K
    )
    est = union_k.groupBy("ta", "tb").agg(
        F.count("*").alias("k_eff"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )
    exact_pair = (
        items.select(F.col("event_type").alias("ta"), "item")
        .join(items.select(F.col("event_type").alias("tb"), "item"), "item")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = items.groupBy("event_type").agg(F.count("*").alias("n"))
    j_est = F.col("n_both").cast("double") / F.col("k_eff").cast("double")
    j_exact = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        est.join(exact_pair, ["ta", "tb"])
        .join(sizes.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a")), "ta")
        .join(sizes.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b")), "tb")
        .select(
            "ta",
            "tb",
            "n_a",
            "n_b",
            "n_inter",
            "k_eff",
            "n_both",
            j_exact.alias("jaccard_exact"),
            j_est.alias("jaccard_est"),
            (
                F.abs(j_est - j_exact)
                <= F.lit(5.0) * F.sqrt(j_exact * (1 - j_exact) / KMV_K)
            ).alias("within_bound"),
        )
    )


_KMV_JACCARD_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT event_type,
         user_id * 100 + date_part('day', ts) AS item
  FROM events
), hashed AS (
  SELECT event_type, item, {_kmv_hash_sql("item")} AS h FROM items
), sketch AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rnk
    FROM hashed
  ) WHERE rnk <= {KMV_K}
), types AS (
  SELECT DISTINCT event_type FROM sketch
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a, types b WHERE a.event_type < b.event_type
), tagged AS (
  SELECT ta, tb, h,
         max(CASE WHEN s.event_type = ta THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.event_type = tb THEN 1 ELSE 0 END) AS in_b
  FROM pairs JOIN sketch s ON s.event_type IN (ta, tb)
  GROUP BY 1, 2, 3
), union_k AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h ASC) AS rnk
    FROM tagged
  ) WHERE rnk <= {KMV_K}
), est AS (
  SELECT ta, tb, CAST(count(*) AS BIGINT) AS k_eff,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both
  FROM union_k GROUP BY 1, 2
), exact_pair AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_inter
  FROM hashed a JOIN hashed b ON a.item = b.item
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
), sizes AS (
  SELECT event_type, count(*) AS n FROM items GROUP BY 1
)
SELECT ta, tb, sa.n AS n_a, sb.n AS n_b, n_inter, k_eff, n_both,
       CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
         AS jaccard_exact,
       CAST(n_both AS DOUBLE) / CAST(k_eff AS DOUBLE) AS jaccard_est,
       abs(CAST(n_both AS DOUBLE) / CAST(k_eff AS DOUBLE)
           - CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE))
         <= 5.0 * sqrt(CAST(n_inter AS DOUBLE)
                       / CAST(sa.n + sb.n - n_inter AS DOUBLE)
                       * (1 - CAST(n_inter AS DOUBLE)
                              / CAST(sa.n + sb.n - n_inter AS DOUBLE))
                       / {KMV_K}) AS within_bound
FROM est
JOIN exact_pair USING (ta, tb)
JOIN sizes sa ON ta = sa.event_type
JOIN sizes sb ON tb = sb.event_type
"""


# ---------------------------------------------------------------------------
# sketch_theta_diff — theta-sketch set algebra: union / intersection /
# DIFFERENCE estimates from per-set bottom-k samples
# ---------------------------------------------------------------------------

#: 5 standard errors of the theta estimator's relative error ~ 1/sqrt(k-1)
#: (Dasgupta et al. 2016, §3) — a Python-literal so both engines compare
#: against the identical double.
_THETA_REL_BOUND = 5.0 / (KMV_K - 1) ** 0.5


def q_sketch_theta_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over event-type activity sets: union,
    intersection, and — the capability neither HLL (union-only) nor the
    KMV Jaccard (ratio-only) provides — set-DIFFERENCE cardinality
    estimates |A\\B| and |B\\A|, per event-type pair (Dasgupta et al.
    2016, the Apache DataSketches theta framework).

    Mechanics: each set keeps its k smallest md5-derived hashes; its
    theta is the k-th smallest hash when saturated (else the full hash
    space). For a pair, theta = min(theta_a, theta_b); every retained
    hash below that combined theta is a uniform sample of the union at
    sampling rate theta/SPACE, so |X| ~= n_sample(X) * SPACE / theta for
    ANY set expression X computable on the samples — union, intersection,
    both differences — with ONE estimator. The samples partition exactly
    (inter + diff_ab + diff_ba == union, emitted as the ``additive``
    contract), so the estimates are additive by construction: the algebra
    closes, which inclusion-exclusion over HLLs does not.

    Item domain: (user_id, day-of-month) activity cells, as in
    ``sketch_kmv_jaccard`` — per-type user sets are degenerate (identical)
    in the fixture; activity cells give real asymmetric differences.
    Hashes are md5-derived, all estimates are integer-multiply + one
    double division, so values hash-check cross-engine; ``within_*``
    flags assert 5 standard errors (~5/sqrt(k-1) relative, union-scaled
    for the sub-samples).

    Scale shape: per-type sketches truncate map-side via WindowGroupLimit
    (k rows per type leave the map side); every pair stage afterwards
    touches <= 2k rows per pair — constant work per pair at any set
    cardinality. Only the exact-audit columns scale with the data; at
    production scale the audit is dropped and the sketch stands alone.
    Reference scope note: the reference is a CDC relay with no analytics
    surface; this extends SURVEY.md §7 phase 5 (sketch family).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    items = (
        ev.select(
            "event_type",
            (F.col("user_id") * 100 + F.dayofmonth("ts")).alias("item"),
        )
        .distinct()
        .withColumn("h", _kmv_hash_spark("item"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    sketch = (
        items.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KMV_K)
        .select("event_type", "h")
    )
    sizes = items.groupBy("event_type").agg(F.count("*").alias("n_items"))
    theta = (
        sketch.groupBy("event_type")
        .agg(F.max("h").alias("kth"))
        .join(sizes, "event_type")
        .select(
            "event_type",
            F.when(F.col("n_items") >= KMV_K, F.col("kth"))
            .otherwise(F.lit(KMV_HASH_SPACE))
            .cast("long")
            .alias("theta"),
        )
    )
    pairs = (
        theta.select(
            F.col("event_type").alias("ta"), F.col("theta").alias("theta_a")
        )
        .crossJoin(
            theta.select(
                F.col("event_type").alias("tb"), F.col("theta").alias("theta_b")
            )
        )
        .filter(F.col("ta") < F.col("tb"))
        .select("ta", "tb", F.least("theta_a", "theta_b").alias("theta"))
    )
    tagged = (
        pairs.join(sketch, F.col("event_type").isin(F.col("ta"), F.col("tb")))
        .filter(F.col("h") < F.col("theta"))
        .groupBy("ta", "tb", "theta", "h")
        .agg(
            F.max((F.col("event_type") == F.col("ta")).cast("int")).alias("in_a"),
            F.max((F.col("event_type") == F.col("tb")).cast("int")).alias("in_b"),
        )
    )
    counts = tagged.groupBy("ta", "tb", "theta").agg(
        F.count("*").cast("long").alias("n_union_s"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter_s"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("long").alias("n_diff_ab_s"),
        F.sum(F.col("in_b") * (1 - F.col("in_a"))).cast("long").alias("n_diff_ba_s"),
    )

    def est(n_col: str) -> F.Column:
        return (F.col(n_col) * F.lit(KMV_HASH_SPACE)).cast("double") / F.col(
            "theta"
        ).cast("double")

    exact_pair = (
        items.select(F.col("event_type").alias("ta"), "item")
        .join(items.select(F.col("event_type").alias("tb"), "item"), "item")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    ex_union = (
        F.col("n_a") + F.col("n_b") - F.col("exact_inter")
    ).cast("long")
    slack = F.lit(_THETA_REL_BOUND) * ex_union.cast("double")
    return (
        counts.join(exact_pair, ["ta", "tb"])
        .join(
            sizes.select(
                F.col("event_type").alias("ta"), F.col("n_items").alias("n_a")
            ),
            "ta",
        )
        .join(
            sizes.select(
                F.col("event_type").alias("tb"), F.col("n_items").alias("n_b")
            ),
            "tb",
        )
        .select(
            "ta",
            "tb",
            (F.col("theta").cast("double") / F.lit(float(KMV_HASH_SPACE))).alias(
                "theta_frac"
            ),
            "n_union_s",
            "n_inter_s",
            "n_diff_ab_s",
            "n_diff_ba_s",
            est("n_union_s").alias("est_union"),
            est("n_inter_s").alias("est_inter"),
            est("n_diff_ab_s").alias("est_diff_ab"),
            est("n_diff_ba_s").alias("est_diff_ba"),
            ex_union.alias("exact_union"),
            "exact_inter",
            (F.col("n_a") - F.col("exact_inter")).cast("long").alias("exact_diff_ab"),
            (F.col("n_b") - F.col("exact_inter")).cast("long").alias("exact_diff_ba"),
            (
                F.col("n_inter_s")
                + F.col("n_diff_ab_s")
                + F.col("n_diff_ba_s")
                == F.col("n_union_s")
            ).alias("additive"),
            (F.abs(est("n_union_s") - ex_union.cast("double")) <= slack).alias(
                "within_union"
            ),
            (
                F.abs(est("n_inter_s") - F.col("exact_inter").cast("double"))
                <= slack
            ).alias("within_inter"),
            (
                F.abs(
                    est("n_diff_ab_s")
                    - (F.col("n_a") - F.col("exact_inter")).cast("double")
                )
                <= slack
            ).alias("within_diff_ab"),
        )
    )


_THETA_DIFF_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT event_type,
         user_id * 100 + date_part('day', ts) AS item
  FROM events
), hashed AS (
  SELECT event_type, item, {_kmv_hash_sql("item")} AS h FROM items
), sketch AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rnk
    FROM hashed
  ) WHERE rnk <= {KMV_K}
), sizes AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_items FROM items GROUP BY 1
), theta AS (
  SELECT s.event_type,
         CAST(CASE WHEN z.n_items >= {KMV_K} THEN max(s.h)
                   ELSE {KMV_HASH_SPACE} END AS BIGINT) AS theta
  FROM sketch s JOIN sizes z ON s.event_type = z.event_type
  GROUP BY 1, z.n_items
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         least(a.theta, b.theta) AS theta
  FROM theta a, theta b WHERE a.event_type < b.event_type
), tagged AS (
  SELECT ta, tb, theta, h,
         max(CASE WHEN s.event_type = ta THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.event_type = tb THEN 1 ELSE 0 END) AS in_b
  FROM pairs JOIN sketch s ON s.event_type IN (ta, tb) AND s.h < theta
  GROUP BY 1, 2, 3, 4
), counts AS (
  SELECT ta, tb, theta,
         CAST(count(*) AS BIGINT) AS n_union_s,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_inter_s,
         CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS n_diff_ab_s,
         CAST(sum(in_b * (1 - in_a)) AS BIGINT) AS n_diff_ba_s
  FROM tagged GROUP BY 1, 2, 3
), exact_pair AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM hashed a JOIN hashed b ON a.item = b.item
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ta, tb,
       CAST(theta AS DOUBLE) / {float(KMV_HASH_SPACE)} AS theta_frac,
       n_union_s, n_inter_s, n_diff_ab_s, n_diff_ba_s,
       CAST(n_union_s * {KMV_HASH_SPACE} AS DOUBLE) / CAST(theta AS DOUBLE)
         AS est_union,
       CAST(n_inter_s * {KMV_HASH_SPACE} AS DOUBLE) / CAST(theta AS DOUBLE)
         AS est_inter,
       CAST(n_diff_ab_s * {KMV_HASH_SPACE} AS DOUBLE) / CAST(theta AS DOUBLE)
         AS est_diff_ab,
       CAST(n_diff_ba_s * {KMV_HASH_SPACE} AS DOUBLE) / CAST(theta AS DOUBLE)
         AS est_diff_ba,
       CAST(sa.n_items + sb.n_items - exact_inter AS BIGINT) AS exact_union,
       exact_inter,
       CAST(sa.n_items - exact_inter AS BIGINT) AS exact_diff_ab,
       CAST(sb.n_items - exact_inter AS BIGINT) AS exact_diff_ba,
       n_inter_s + n_diff_ab_s + n_diff_ba_s = n_union_s AS additive,
       abs(CAST(n_union_s * {KMV_HASH_SPACE} AS DOUBLE) / CAST(theta AS DOUBLE)
           - CAST(sa.n_items + sb.n_items - exact_inter AS DOUBLE))
         <= {_THETA_REL_BOUND!r}
            * CAST(sa.n_items + sb.n_items - exact_inter AS DOUBLE)
         AS within_union,
       abs(CAST(n_inter_s * {KMV_HASH_SPACE} AS DOUBLE) / CAST(theta AS DOUBLE)
           - CAST(exact_inter AS DOUBLE))
         <= {_THETA_REL_BOUND!r}
            * CAST(sa.n_items + sb.n_items - exact_inter AS DOUBLE)
         AS within_inter,
       abs(CAST(n_diff_ab_s * {KMV_HASH_SPACE} AS DOUBLE) / CAST(theta AS DOUBLE)
           - CAST(sa.n_items - exact_inter AS DOUBLE))
         <= {_THETA_REL_BOUND!r}
            * CAST(sa.n_items + sb.n_items - exact_inter AS DOUBLE)
         AS within_diff_ab
FROM counts
JOIN exact_pair USING (ta, tb)
JOIN sizes sa ON ta = sa.event_type
JOIN sizes sb ON tb = sb.event_type
"""


def q_sketch_log_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The log-bucket sketch's MERGE rule, proven the way sketch_hll_merge
    pins HLL: per-day histograms summed cell-wise must equal the
    whole-corpus histogram EXACTLY (integer counters, exact associative
    merge — the property that lets per-day persisted sketches answer any
    rollup without rescans; DDSketch §3.2 mergeability). One row per
    bucket with direct and merged counts plus the equality contract the
    oracle recomputes (not echoes)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    iv = F.expr("CAST(floor(value * 1000) AS BIGINT)")
    based = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), iv.alias("iv")
    ).filter(F.col("iv") >= 0)
    per_day = based.groupBy(
        "day", F.expr("length(bin(iv + 1))").alias("bucket")
    ).agg(F.count("*").alias("c"))
    merged = per_day.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("merged_count"),
        F.countDistinct("day").cast("long").alias("n_days"),
    )
    direct = based.groupBy(
        F.expr("length(bin(iv + 1))").alias("bucket")
    ).agg(F.count("*").alias("direct_count"))
    return merged.join(direct, "bucket").select(
        "bucket",
        "n_days",
        "direct_count",
        "merged_count",
        (F.col("merged_count") == F.col("direct_count")).alias("merge_exact"),
    )


_LOG_HISTOGRAM_MERGE_ORACLE = """
WITH based AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(value * 1000) AS BIGINT) AS iv
  FROM events
  WHERE CAST(floor(value * 1000) AS BIGINT) >= 0
), per_day AS (
  SELECT day, length(bin(iv + 1)) AS bucket, CAST(count(*) AS BIGINT) AS c
  FROM based GROUP BY 1, 2
), merged AS (
  SELECT bucket, CAST(sum(c) AS BIGINT) AS merged_count,
         CAST(count(DISTINCT day) AS BIGINT) AS n_days
  FROM per_day GROUP BY 1
), direct AS (
  SELECT length(bin(iv + 1)) AS bucket, CAST(count(*) AS BIGINT)
    AS direct_count
  FROM based GROUP BY 1
)
SELECT bucket, n_days, direct_count, merged_count,
       merged_count = direct_count AS merge_exact
FROM merged JOIN direct USING (bucket)
"""


def q_sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from Count-Min sketches — the classic
    query-planning primitive (the CMS inner product, Cormode &
    Muthukrishnan 2005 §4.2): |A JOIN B on k| = Σ_k fA(k)·fB(k) is
    estimated as min over hash rows j of Σ_b cmsA[j,b]·cmsB[j,b],
    WITHOUT touching either table's keys again. The estimate can only
    overcount (hash collisions add cross terms), so ``never_under`` is a
    mathematical literal; ``within_markov_bound`` is the standard
    overcount bound err <= 2·|A|·|B|/WIDTH, computed identically on both
    sides.

    Scale shape: each side folds to the fixed DEPTHxWIDTH grid map-side
    (2048 longs per partition regardless of key cardinality); the
    estimate is a grid-x-grid equi-join on (row, bucket) — 2048-row
    frames. Only the exact audit (two per-key count aggregates + one
    join) scales with data, and it exists to grade the sketch."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )

    ga, gb = _cms_grid(ev, "k"), _cms_grid(orders, "k")
    est = (
        ga.withColumnRenamed("c", "ca")
        .join(gb.withColumnRenamed("c", "cb"), ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").alias("cms_estimate"))
    )
    ca = ev.groupBy("k").agg(F.count("*").alias("na"))
    cb = orders.groupBy("k").agg(F.count("*").alias("nb"))
    exact = ca.join(cb, "k").agg(
        F.sum(F.col("na") * F.col("nb")).alias("exact_join_size")
    )
    totals = ev.agg(F.count("*").alias("n_a")).crossJoin(
        F.broadcast(orders.agg(F.count("*").alias("n_b")))
    )
    return (
        totals.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(est))
        .select(
            "n_a",
            "n_b",
            "exact_join_size",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_join_size")).alias(
                "never_under"
            ),
            (
                (F.col("cms_estimate") - F.col("exact_join_size"))
                * F.lit(CMS_WIDTH)
                <= F.lit(2) * F.col("n_a") * F.col("n_b")
            ).alias("within_markov_bound"),
        )
    )


def _cms_join_size_oracle() -> str:
    grids = []
    for side, src, key in (("ga", "events", "user_id"), ("gb", "orders", "o_custkey")):
        rows = " UNION ALL ".join(
            f"SELECT {j} AS j, {_cms_bucket_sql(str(j), key)} AS bucket "
            f"FROM {src}"
            for j in range(CMS_DEPTH)
        )
        grids.append(
            f"{side} AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS c "
            f"FROM ({rows}) GROUP BY 1, 2)"
        )
    return f"""
WITH {grids[0]}, {grids[1]},
est AS (
  SELECT CAST(min(ip) AS BIGINT) AS cms_estimate FROM (
    SELECT ga.j, sum(ga.c * gb.c) AS ip
    FROM ga JOIN gb ON ga.j = gb.j AND ga.bucket = gb.bucket
    GROUP BY 1
  )
), exact AS (
  SELECT CAST(sum(na * nb) AS BIGINT) AS exact_join_size FROM (
    SELECT user_id AS k, count(*) AS na FROM events GROUP BY 1
  ) a JOIN (
    SELECT o_custkey AS k, count(*) AS nb FROM orders GROUP BY 1
  ) b USING (k)
), totals AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_a,
         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_b
)
SELECT n_a, n_b, exact_join_size, cms_estimate,
       cms_estimate >= exact_join_size AS never_under,
       (cms_estimate - exact_join_size) * {CMS_WIDTH}
         <= 2 * n_a * n_b AS within_markov_bound
FROM totals CROSS JOIN exact CROSS JOIN est
"""


#: Log-bucket sketch quantile targets as exact integer fractions (num/den)
#: so the rank thresholds are integer math in both engines.
LOGHIST_QUANTILES = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def q_sketch_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style relative-error quantiles with gamma=2: values scale
    to integer micro-units and bucket by bit length (bucket b holds
    [2^(b-1)-1, 2^b-1) micro-units), so any quantile answers from the
    fixed-width histogram with a guaranteed 2x relative value error —
    the log-bucket idea of DDSketch (Masson et al., VLDB'19) with the
    power-of-two collapse that makes the bucket function pure integer
    bit-length (``length(bin(x))``), bit-identical across engines.

    Scale shape: ONE map-side hash aggregate into <= 64 buckets (the
    shuffle moves at most 64 longs per partition at ANY cardinality —
    the same constant-state property as the HLL family); the cumulative
    walk and the 3-row quantile probe run on the 64-row histogram.
    Output: per target quantile, the answering bucket and its integer
    value bracket."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("value")
    iv = F.expr("CAST(floor(value * 1000) AS BIGINT)")
    hist = (
        ev.select(iv.alias("iv"))
        .filter(F.col("iv") >= 0)
        .groupBy(F.expr("length(bin(iv + 1))").alias("bucket"))
        .agg(F.count("*").alias("bucket_count"))
    )
    # <= 64-row bounded domain: the unpartitioned cumulative walk is safe
    cum = hist.withColumn(
        "cum_count",
        F.sum("bucket_count").over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("n_total", F.sum("bucket_count").over(Window.partitionBy()))
    qdim = spark.createDataFrame(
        list(LOGHIST_QUANTILES), "quantile string, num long, den long"
    )
    hit = cum.join(
        F.broadcast(qdim),
        F.col("cum_count") * F.col("den") >= F.col("num") * F.col("n_total"),
    )
    first = hit.groupBy("quantile").agg(
        F.min_by(
            F.struct("bucket", "bucket_count", "cum_count", "n_total"),
            F.col("bucket"),
        ).alias("h")
    )
    return first.select(
        "quantile",
        F.col("h.bucket").alias("bucket"),
        F.expr("shiftleft(CAST(1 AS BIGINT), h.bucket - 1) - 1").alias("lo_micros"),
        F.expr("shiftleft(CAST(1 AS BIGINT), h.bucket) - 1").alias("hi_micros"),
        F.col("h.bucket_count").alias("bucket_count"),
        F.col("h.cum_count").alias("cum_count"),
        F.col("h.n_total").alias("n_total"),
    )


def _log_histogram_oracle() -> str:
    qrows = ", ".join(f"('{q}', {n}, {d})" for q, n, d in LOGHIST_QUANTILES)
    return f"""
WITH iv AS (
  SELECT CAST(floor(value * 1000) AS BIGINT) AS iv FROM events
  WHERE CAST(floor(value * 1000) AS BIGINT) >= 0
), hist AS (
  SELECT length(bin(iv + 1)) AS bucket, CAST(count(*) AS BIGINT) AS bucket_count
  FROM iv GROUP BY 1
), cum AS (
  SELECT bucket, bucket_count,
         CAST(sum(bucket_count) OVER (ORDER BY bucket
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_count,
         CAST(sum(bucket_count) OVER () AS BIGINT) AS n_total
  FROM hist
), qdim AS (
  SELECT * FROM (VALUES {qrows}) AS t(quantile, num, den)
), hit AS (
  SELECT quantile, bucket, bucket_count, cum_count, n_total,
         row_number() OVER (PARTITION BY quantile ORDER BY bucket) AS rn
  FROM cum JOIN qdim ON cum_count * den >= num * n_total
)
SELECT quantile, bucket,
       (CAST(1 AS BIGINT) << (bucket - 1)) - 1 AS lo_micros,
       (CAST(1 AS BIGINT) << bucket) - 1 AS hi_micros,
       bucket_count, cum_count, n_total
FROM hit WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# moments sketch: exact power sums + merge proof + Cantelli tail bounds
# ---------------------------------------------------------------------------

#: Tail thresholds (centi-units of events.value, i.e. 300.00 / 400.00 /
#: 500.00) at which the sketch's distribution-free bound is audited.
MOMENTS_THRESHOLDS = (30000, 40000, 50000)


def q_sketch_moments_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moments sketch (the power-sum summary of Gan et al., VLDB 2018,
    restricted to k<=2) over ``events.value``: values are floor-quantized
    to integer centi-units so the sketch state (n, sum v, sum v^2) is
    three exact BIGINTs — trivially mergeable by addition, which the
    query PROVES by building the same sketch twice (directly, and by
    summing per-event_type partial sketches) and emitting the equality.
    From the merged sketch it derives mean/variance and audits the
    one-sided Cantelli (Chebyshev-Cantelli) tail bound
    P(X - mu >= d) <= var / (var + d^2) against the exact tail count at
    each threshold — the distribution-free guarantee a query planner can
    use for cardinality caps without scanning the data twice.

    Exactness: quantization makes every sum a BIGINT; mean/var/bound are
    fixed short sequences of IEEE ops identical in both engines. BIGINT
    headroom: v^2 <= 3.2e9 at value<=560, so ~2.9e9 rows fit before
    sum(v^2) nears 2^63 — beyond that the state must widen to
    DECIMAL(38,0)/HUGEINT (documented boundary, not hit at any test SF).

    Scale shape: ONE map-side pass builds both sketch forms (the
    per-type partials are a ~|event_type|-row aggregate); thresholds are
    unstacked from the single reduced row. Nothing but constant-width
    sketch state ever shuffles — the defining property of the family.
    Reference scope note: no analytics surface in the CDC reference —
    SURVEY.md §7 phase-4/5 sketch extension."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100.0) AS BIGINT)").alias("v"),
    )
    tail_aggs = [
        F.sum(F.expr(f"CASE WHEN v >= {t} THEN 1 ELSE 0 END"))
        .cast("long")
        .alias(f"exact_ge_{t}")
        for t in MOMENTS_THRESHOLDS
    ]
    direct = ev.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("s2"),
        *tail_aggs,
    )
    merged = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("pn"),
            F.sum("v").cast("long").alias("ps1"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("ps2"),
        )
        .agg(
            F.sum("pn").cast("long").alias("mn"),
            F.sum("ps1").cast("long").alias("ms1"),
            F.sum("ps2").cast("long").alias("ms2"),
        )
    )
    both = direct.join(F.broadcast(merged))
    mean = F.col("ms1").cast("double") / F.col("mn").cast("double")
    var = (
        F.col("ms2").cast("double") / F.col("mn").cast("double")
    ) - mean * mean
    stack_args = ", ".join(
        f"CAST({t} AS BIGINT), exact_ge_{t}" for t in MOMENTS_THRESHOLDS
    )
    stacked = both.select(
        "n",
        "s1",
        "s2",
        (
            (F.col("mn") == F.col("n"))
            & (F.col("ms1") == F.col("s1"))
            & (F.col("ms2") == F.col("s2"))
        ).alias("merge_matches"),
        mean.alias("mean_centi"),
        var.alias("var_centi2"),
        F.expr(
            f"stack({len(MOMENTS_THRESHOLDS)}, {stack_args}) AS "
            "(threshold_centi, exact_count)"
        ),
    )
    d = F.col("threshold_centi").cast("double") - F.col("mean_centi")
    bound = (
        F.col("n").cast("double")
        * F.col("var_centi2")
        / (F.col("var_centi2") + d * d)
    )
    return stacked.select(
        "threshold_centi",
        "n",
        "s1",
        "s2",
        "merge_matches",
        "mean_centi",
        "var_centi2",
        bound.alias("cantelli_bound"),
        "exact_count",
        (F.col("exact_count").cast("double") <= bound).alias("bound_holds"),
    )


def _moments_oracle() -> str:
    tails = ",\n".join(
        f"         CAST(coalesce(sum(CASE WHEN v >= {t} THEN 1 ELSE 0 END), 0)"
        f" AS BIGINT) AS exact_ge_{t}"
        for t in MOMENTS_THRESHOLDS
    )
    points = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS threshold_centi, "
        f"exact_ge_{t} AS exact_count FROM agg"
        for t in MOMENTS_THRESHOLDS
    )
    return f"""
WITH q AS (
  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS v FROM events
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v * v) AS BIGINT) AS s2,
{tails}
  FROM q
), partials AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS pn,
         CAST(sum(v) AS BIGINT) AS ps1, CAST(sum(v * v) AS BIGINT) AS ps2
  FROM q GROUP BY 1
), m AS (
  SELECT CAST(sum(pn) AS BIGINT) AS mn, CAST(sum(ps1) AS BIGINT) AS ms1,
         CAST(sum(ps2) AS BIGINT) AS ms2
  FROM partials
), rows_ AS ({points})
SELECT threshold_centi, n, s1, s2,
       (mn = n AND ms1 = s1 AND ms2 = s2) AS merge_matches,
       CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE) AS mean_centi,
       (CAST(ms2 AS DOUBLE) / CAST(mn AS DOUBLE))
         - (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE))
           * (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE)) AS var_centi2,
       CAST(n AS DOUBLE)
         * ((CAST(ms2 AS DOUBLE) / CAST(mn AS DOUBLE))
            - (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE))
              * (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE)))
         / (((CAST(ms2 AS DOUBLE) / CAST(mn AS DOUBLE))
             - (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE))
               * (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE)))
            + (CAST(threshold_centi AS DOUBLE)
               - CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE))
              * (CAST(threshold_centi AS DOUBLE)
                 - CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE)))
         AS cantelli_bound,
       exact_count,
       CAST(exact_count AS DOUBLE) <=
       CAST(n AS DOUBLE)
         * ((CAST(ms2 AS DOUBLE) / CAST(mn AS DOUBLE))
            - (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE))
              * (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE)))
         / (((CAST(ms2 AS DOUBLE) / CAST(mn AS DOUBLE))
             - (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE))
               * (CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE)))
            + (CAST(threshold_centi AS DOUBLE)
               - CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE))
              * (CAST(threshold_centi AS DOUBLE)
                 - CAST(ms1 AS DOUBLE) / CAST(mn AS DOUBLE)))
         AS bound_holds
FROM agg CROSS JOIN m CROSS JOIN rows_
"""


_MOMENTS_ORACLE = _moments_oracle()


SPECS = [
    QuerySpec(
        "sketch_moments_bound", q_sketch_moments_bound, _MOMENTS_ORACLE
    ),
    QuerySpec("sketch_hll_distinct", q_sketch_hll_distinct, _HLL_DISTINCT_ORACLE),
    QuerySpec(
        "sketch_log_histogram", q_sketch_log_histogram, _log_histogram_oracle()
    ),
    QuerySpec(
        "sketch_cms_join_size", q_sketch_cms_join_size, _cms_join_size_oracle()
    ),
    QuerySpec(
        "sketch_log_histogram_merge",
        q_sketch_log_histogram_merge,
        _LOG_HISTOGRAM_MERGE_ORACLE,
    ),
    QuerySpec("sketch_kmv_distinct", q_sketch_kmv_distinct, _KMV_ORACLE),
    QuerySpec("sketch_kmv_jaccard", q_sketch_kmv_jaccard, _KMV_JACCARD_ORACLE),
    QuerySpec("sketch_theta_diff", q_sketch_theta_diff, _THETA_DIFF_ORACLE),
    QuerySpec("sketch_ams_f2", q_sketch_ams_f2, _ams_oracle()),
    QuerySpec("sketch_cms_counts", q_sketch_cms_counts, _cms_oracle()),
    QuerySpec(
        "sketch_count_sketch", q_sketch_count_sketch, _count_sketch_oracle()
    ),
    QuerySpec(
        "sketch_bloom_membership", q_sketch_bloom_membership, _bloom_oracle()
    ),
    QuerySpec("sketch_hll_merge", q_sketch_hll_merge, _HLL_MERGE_ORACLE),
    QuerySpec("sketch_hll_rolling", q_sketch_hll_rolling, _HLL_ROLLING_ORACLE),
    QuerySpec("sketch_hll_overlap", q_sketch_hll_overlap, _HLL_OVERLAP_ORACLE),
    QuerySpec(
        "sketch_heavy_hitters", q_sketch_heavy_hitters, _HEAVY_HITTERS_ORACLE
    ),
    QuerySpec(
        "sketch_quantile_bound", q_sketch_quantile_bound, _quantile_oracle()
    ),
]


# ---------------------------------------------------------------------------
# sketch_tdigest_bound — merging t-digest quantiles, rank-error-bounded
# ---------------------------------------------------------------------------

#: t-digest compression δ: cluster weights are capped by the k1-style rule
#: 4·n·q(1-q)/δ + 1, so tails stay single-point-accurate while the middle
#: compresses — the property that makes t-digest the industry-standard
#: quantile sketch (Dunning's merging variant; public algorithm).
TDIGEST_DELTA = 100.0


def _td_compress(means, weights, delta: float):
    """One merging pass over mean-sorted centroids: greedily absorb the
    next centroid while the merged cluster stays under the k1 weight cap
    at its own mid-quantile. Deterministic given the sorted input."""
    import numpy as np

    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w, cum = float(means[0]), float(weights[0]), 0.0
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + (cur_w + w) / 2.0) / total
        cap = 4.0 * total * q * (1.0 - q) / delta + 1.0
        if cur_w + w <= cap:
            cur_m += (m - cur_m) * w / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _td_quantile(means, weights, q: float) -> float:
    """Piecewise-linear estimate between centroid means (half-weight
    convention at the ends)."""
    import numpy as np

    n = float(weights.sum())
    target = q * n
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target))
    frac = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
    return float(means[i - 1] + frac * (means[i] - means[i - 1]))


def q_sketch_tdigest_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merging t-digest over event values — the second mergeable quantile
    sketch next to the GK summary (sketch_quantile_bound) and the log
    histogram: fixed-size centroid state, per-partition build, one
    associative merge, tails kept near-exact by the q(1-q) weight cap.
    The family's oracle discipline applies: centroid state is
    merge-order-dependent, so only exact-derived values and pass flags
    are emitted — each estimate's true rank interval (count below /
    count at-or-below, tie-proof by construction) must intersect
    p ∓ band where band = 2·(4·p(1-p)/δ) + 1e-3 (double the cap-derived
    rank-error guarantee, plus interpolation slack), the digest must
    conserve total weight exactly, and its size must stay under the
    cap-consistent ~(δ/2)·ln(4n/δ) bound (log-growing, 1.5x safety).
    A broken merge (lost weight, unsorted centroids, cap
    violation) flips a flag and hash-fails against the oracle's literal
    TRUEs.

    Scale shape: per-partition digests stream batch-by-batch (compress
    per Arrow batch, re-compress the accumulator — bounded memory at any
    partition size); the merge stage sees one ≤2δ-centroid row per
    partition (the standard sketch tree-merge); the exact-percentile
    bracket is ONE single-pass aggregate; final flags are a broadcast
    cross join of two 1-row frames."""
    import numpy as np
    import pandas as pd

    delta = TDIGEST_DELTA

    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v")
    )

    def build(batches):
        m = np.empty(0)
        w = np.empty(0)
        for pdf in batches:
            vals = pdf["v"].to_numpy(dtype=float)
            if len(vals) == 0:
                continue
            vals.sort()
            bm, bw = _td_compress(vals, np.ones(len(vals)), delta)
            order = np.argsort(np.concatenate([m, bm]), kind="stable")
            m = np.concatenate([m, bm])[order]
            w = np.concatenate([w, bw])[order]
            m, w = _td_compress(m, w, delta)
        if len(m):
            yield pd.DataFrame({"means": [m.tolist()], "weights": [w.tolist()]})

    partials = ev.mapInPandas(
        build, "means array<double>, weights array<double>"
    )

    def merge(batches):
        m = np.empty(0)
        w = np.empty(0)
        for pdf in batches:
            for mm, ww in zip(pdf["means"], pdf["weights"]):
                order = np.argsort(np.concatenate([m, mm]), kind="stable")
                m = np.concatenate([m, mm])[order]
                w = np.concatenate([w, ww])[order]
                m, w = _td_compress(m, w, delta)
        if not len(m):
            return
        yield pd.DataFrame(
            {
                **{
                    f"est_{int(p * 100)}": [_td_quantile(m, w, p)]
                    for p in PCT_POINTS
                },
                "total_w": [float(w.sum())],
                "n_centroids": [int(len(m))],
            }
        )

    est_schema = (
        ", ".join(f"est_{int(p * 100)} double" for p in PCT_POINTS)
        + ", total_w double, n_centroids int"
    )
    digest = partials.coalesce(1).mapInPandas(merge, est_schema)

    # The accuracy check runs in RANK space — count(v < est) / count(v <=
    # est) gives the estimate's true rank INTERVAL, which must intersect
    # [p - band, p + band]. (A value-space bracket between exact
    # percentiles breaks on duplicate-heavy data: with long runs of equal
    # values the digest legitimately interpolates to a value just below a
    # run whose percentile IS the run value — exactly the k-fold clone
    # regime. Rank intervals absorb ties by construction.)
    joined = ev.crossJoin(F.broadcast(digest))
    aggs = [
        F.count("*").alias("n"),
        F.first("total_w").alias("total_w"),
        F.first("n_centroids").alias("n_centroids"),
    ]
    for p in PCT_POINTS:
        tag = str(int(p * 100))
        aggs += [
            F.sum((F.col("v") < F.col(f"est_{tag}")).cast("long")).alias(
                f"rlo_{tag}"
            ),
            F.sum((F.col("v") <= F.col(f"est_{tag}")).cast("long")).alias(
                f"rhi_{tag}"
            ),
        ]
    wide = joined.agg(*aggs)
    out = [F.col("n")]
    for p in PCT_POINTS:
        tag = str(int(p * 100))
        # cap-derived rank-error guarantee doubled, plus 1e-3 slack for
        # the digest's own between-centroid interpolation
        band = 2.0 * (4.0 * p * (1.0 - p) / delta) + 1e-3
        out.append(
            (
                (F.col(f"rlo_{tag}").cast("double") <= (p + band) * F.col("n"))
                & (
                    F.col(f"rhi_{tag}").cast("double")
                    >= (p - band) * F.col("n")
                )
            ).alias(f"p{tag}_in_band")
        )
    out += [
        (F.col("total_w") == F.col("n").cast("double")).alias("weight_ok"),
        # the 4nq(1-q)/δ cap integrates to ~ (δ/2)·ln(4n/δ) clusters
        # (log-growing, NOT 2δ — the tails' +1 term dominates there);
        # 1.5x safety. Measured: 444 @ n=1e5, 566 @ n=1e6 with δ=100
        # against bounds 622 / 795. A failed compression (centroids ~ n)
        # exceeds this by orders of magnitude.
        (
            F.col("n_centroids").cast("double")
            <= 1.5 * (delta / 2.0) * F.log(4.0 * F.col("n") / delta)
        ).alias("size_ok"),
    ]
    return wide.select(*out)


def _tdigest_oracle() -> str:
    flags = ",\n       ".join(
        f"TRUE AS p{int(p * 100)}_in_band" for p in PCT_POINTS
    )
    return (
        f"SELECT count(*) AS n,\n       {flags},\n"
        "       TRUE AS weight_ok,\n       TRUE AS size_ok\nFROM events"
    )


SPECS.append(
    QuerySpec(
        "sketch_tdigest_bound", q_sketch_tdigest_bound, _tdigest_oracle()
    )
)
