"""Approximate-sketch operators (HLL distinct, approximate percentiles)
validated against their exact counterparts. These stay OUT of the oracle
gate on purpose — sketch values are engine-private — so accuracy bounds
are asserted here instead: the 100 TB posture is approx-first (one pass,
mergeable state) with exact available where the key space is small."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_streamer_spark.tables import load_table


def test_hll_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact <= 0.06  # 3x the rsd


def test_approx_percentiles_bracket_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.expr("percentile(value, array(0.5, 0.95))").alias("exact"),
        F.expr("approx_percentile(value, array(0.5, 0.95), 1000)").alias("approx"),
    ).collect()[0]
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    spread = hi - lo
    for e, a in zip(row.exact, row.approx):
        assert abs(a - e) <= 0.02 * spread


def test_hll_partials_merge_like_the_aggregate(spark, sf_dir):
    """The property that makes sketches the scale path: per-partition
    sketches MERGE to the same estimate as one global pass (here: union
    of two disjoint halves vs whole table)."""
    ev = load_table(spark, sf_dir, "events")
    whole = ev.agg(F.approx_count_distinct("user_id").alias("n")).collect()[0].n
    halves = (
        ev.withColumn("half", (F.col("event_id") % 2).cast("int"))
        .groupBy("half")
        .agg(F.approx_count_distinct("user_id").alias("n"))
        .count()
    )
    assert halves == 2
    exact = ev.select("user_id").distinct().count()
    assert abs(whole - exact) / exact <= 0.1
