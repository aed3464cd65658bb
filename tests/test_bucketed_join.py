"""Bucketed co-located join: both sides pre-bucketed on the join key must
join with NO shuffle exchange — the write-once-shuffle-never layout for
repeated big joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_streamer_spark.storage import read_table, write_bucketed
from mysql_streamer_spark.tables import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "b_orders",
        ["orderkey"],
        8,
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "b_lineitem",
        ["orderkey"],
        8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # disable broadcast so the join strategy is the bucket-aware SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, t1).join(read_table(spark, t2), "orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed sides must join without a shuffle"
        )
        # and it computes the right thing
        n = joined.count()
        o = read_table(spark, t1)
        li = read_table(spark, t2)
        expected = (
            li.join(o.hint("merge"), "orderkey").count()
        )
        assert n == expected > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
