"""Round-7 operators: invariants verified against independent Python
recomputations (beyond the engine-agreement the DuckDB oracle proves)."""

from __future__ import annotations

import json
from itertools import combinations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _spec(name):
    from mysql_streamer_spark.queries import all_specs

    return next(s for s in all_specs() if s.name == name)


def test_triangle_count_matches_bruteforce(spark):
    """The degree-ordered census equals a driver-side brute-force triangle
    enumeration of the same co-purchase graph (tiny SF)."""
    rows = _spec("analytics_triangle_count").fn(spark, SF).collect()
    assert len(rows) == 1
    got = rows[0].asDict()

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set[int]] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in baskets.values():
        for u, v in combinations(sorted(parts), 2):
            edges.add((u, v))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1
        for u, v in edges
        for w in adj[u] & adj[v]
        if v < w  # count each triangle once via its smallest edge
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    assert got["n_edges"] == len(edges)
    assert got["n_nodes"] == len(adj)
    assert got["n_wedges"] == wedges
    assert got["n_triangles"] == tri
    if wedges:
        assert got["clustering_coefficient"] == pytest.approx(3.0 * tri / wedges)


def test_kn_bigram_lm_is_a_subprobability_model(spark):
    """Per w1, the smoothed head probabilities must sum to < 1 + slack (a
    discounted model never over-allocates mass), every probability is
    positive, and the discount identity holds: term1 < c12/c1."""
    from mysql_streamer_spark.queries.textops import KN_SCALE

    df = _spec("text_kn_bigram_lm").fn(spark, SF)
    rows = [r.asDict() for r in df.collect()]
    assert rows
    by_w1: dict[str, list[dict]] = {}
    for r in rows:
        assert 0 < r["p_kn_micros"] <= KN_SCALE
        # discounted ML term stays below the raw ML estimate
        assert (4 * r["c12"] - 3) / (4 * r["c1"]) < r["c12"] / r["c1"]
        by_w1.setdefault(r["w1"], []).append(r)
    for w1, grp in by_w1.items():
        # the HEAD is a subset of w1's continuations, so its mass plus the
        # interpolation weight cannot exceed 1 by more than rounding slack
        assert sum(r["p_kn_micros"] for r in grp) <= KN_SCALE + len(grp)


def test_log_histogram_brackets_exact_percentiles(spark):
    """Each reported bucket must CONTAIN the exact percentile of the
    micro-scaled values (the 2x relative-error contract, verified against
    a driver-side exact recomputation)."""
    import math

    vals = sorted(
        int(math.floor(r.value * 1000))
        for r in spark.read.parquet(f"{SF}/events.parquet").select("value").collect()
        if math.floor(r.value * 1000) >= 0
    )
    rows = {r["quantile"]: r.asDict() for r in _spec("sketch_log_histogram").fn(spark, SF).collect()}
    assert set(rows) == {"p50", "p90", "p99"}
    n = len(vals)
    for name, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        rank = -(-num * n // den)  # ceil
        exact = vals[rank - 1]
        r = rows[name]
        assert r["n_total"] == n
        assert r["lo_micros"] <= exact <= r["hi_micros"], (name, exact, r)


def test_point_in_time_replays_to_a_prefix_state(spark):
    """The AS-OF snapshot equals a driver-side replay of the envelope
    prefix: last message per key below the cutoff, deletes dropped."""
    from mysql_streamer_spark.cdc.envelope import TXN_FILE_SHIFT
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline
    from mysql_streamer_spark.queries.cdc import PIT_AS_OF_FILE

    cutoff = PIT_AS_OF_FILE * TXN_FILE_SHIFT
    env = [
        r.asDict()
        for r in envelope_pipeline(spark, SF)
        .select("database_name", "table_name", "pk", "message_type", "txn_order")
        .collect()
    ]
    state: dict[tuple, dict] = {}
    for r in sorted(env, key=lambda r: r["txn_order"]):
        if r["txn_order"] < cutoff:
            state[(r["database_name"], r["table_name"], r["pk"])] = r
    expected = {k for k, v in state.items() if v["message_type"] != "delete"}
    got = {
        (r.database_name, r.table_name, r.pk)
        for r in _spec("cdc_point_in_time").fn(spark, SF).collect()
    }
    assert got == expected
    assert len(got) > 0
    # and it is a strict prefix: strictly fewer keys than the full replay
    all_keys = {
        (r["database_name"], r["table_name"], r["pk"]) for r in env
    }
    assert len(got) < len(all_keys)


def test_key_churn_histogram_mass_conserves(spark):
    """sum(n_changes * n_keys) over the histogram == total message count,
    and sum(n_keys) == distinct key count (mass conservation)."""
    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline

    hist = [r.asDict() for r in _spec("cdc_key_churn").fn(spark, SF).collect()]
    env = envelope_pipeline(spark, SF)
    total = env.count()
    n_keys = env.select("database_name", "table_name", "pk").distinct().count()
    assert sum(r["n_changes"] * r["n_keys"] for r in hist) == total
    assert sum(r["n_keys"] for r in hist) == n_keys


def test_unpivot_roundtrips_the_pivot(spark):
    """melt(pivot(x)) == groupBy counts of x (zero cells dropped)."""
    direct = {
        (r.day, r.event_type): r.n
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        (r.day, r.event_type): r.n_events
        for r in _spec("analytics_unpivot").fn(spark, SF).collect()
    }
    assert got == direct


def test_variant_props_agrees_with_json_parse(spark):
    """The VARIANT path extraction equals a driver-side json.loads over the
    same rows."""
    raw = spark.read.parquet(f"{SF}/events.parquet").select("event_type", "props").collect()
    expect: dict[tuple, list[int]] = {}
    for r in raw:
        k = json.loads(r.props)["k"]
        expect.setdefault((r.event_type, k % 2), []).append(k)
    got = {
        (r.event_type, r.k_parity): r.asDict()
        for r in _spec("analytics_variant_props").fn(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for key, ks in expect.items():
        assert got[key]["n_events"] == len(ks)
        assert got[key]["sum_k"] == sum(ks)
        assert got[key]["n_distinct_k"] == len(set(ks))


def test_kcore_matches_python_peel(spark):
    """The 6-round synchronous peel equals an unbounded Python
    peel-to-fixpoint at sf0.01 (i.e. the fixed unroll reaches the true
    k-core with a round to spare), and survivors' degrees are the
    within-core degrees."""
    from mysql_streamer_spark.queries.analytics import KCORE_K, KCORE_ROUNDS

    sf = "/root/testdata/sf0.01"
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set[int]] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    adj: dict[int, set[int]] = {}
    for parts in baskets.values():
        for u, v in combinations(sorted(parts), 2):
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    live = {n: set(s) for n, s in adj.items()}
    rounds = 0
    while True:
        drop = [n for n, s in live.items() if len(s) < KCORE_K]
        if not drop:
            break
        rounds += 1
        for n in drop:
            for m in live[n]:
                live[m].discard(n)
            del live[n]
    assert rounds < KCORE_ROUNDS, "unroll must exceed fixpoint rounds"
    assert live, "fixture core must be non-degenerate"
    got = {
        r.part: r.core_degree
        for r in _spec("analytics_kcore").fn(spark, sf).collect()
    }
    assert got == {n: len(s) for n, s in live.items()}
