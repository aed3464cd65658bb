"""Round-8 fixes: adaptive k-core fixpoint, memoized co-purchase edge
cache, and the per-query bench gate's integration points."""

from __future__ import annotations

import pytest


def test_kcore_adaptive_peel_converges_beyond_oracle_unroll(spark, monkeypatch):
    """A 2-core over a cycle-with-a-long-tail needs ~10 peel rounds —
    more than the oracle's 6-round unroll — and the adaptive loop must
    still return the exact core (the 4-cycle) instead of a superset
    (ADVICE r7: the fixed unroll silently under-peeled such graphs)."""
    from mysql_streamer_spark.queries import analytics as A

    # 4-cycle (nodes 1-4, all degree 2) + a 10-node tail hanging off node 1:
    # each round peels exactly the current tail end, so convergence takes
    # 10 rounds — past KCORE_ROUNDS=6, below KCORE_MAX_ROUNDS.
    cycle = [(1, 2), (2, 3), (3, 4), (1, 4)]
    tail = [(1, 5)] + [(5 + i, 6 + i) for i in range(9)]  # path 1-5-6-..-14
    edges = spark.createDataFrame(cycle + tail, "u long, v long")

    monkeypatch.setattr(A, "KCORE_K", 2)
    monkeypatch.setattr(
        A, "_copurchase_edges", lambda spark, sf_dir, directed: edges
    )
    got = {
        r.part: r.core_degree
        for r in A.q_analytics_kcore(spark, "ignored").collect()
    }
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_kcore_raises_instead_of_returning_unconverged_superset(
    spark, monkeypatch
):
    from mysql_streamer_spark.queries import analytics as A

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 5), (5, 6)], "u long, v long"
    )
    monkeypatch.setattr(A, "KCORE_K", 2)
    monkeypatch.setattr(A, "KCORE_MAX_ROUNDS", 1)
    monkeypatch.setattr(
        A, "_copurchase_edges", lambda spark, sf_dir, directed: edges
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        A.q_analytics_kcore(spark, "ignored").collect()


def test_copurchase_edges_memoized_and_repersisted(spark, sf_dir):
    """One persisted frame per (sf_dir, orientation); a clearCache()
    eviction re-persists on next access instead of silently running the
    iterative consumers uncached (ADVICE r7)."""
    from mysql_streamer_spark.queries.analytics import (
        _copurchase_edges,
        release_copurchase_edges,
    )

    release_copurchase_edges()
    a = _copurchase_edges(spark, sf_dir, directed=True)
    b = _copurchase_edges(spark, sf_dir, directed=True)
    assert a is b, "same session+sf_dir+orientation must reuse ONE frame"
    c = _copurchase_edges(spark, sf_dir, directed=False)
    assert c is not a

    spark.catalog.clearCache()
    sl = a.storageLevel
    assert not (sl.useMemory or sl.useDisk), "precondition: evicted"
    a2 = _copurchase_edges(spark, sf_dir, directed=True)
    sl2 = a2.storageLevel
    assert a2 is a and (sl2.useMemory or sl2.useDisk), "must re-persist"
    release_copurchase_edges()
