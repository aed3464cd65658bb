"""Differential pins for the driver-side graph folds (graphfold.py).

Every fold must return EXACTLY the distributed operator's frame — same
values, same schema — because the declared queries are hash-verified
against the DuckDB oracle. The tests run each query twice on the
fixture: once through the fold (the default at fixture size) and once
with the gate forced shut (distributed path), and assert set equality
both ways plus schema equality. The gate itself and the degenerate
fallbacks are unit-tested alongside.
"""

from __future__ import annotations

import numpy as np
import pytest

from mysql_streamer_spark import graphfold
from mysql_streamer_spark.queries import analytics as A


@pytest.fixture
def distributed_gate(monkeypatch):
    """Force the distributed path (fold gate shut)."""
    monkeypatch.setattr(graphfold, "GRAPH_FOLD_MAX_LI_ROWS", -1)


_QUERIES = [
    ("analytics_copurchase_pagerank", A.q_analytics_copurchase_pagerank),
    ("analytics_community_lpa", A.q_analytics_community_lpa),
    ("analytics_kcore", A.q_analytics_kcore),
    ("analytics_degree_distribution", A.q_analytics_degree_distribution),
    ("analytics_assortativity", A.q_analytics_assortativity),
]


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_fold_equals_distributed(spark, sf_dir, name, fn, monkeypatch):
    fold_df = fn(spark, sf_dir)
    # the fixture is far below the cap: the fold MUST have fired (a
    # LocalTableScan/ExistingRDD source, no parquet scan in the plan)
    plan = fold_df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Exchange" not in plan, plan

    monkeypatch.setattr(graphfold, "GRAPH_FOLD_MAX_LI_ROWS", -1)
    dist_df = fn(spark, sf_dir)
    assert [(f.name, f.dataType) for f in fold_df.schema.fields] == [
        (f.name, f.dataType) for f in dist_df.schema.fields
    ]
    assert dist_df.exceptAll(fold_df).count() == 0
    assert fold_df.exceptAll(dist_df).count() == 0
    A.release_copurchase_edges()
    spark.catalog.clearCache()


def test_edge_arrays_match_distributed_edge_frame(spark, sf_dir):
    for directed in (True, False):
        cols = ("src", "dst") if directed else ("u", "v")
        arrs = graphfold.copurchase_edge_arrays(spark, sf_dir, directed)
        assert arrs is not None
        got = sorted(zip(arrs[0].tolist(), arrs[1].tolist()))
        exp = sorted(
            (r[0], r[1])
            for r in A._copurchase_edges(spark, sf_dir, directed)
            .select(*cols)
            .collect()
        )
        assert got == exp
    A.release_copurchase_edges()
    spark.catalog.clearCache()


def test_gate_shut_means_no_fold(sf_dir, monkeypatch):
    monkeypatch.setattr(graphfold, "GRAPH_FOLD_MAX_LI_ROWS", -1)
    assert graphfold.li_rows_within_cap(sf_dir) is False


def test_gate_unknown_layout_is_distributed():
    assert graphfold.li_rows_within_cap("/nonexistent/dir") is False


def test_pair_explosion_guard_falls_back(spark, sf_dir, monkeypatch):
    """A degenerate basket expansion past GRAPH_FOLD_MAX_PAIRS must
    decline the fold (None), not materialize it."""
    monkeypatch.setattr(graphfold, "GRAPH_FOLD_MAX_PAIRS", 0)
    assert graphfold.copurchase_edge_arrays(spark, sf_dir, True) is None
    # and the query still answers through the distributed path
    assert A.q_analytics_assortativity(spark, sf_dir).count() == 1
    A.release_copurchase_edges()
    spark.catalog.clearCache()


def test_fold_int64_exactness_bounds():
    """The fold's int64 arithmetic cannot overflow below the gate: rank
    mass is bounded by PR_SCALE and contribution sums by total mass."""
    # max possible sum of contributions = total rank mass <= PR_SCALE
    assert A.PR_SCALE * 85 < np.iinfo(np.int64).max
