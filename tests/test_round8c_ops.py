"""Round-8 second-continuation operators: LPA communities and friends —
differential tests against independent pure-Python recomputations."""

from __future__ import annotations

from collections import Counter


def _python_lpa(edges, rounds):
    """Reference synchronous LPA: neighbors + self vote; ties -> min."""
    nodes = sorted({n for e in edges for n in e})
    nbrs = {n: [] for n in nodes}
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    label = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            votes = Counter(label[m] for m in nbrs[n])
            votes[label[n]] += 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        label = new
    return label


def test_lpa_matches_python_on_bridged_cliques(spark, monkeypatch):
    """Two K4 cliques joined by one bridge edge: frequency voting must
    keep them as two communities (the case where LPA differs from
    connected components, which would merge them); the Spark trajectory
    replays the Python reference exactly, round for round."""
    from mysql_streamer_spark.queries import analytics as A

    k4a = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    k4b = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    bridge = [(4, 10)]
    edges = k4a + k4b + bridge
    df = spark.createDataFrame(edges, "u long, v long")
    monkeypatch.setattr(
        A, "_copurchase_edges", lambda spark, sf_dir, directed: df
    )
    got = {
        r.part: (r.community, r.n_members)
        for r in A.q_analytics_community_lpa(spark, "ignored").collect()
    }
    want = _python_lpa(edges, A.LPA_ROUNDS)
    sizes = Counter(want.values())
    assert got == {n: (lbl, sizes[lbl]) for n, lbl in want.items()}
    # structural expectation: exactly two communities, split at the bridge
    assert len(sizes) == 2
    assert set(sizes.values()) == {4}


def test_lpa_tie_breaks_to_min_label_deterministically(spark, monkeypatch):
    """On a 4-cycle every vote ties; the min-label rule must resolve every
    round identically in both engines (this is the determinism the fixed
    unroll + argmax-struct depends on)."""
    from mysql_streamer_spark.queries import analytics as A

    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    monkeypatch.setattr(
        A, "_copurchase_edges", lambda spark, sf_dir, directed: df
    )
    got = {
        r.part: r.community
        for r in A.q_analytics_community_lpa(spark, "ignored").collect()
    }
    assert got == _python_lpa(edges, A.LPA_ROUNDS)
