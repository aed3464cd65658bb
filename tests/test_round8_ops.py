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


# ---------------------------------------------------------------------------
# cross-document exact-substring dedup, apply form
# ---------------------------------------------------------------------------


def _write_docs(tmp_path, texts: dict[int, str]) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = sorted(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["t"] * len(ids)),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_substring_apply_collapses_exact_duplicates(spark, tmp_path):
    """Lee et al. apply-form invariant: exact-duplicate docs collapse to
    ONE full-length survivor (min doc_id); a shared passage is cut from
    the non-keeper only, as one maximal span."""
    from mysql_streamer_spark.queries.dedup import q_dedup_substring_apply

    passage = " ".join(f"shared{i}" for i in range(10))
    u = " ".join(f"u{i}" for i in range(8))
    v = " ".join(f"v{i}" for i in range(8))
    texts = {
        1: passage,
        2: passage,
        3: passage,
        4: f"{u} {passage} {v}",
        5: " ".join(f"only{i}" for i in range(12)),
    }
    sf = _write_docs(tmp_path, texts)
    rows = {r.doc_id: r for r in q_dedup_substring_apply(spark, sf).collect()}

    # keeper copy survives full-length; the other copies scrub empty
    assert rows[1].scrubbed_text == passage and rows[1].n_removed_tokens == 0
    for d in (2, 3):
        assert rows[d].scrubbed_text == ""
        assert rows[d].n_removed_tokens == 10
        assert rows[d].cut_spans == "1-10"
    # embedded passage cut as ONE maximal span, unique content intact
    assert rows[4].scrubbed_text == f"{u} {v}"
    assert rows[4].cut_spans == "9-18"
    assert rows[4].n_cut_spans == 1 and rows[4].n_removed_tokens == 10
    # unique doc untouched
    assert rows[5].n_removed_tokens == 0 and rows[5].scrubbed_text == texts[5]


def test_substring_apply_matches_python_recompute(spark):
    """Differential: an independent Python implementation of the window
    index -> keeper election -> coverage union -> scrub on the sf0.001
    corpus must agree column-for-column."""
    import hashlib

    from mysql_streamer_spark.queries.dedup import (
        SUBSTR_K,
        q_dedup_substring_apply,
    )

    sf = "/root/testdata/sf0.001"
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    owners: dict[str, set[int]] = {}
    win: dict[int, list[str]] = {}
    for d, toks in docs.items():
        hs = []
        for i in range(len(toks) - SUBSTR_K + 1):
            h = hashlib.md5(
                " ".join(toks[i : i + SUBSTR_K]).encode()
            ).hexdigest()
            hs.append(h)
            owners.setdefault(h, set()).add(d)
        win[d] = hs
    expect = {}
    for d, toks in docs.items():
        cov = set()
        for i, h in enumerate(win[d]):
            os_ = owners[h]
            if len(os_) > 1 and min(os_) != d:
                cov.update(range(i + 1, i + 1 + SUBSTR_K))
        spans, s = [], None
        for p in sorted(cov):
            if s is None:
                s = e = p
            elif p == e + 1:
                e = p
            else:
                spans.append((s, e))
                s = e = p
        if s is not None:
            spans.append((s, e))
        kept = [t for j, t in enumerate(toks, start=1) if j not in cov]
        expect[d] = {
            "n_tokens": len(toks),
            "n_removed_tokens": len(cov),
            "n_cut_spans": len(spans),
            "cut_spans": ",".join(f"{a}-{b}" for a, b in spans),
            "scrubbed_text": " ".join(kept),
        }
    got = {r.doc_id: r for r in q_dedup_substring_apply(spark, sf).collect()}
    assert set(got) == set(expect)
    for d, ex in expect.items():
        for k, v in ex.items():
            assert got[d][k] == v, (d, k)
