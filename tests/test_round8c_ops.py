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


def test_pack_boundary_audit_counts_cross_doc_pairs_exactly(spark, monkeypatch):
    """Brute-force cross-document ordered-pair counting on a synthetic
    single-lane corpus must match the algebraic sum(t_i c_i) - c_min T
    form, including a single-doc sequence (zero contamination — the
    'acceptable' branch) and a multi-doc one ('needs_doc_mask')."""
    from mysql_streamer_spark.queries import pipeline as P

    # one source; doc_ids multiples of PACK_BUCKETS keep ONE lane (bucket 0)
    sizes = [200, 200, 200, 600, 100, 100, 100, 100, 100]
    rows = [
        (i * P.PACK_BUCKETS, "w " * (sz - 1) + "w", "src0")
        for i, sz in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(P, "load_table", lambda spark, sf_dir, name: df)
    got = {
        r.seq_id: r
        for r in P.q_pipeline_pack_boundary_audit(spark, "ignored").collect()
    }

    # python replay of the packer: exclusive prefix -> seq assignment
    c, packs = 0, {}
    for i, sz in enumerate(sizes):
        packs.setdefault(c // P.PACK_BUDGET_TOKENS, []).append(sz)
        c += sz
    assert set(got) == set(packs)
    for seq_id, ts in packs.items():
        r = got[seq_id]
        T = sum(ts)
        brute = sum(
            ts[j] * sum(ts[:j]) for j in range(len(ts))
        )  # later-doc tokens x earlier-doc tokens
        assert r.n_docs == len(ts)
        assert r.seq_tokens == T
        assert r.n_boundaries == len(ts) - 1
        assert r.contaminated_pairs == brute
        assert r.total_pairs == T * (T - 1) // 2
        assert r.contamination_frac == brute / (T * (T - 1) // 2)
        assert r.verdict == (
            "needs_doc_mask"
            if r.contamination_frac > P.PACK_CONTAM_HI
            else "acceptable"
        )
    verdicts = {r.verdict for r in got.values()}
    assert verdicts == {"acceptable", "needs_doc_mask"}


def test_video_neardup_matches_python_frame_jaccard(spark, monkeypatch):
    """Identical videos pair at jaccard 1.0; a trimmed re-upload pairs at
    its true frame-set overlap; an unrelated video pairs with nothing;
    and the result matches a pure-Python frame-hash Jaccard replay."""
    import hashlib

    from mysql_streamer_spark.multimodal import FRAME_BYTES, FRAME_STRIDE
    from mysql_streamer_spark.queries import multimodal as M

    base = "".join(chr(97 + (i * 7) % 26) for i in range(512))
    trimmed = base[: FRAME_STRIDE * 5]  # keeps the first 5 frames
    other = "".join(chr(97 + (i * 11 + 3) % 26) for i in range(512))
    # doc_id % 3 == 2 marks a doc as video
    docs = [(2, base), (5, base), (8, trimmed), (11, other)]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(M, "load_table", lambda spark, sf_dir, name: df)
    # dim hint reads parquet footers; pin it for the synthetic frame
    from mysql_streamer_spark.queries import dedup as D

    monkeypatch.setattr(D, "_docs_dim_hint", lambda sf_dir: "broadcast")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in M.q_multimodal_video_neardup(spark, "ignored").collect()
    }

    def frames(t):
        return {
            hashlib.md5(t[s : s + FRAME_BYTES].encode()).hexdigest()
            for s in range(0, len(t), FRAME_STRIDE)
        }

    fs = {i: frames(t) for i, t in docs}
    want = {}
    ids = sorted(fs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(fs[a] & fs[b])
            if inter == 0:
                continue
            jac = inter / len(fs[a] | fs[b])
            if jac >= M.VIDEO_JACCARD_T:
                want[(a, b)] = jac
    assert got == want
    assert got[(2, 5)] == 1.0  # exact re-upload
    assert all(11 not in pair for pair in got)  # unrelated video
