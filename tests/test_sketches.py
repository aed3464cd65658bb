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


def test_theta_diff_algebra_closes_and_bounds_hold(spark, sf_dir):
    """Theta set algebra: the combined-theta samples PARTITION the union
    sample exactly (inter + diff_ab + diff_ba == union), so estimates are
    additive by construction, and every estimate sits within 5 standard
    errors of its exact counterpart at fixture scale."""
    from mysql_streamer_spark.queries.sketches import q_sketch_theta_diff

    rows = q_sketch_theta_diff(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    for r in rows:
        assert r.additive, (r.ta, r.tb)
        assert r.within_union and r.within_inter and r.within_diff_ab
        # estimator additivity is exact, not approximate: one shared theta
        assert abs(r.est_inter + r.est_diff_ab + r.est_diff_ba - r.est_union) < 1e-9
        # difference identities against the exact audit columns
        assert r.exact_diff_ab + r.exact_inter <= r.exact_union
        assert 0.0 < r.theta_frac <= 1.0


def test_theta_diff_unsaturated_sets_are_exact(spark, monkeypatch):
    """A set smaller than k keeps theta = full hash space (sampling rate
    1.0), so every estimate over unsaturated sets is EXACT — the
    degenerate branch both engines must take identically. Forced by
    raising k above any fixture set size."""
    from mysql_streamer_spark.queries import sketches as sk

    monkeypatch.setattr(sk, "KMV_K", 10_000_000)
    rows = sk.q_sketch_theta_diff(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    for r in rows:
        assert r.theta_frac == 1.0, (r.ta, r.tb)
        assert r.est_union == float(r.exact_union)
        assert r.est_inter == float(r.exact_inter)
        assert r.est_diff_ab == float(r.exact_diff_ab)
        assert r.est_diff_ba == float(r.exact_diff_ba)


def test_moments_bound_matches_python_and_theorem(spark, monkeypatch):
    """The centi-quantized sketch state recomputes exactly in Python; the
    merged (per-type partials summed) sketch equals the direct one; the
    Cantelli bound recomputes bit-for-bit; and the bound provably holds
    against the exact tail count at every threshold (Cantelli is
    distribution-free, so it must hold for the empirical distribution)."""
    import math

    from mysql_streamer_spark.queries import sketches as S

    vals = [(i % 3, 0.01 * ((i * 37) % 56000)) for i in range(1, 400)]
    df = spark.createDataFrame(
        [(f"t{t}", v) for t, v in vals], "event_type string, value double"
    )
    monkeypatch.setattr(S, "load_table", lambda spark, sf_dir, name: df)
    rows = {
        r.threshold_centi: r
        for r in S.q_sketch_moments_bound(spark, "ignored").collect()
    }
    assert set(rows) == set(S.MOMENTS_THRESHOLDS)

    q = [math.floor(v * 100.0) for _, v in vals]
    n, s1, s2 = len(q), sum(q), sum(x * x for x in q)
    mean = s1 / n
    var = s2 / n - mean * mean
    for t, r in rows.items():
        assert (r.n, r.s1, r.s2) == (n, s1, s2)
        assert r.merge_matches
        assert r.mean_centi == mean
        assert r.var_centi2 == var
        d = float(t) - mean
        assert r.cantelli_bound == n * var / (var + d * d)
        assert r.exact_count == sum(1 for x in q if x >= t)
        assert r.bound_holds  # the theorem, checked empirically
    # the bound tightens as the threshold moves further past the mean
    bounds = [rows[t].cantelli_bound for t in sorted(rows)]
    assert bounds == sorted(bounds, reverse=True)


def test_hll_rolling_windows_cover_trailing_days(spark, sf_dir):
    """Every day's window holds min(HLL_ROLL_DAYS, days-so-far) days, the
    rolling exact counts are >= the single-day exacts and monotone vs the
    window content, and every rolling estimate lands in-bound."""
    from mysql_streamer_spark.queries.sketches import (
        HLL_ROLL_DAYS,
        q_sketch_hll_rolling,
    )
    from mysql_streamer_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = sorted(
        q_sketch_hll_rolling(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("daily"))
        .collect()
    )
    daily = {r.day: r.daily for r in ev}
    days = sorted(daily)
    for i, r in enumerate(rows):
        assert r.day == days[i]
        assert r.n_days_in_window == min(HLL_ROLL_DAYS, i + 1)
        assert r.exact_rolling >= daily[r.day]
        assert r.exact_rolling <= sum(
            daily[d] for d in days[max(0, i - HLL_ROLL_DAYS + 1) : i + 1]
        )
        assert r.rolling_within_bound


# ---------------------------------------------------------------------------
# t-digest kernel (round-10 continuation)
# ---------------------------------------------------------------------------


def _td_build_merged(chunks, delta):
    import numpy as np

    from mysql_streamer_spark.queries.sketches import _td_compress

    m = np.empty(0)
    w = np.empty(0)
    for c in chunks:
        c = np.sort(np.asarray(c, dtype=float))
        bm, bw = _td_compress(c, np.ones(len(c)), delta)
        order = np.argsort(np.concatenate([m, bm]), kind="stable")
        m = np.concatenate([m, bm])[order]
        w = np.concatenate([w, bw])[order]
        m, w = _td_compress(m, w, delta)
    return m, w


def test_tdigest_rank_error_across_distributions():
    """The cap-derived rank-error claim the registered query's band flag
    rests on, checked against adversarial shapes: uniform, heavy-tailed
    lognormal, bimodal, and highly-duplicated integer data."""
    import numpy as np

    from mysql_streamer_spark.queries.sketches import (
        PCT_POINTS,
        TDIGEST_DELTA,
        _td_quantile,
    )

    rng = np.random.RandomState(7)
    datasets = [
        rng.uniform(size=20000),
        rng.lognormal(0, 2.0, size=20000),
        np.concatenate([rng.normal(-5, 0.1, 10000), rng.normal(5, 0.1, 10000)]),
        rng.randint(0, 50, size=20000).astype(float),
    ]
    for data in datasets:
        m, w = _td_build_merged(np.array_split(data, 8), TDIGEST_DELTA)
        assert abs(w.sum() - len(data)) < 1e-6  # weight conserved
        assert (np.diff(m) >= 0).all()  # centroids stay sorted
        s = np.sort(data)
        for p in PCT_POINTS:
            est = _td_quantile(m, w, p)
            # the estimate's true RANK INTERVAL (tie-proof) must
            # intersect p +/- band — the registered query's flag rule
            rlo = np.searchsorted(s, est, side="left") / len(s)
            rhi = np.searchsorted(s, est, side="right") / len(s)
            band = 2.0 * (4.0 * p * (1.0 - p) / TDIGEST_DELTA) + 1e-3
            assert rlo <= p + band and rhi >= p - band, (p, rlo, rhi, band)


def test_tdigest_degenerate_inputs():
    """Constant data collapses to one centroid; tiny inputs are exact."""
    import numpy as np

    from mysql_streamer_spark.queries.sketches import (
        TDIGEST_DELTA,
        _td_compress,
        _td_quantile,
    )

    m, w = _td_compress(np.full(1000, 42.0), np.ones(1000), TDIGEST_DELTA)
    assert _td_quantile(m, w, 0.5) == 42.0
    vals = np.array([1.0, 2.0, 3.0])
    m, w = _td_compress(vals, np.ones(3), TDIGEST_DELTA)
    assert w.sum() == 3
    assert _td_quantile(m, w, 0.0) == 1.0 and _td_quantile(m, w, 1.0) == 3.0


def test_tdigest_quantile_monotone():
    import numpy as np

    from mysql_streamer_spark.queries.sketches import (
        TDIGEST_DELTA,
        _td_quantile,
    )

    rng = np.random.RandomState(3)
    m, w = _td_build_merged([rng.exponential(size=30000)], TDIGEST_DELTA)
    qs = np.linspace(0, 1, 101)
    ests = [_td_quantile(m, w, q) for q in qs]
    assert all(a <= b + 1e-12 for a, b in zip(ests, ests[1:]))
