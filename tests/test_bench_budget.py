"""The bench-budget gate (bench.family_budget_flags): per-family wall
growth >25% AND >2s over the common query subset flags; new queries and
noise-scale deltas do not."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import family_budget_flags, query_budget_flags


def test_flags_genuine_family_regression():
    prev = {"dedup_a": 3.0, "dedup_b": 5.0, "cdc_x": 2.0}
    cur = {"dedup_a": 6.0, "dedup_b": 7.0, "cdc_x": 2.1}
    flags = family_budget_flags(prev, cur)
    assert [f["family"] for f in flags] == ["dedup"]
    assert flags[0]["prev_sec"] == 8.0 and flags[0]["cur_sec"] == 13.0


def test_new_queries_never_explain_or_trip_the_gate():
    # a NEW expensive dedup query must not flag the family (excluded from
    # both sides), and must not mask a real regression either
    prev = {"dedup_a": 3.0}
    cur = {"dedup_a": 3.1, "dedup_new": 50.0}
    assert family_budget_flags(prev, cur) == []
    cur_regressed = {"dedup_a": 6.0, "dedup_new": 0.1}
    assert [f["family"] for f in family_budget_flags(prev, cur_regressed)] == [
        "dedup"
    ]


def test_subsecond_noise_does_not_flag():
    # 3x growth but only +1s absolute: host-noise scale, not a budget signal
    prev = {"sketch_a": 0.5}
    cur = {"sketch_a": 1.5}
    assert family_budget_flags(prev, cur) == []


def test_removed_queries_do_not_count():
    prev = {"text_a": 10.0, "text_b": 1.0}
    cur = {"text_b": 1.0}
    assert family_budget_flags(prev, cur) == []


def test_per_query_flag_catches_what_family_gate_masks():
    # the r6->r7 shape: one dedup query +49% while siblings improve keeps
    # the FAMILY total inside budget — the per-query rule must still flag
    prev = {"dedup_clusters": 4.05, "dedup_pairs": 10.0, "dedup_exact": 8.0}
    cur = {"dedup_clusters": 6.4, "dedup_pairs": 9.0, "dedup_exact": 7.5}
    assert family_budget_flags(prev, cur) == []
    flags = query_budget_flags(prev, cur)
    assert [f["query"] for f in flags] == ["dedup_clusters"]
    assert flags[0]["prev_sec"] == 4.05 and flags[0]["cur_sec"] == 6.4


def test_per_query_flag_needs_factor_and_absolute_delta():
    # +2s on a 10s query (<1.5x) and 2x on a 1s query (<1.5s) are both
    # below the line; only the joint condition flags
    prev = {"a_big": 10.0, "b_small": 1.0, "c_real": 3.0}
    cur = {"a_big": 12.0, "b_small": 2.0, "c_real": 5.0}
    assert [f["query"] for f in query_budget_flags(prev, cur)] == ["c_real"]


def test_per_query_flag_ignores_new_and_removed_queries():
    prev = {"a": 1.0, "gone": 20.0}
    cur = {"a": 1.0, "brand_new": 30.0}
    assert query_budget_flags(prev, cur) == []
