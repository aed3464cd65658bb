"""Property test for the UniMax waterfill FORMULA (no Spark): the
closed-form used by both engines (saturation prefix + integer even-split,
mirroring q_pipeline_unimax_budget / its oracle SQL) must equal a greedy
sequential waterfill for arbitrary language sizes and budgets."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def closed_form(caps: list[int], budget: int) -> list[int]:
    """EXACTLY the SQL: sort by cap asc; saturated prefix while
    cap_i*(L-i)+cumsum_i <= B (monotone-guarded); remainder splits
    integer-evenly over the unsaturated tail, +1 to the first `rem`."""
    order = sorted(range(len(caps)), key=lambda i: (caps[i], i))
    L = len(caps)
    alloc = [0] * len(caps)
    cumsum = 0
    saturated = []
    prefix_ok = True
    flags = []
    for rk, i in enumerate(order, start=1):
        cumsum += caps[i]
        ok = caps[i] * (L - rk) + cumsum <= budget
        prefix_ok = prefix_ok and ok
        flags.append(prefix_ok)
        if prefix_ok:
            saturated.append(i)
    k = len(saturated)
    sat_tokens = sum(caps[i] for i in saturated)
    for i in saturated:
        alloc[i] = caps[i]
    n_unsat = L - k
    if n_unsat:
        leftover = budget - sat_tokens
        base, rem = divmod(leftover, n_unsat)
        for j, i in enumerate(order[k:], start=1):
            alloc[i] = base + (1 if j <= rem else 0)
    return alloc


def greedy(caps: list[int], budget: int) -> list[int]:
    """The definitional algorithm: repeatedly give every unsaturated
    language an equal share until shares stop changing."""
    order = sorted(range(len(caps)), key=lambda i: (caps[i], i))
    alloc = [0] * len(caps)
    remaining = budget
    pending = list(order)
    while pending:
        share = remaining // len(pending)
        filled = [i for i in pending if caps[i] <= share]
        if not filled:
            # nobody saturates: split evenly, remainder by rank order
            rem = remaining - share * len(pending)
            for j, i in enumerate(pending, start=1):
                alloc[i] = share + (1 if j <= rem else 0)
            return alloc
        for i in filled:
            alloc[i] = caps[i]
            remaining -= caps[i]
        pending = [i for i in pending if i not in filled]
    return alloc


@settings(max_examples=500, deadline=None)
@given(
    caps=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=12),
    frac=st.integers(min_value=0, max_value=120),
)
def test_closed_form_equals_greedy(caps, frac):
    budget = sum(caps) * frac // 100  # 0%..120% of total capacity
    budget = min(budget, sum(caps))  # allocation cannot exceed capacity
    a = closed_form(caps, budget)
    b = greedy(caps, budget)
    assert a == b
    assert sum(a) == min(budget, sum(caps))
    assert all(0 <= x <= c for x, c in zip(a, caps))
