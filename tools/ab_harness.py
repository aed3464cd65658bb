"""Steal-aware in-session A/B harness (guide §1 + the measurement
discipline this box demands: multi-minute CPU-steal bursts invalidate
cross-session single numbers).

Usage from a probe script:

    from tools.ab_harness import ab
    ab(spark, {"v0": build_v0, "v1": build_v1}, rounds=4)

Each builder returns (df, persisted_or_None). Variants alternate
rep-by-rep; each rep records wall seconds AND the steal%% over the rep, so
a burst is visible in the output instead of silently poisoning a min.
"""

from __future__ import annotations

import time


def _cpu_snap() -> list[int]:
    return [int(x) for x in open("/proc/stat").readline().split()[1:]]


def steal_pct(a: list[int], b: list[int]) -> float:
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return round(100.0 * d[7] / tot, 1)


def ab(spark, variants: dict, rounds: int = 4, quiet_steal: float = 3.0):
    """Alternate variants rep-by-rep; print per-rep (sec, steal%); report
    min over QUIET reps per variant (falls back to overall min if no rep
    was quiet)."""
    results = {k: [] for k in variants}
    for rnd in range(rounds):
        for tag, fn in variants.items():
            out = fn()
            df, persisted = out if isinstance(out, tuple) else (out, None)
            s0 = _cpu_snap()
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            st = steal_pct(s0, _cpu_snap())
            results[tag].append((dt, st))
            print(f"  round{rnd} {tag}: {dt:.2f}s steal={st}%", flush=True)
            if persisted is not None:
                persisted.unpersist()
            spark.catalog.clearCache()
    print("== summary (min over quiet reps) ==", flush=True)
    for tag, reps in results.items():
        quiet = [d for d, s in reps if s <= quiet_steal]
        pool = quiet if quiet else [d for d, _ in reps]
        print(
            f"  {tag}: min={min(pool):.2f}s  (quiet reps {len(quiet)}/{len(reps)})",
            flush=True,
        )
    return results
