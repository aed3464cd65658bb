"""Capture .explain("formatted") for named queries into plan files.

Usage: python tools/capture_plans.py <outdir> <suffix> [sf_dir] <query...>

Writes <outdir>/<query>_<suffix>.txt for each query (e.g. suffix
"before"/"after" for the optimization-round evidence files). Plans are
built against sf_dir (default sf0.1 — the bench scale) so size-dependent
planning (adaptive hints from parquet footers) matches what the bench runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    from mysql_streamer_spark.session import get_spark
    from mysql_streamer_spark.queries import all_specs

    spark = get_spark("capture_plans")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    specs = {s.name: s for s in all_specs()}
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in specs:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = specs[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {ex!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
            )
            if j in plan
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "FlatMapGroupsInPandas", "MapInPandas")
            if p in plan
        ]
        print(f"WROTE {path}  Exchange={n_ex} joins={joins} python={py}")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
