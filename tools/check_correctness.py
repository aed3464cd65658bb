"""Local stand-in for the driver's t2 harness: run every queries() entry on
Spark and its oracle_sql() on DuckDB at a given sf, compare row-count,
column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(rows, colnames):
    out = []
    for row in rows:
        vals = []
        for name in sorted(colnames):
            v = row[name]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entrymod
    from mysql_streamer_spark.session import get_spark
    from mysql_streamer_spark.tables import TABLE_NAMES, table_path

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spark_rows = [r.asDict() for r in sdf.collect()]
        spark_cols = sdf.columns
        spark.catalog.clearCache()  # drop per-query persisted intermediates
        dt = time.time() - t0
        if name not in oracles:
            print(f"  {name:32s} rows={len(spark_rows):7d}  (rows-only, no oracle)  {dt:.1f}s")
            continue
        rel = con.execute(oracles[name])
        duck_cols = [d[0] for d in rel.description]
        duck_rows = [dict(zip(duck_cols, row)) for row in rel.fetchall()]

        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            ok = False
        elif len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            ok = False
        else:
            a = normalize(spark_rows, spark_cols)
            b = normalize(duck_rows, duck_cols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                print(f"FAIL {name}: value mismatch; first diffs:")
                for x, y in diffs:
                    print(f"    spark: {x}")
                    print(f"    duck : {y}")
                ok = False
        if ok:
            print(f"  OK {name:32s} rows={len(spark_rows):7d}  {dt:.1f}s")
        else:
            n_fail += 1
    print("ALL OK" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
