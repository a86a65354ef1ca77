"""Simulate the driver's verify pass end-to-end, as an external consumer.

Builds a PLAIN SparkSession (none of our engine's tuned configs — the
driver won't have them either), imports ``__spark_entry__`` exactly as
the driver does, then:
  t1: entry(spark) smoke at sf0.001 → row count + schema
  t2: every queries()[name] at sf0.01 vs oracle_sql()[name] in DuckDB —
      row-count + schema + order-insensitive exact value multiset.

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # Deliberately plain: the driver's session, not ours.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as e
    from tests.oracle_harness import compare_query, duckdb_connection

    t0 = time.time()
    df = e.entry(spark)
    n = df.count()
    print(f"[t1] entry(): {n} rows, schema={df.schema.simpleString()[:120]} "
          f"({time.time() - t0:.1f}s)")
    assert n >= 0

    q = e.queries()
    o = e.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    con = duckdb_connection(args.sf_dir)
    passed = failed = rows_only = 0
    for name, fn in q.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name in o:
                compare_query(spark, con, fn, o[name], args.sf_dir)
                passed += 1
                tag = "MATCH"
            else:
                cnt = fn(spark, args.sf_dir).count()
                rows_only += 1
                tag = f"ROWS-ONLY ({cnt} rows)"
        except Exception as ex:  # noqa: BLE001
            failed += 1
            tag = f"FAIL: {str(ex)[:400]}"
        print(f"[t2] {name}: {tag} ({time.time() - t0:.1f}s)")
    print(f"\n[driver-sim] {passed} matched, {rows_only} rows-only, {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
