"""Full-registry timing sweep: run EVERY registered query once at
$SPARK_GRAFT_SF_DIR (default sf0.1) and report per-query seconds,
slowest-first — the landmine detector the bench headline can't be
(r7 found five single-split replays this way; r8 found two more).

Usage: python scripts/sweep.py [--budget-s 520] [--top 15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=520.0)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lab04_spark_streaming_spark.registry import all_specs

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, object] = {}
    t_all = time.time()
    for s in all_specs():
        t0 = time.time()
        try:
            s.fn(spark, SF_DIR).count()
            times[s.name] = round(time.time() - t0, 2)
        except Exception as ex:  # noqa: BLE001 — sweep must finish
            times[s.name] = f"ERR {str(ex)[:120]}"
        if time.time() - t_all > args.budget_s:
            print(f"[sweep] time budget hit at {s.name}", file=sys.stderr)
            break
    total = round(time.time() - t_all, 1)
    slow = sorted(
        ((v, k) for k, v in times.items() if isinstance(v, float)),
        reverse=True,
    )[: args.top]
    errs = {k: v for k, v in times.items() if isinstance(v, str)}
    print(f"[sweep] total {total}s over {len(times)} queries, sf_dir={SF_DIR}")
    for v, k in slow:
        print(f"  {k}: {v}s")
    if errs:
        print(f"[sweep] ERRORS: {errs}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"total_s": total, "times": times}, f, indent=1)
    spark.stop()
    sys.exit(1 if errs else 0)


if __name__ == "__main__":
    main()
