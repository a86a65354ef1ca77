"""Optimization-round measurement harness (guide §1).

For each named query this captures:
  * ``.explain("formatted")`` text -> plans/r15/<name>_<tag>.txt
    (override the directory with $OPT_PLANS_DIR)
    (Exchange count / join strategy / PushedFilters / Python-eval nodes
    are what the judge audits; AQE initial plan, as produced pre-run)
  * optional noop-sink timings (guide §1.4: computes every column of
    every row, no driver transfer, no optimizer pruning of subtrees)
    with ``setJobDescription`` labels (guide §1.5).

Usage:
  python scripts/opt_measure.py --tag before [--names a,b,c] [--runs 3]
  python scripts/opt_measure.py --tag before --plans-only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.environ.get(
    "OPT_PLANS_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    ),
)


def explain_formatted(df) -> str:
    """Return explain("formatted") as a string (what df.explain prints)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_stats(plan: str) -> dict:
    import re

    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "python": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas", plan)
        ),
        "sorts": len(re.findall(r"\bSort\b", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--names", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--sink", choices=["noop", "count"], default="noop")
    args = ap.parse_args()

    import bench
    from lab04_spark_streaming_spark.operators.similarity import (
        cosine_topk_vs_id_fold,
    )
    from lab04_spark_streaming_spark.registry import queries
    from lab04_spark_streaming_spark.session import get_spark
    from lab04_spark_streaming_spark.sources.files import load_table

    names = [n for n in args.names.split(",") if n] or list(bench.HEADLINE)
    q = queries()
    q["knn_cosine_topk"] = lambda spark, sf: cosine_topk_vs_id_fold(
        load_table(spark, sf, "embeddings"), query_id=0, k=10
    )

    spark = get_spark(app_name="opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLANS_DIR, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        df = q[name](spark, SF_DIR)
        plan = explain_formatted(df)
        with open(os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(plan)
        rec: dict = {"plan": plan_stats(plan)}
        if not args.plans_only:
            ts = []
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"{name} {args.tag} run{i}")
                # Construction INSIDE the timed region: eager localCheckpoint
                # pins materialize at build time, and the bench times them.
                t0 = time.time()
                df = q[name](spark, SF_DIR)
                if args.sink == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            rec["runs"] = ts
            rec["median"] = sorted(ts)[len(ts) // 2]
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    if not args.plans_only:
        total = round(sum(r["median"] for r in out.values()), 3)
        print(json.dumps({"total_median": total, "sink": args.sink}))


if __name__ == "__main__":
    main()
