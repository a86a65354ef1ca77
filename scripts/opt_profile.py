"""Per-stage empirical profile of one or more queries (guide §1.1/§7.1).

Runs each named query (bench methodology: construction + count inside
the timed region) in a session with the UI enabled, then reads the UI
REST API for per-stage wall/executor time, shuffle bytes, and task
counts.  Stages are attributed to queries via setJobDescription.

Usage: python scripts/opt_profile.py --names zscore_asof_join [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=14)
    args = ap.parse_args()

    import bench
    from lab04_spark_streaming_spark.operators.similarity import (
        cosine_topk_vs_id_fold,
    )
    from lab04_spark_streaming_spark.registry import queries
    from lab04_spark_streaming_spark.session import get_spark
    from lab04_spark_streaming_spark.sources.files import load_table

    q = queries()
    q["knn_cosine_topk"] = lambda spark, sf: cosine_topk_vs_id_fold(
        load_table(spark, sf, "embeddings"), query_id=0, k=10
    )
    names = [n for n in args.names.split(",") if n] or list(bench.HEADLINE)

    spark = get_spark(
        app_name="opt-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    for name in names:
        # warm run (codegen), then measured runs
        for i in range(args.runs + 1):
            tag = "warm" if i == 0 else f"run{i}"
            spark.sparkContext.setJobDescription(f"PROF|{name}|{tag}")
            t0 = time.time()
            q[name](spark, SF_DIR).count()
            print(json.dumps({name: {tag: round(time.time() - t0, 3)}}), flush=True)
        spark.sparkContext.setJobDescription(None)

    # Pull stage attribution: jobs carry the description; map job->stages.
    def get(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    jobs = get("/jobs?status=succeeded")
    stage_owner: dict[int, str] = {}
    for j in jobs:
        desc = j.get("description", "") or ""
        if desc.startswith("PROF|"):
            _, qname, tag = desc.split("|", 2)
            if tag == "run1":
                for sid in j.get("stageIds", []):
                    stage_owner[sid] = qname

    stages = get("/stages?status=complete")
    rows = []
    for s in stages:
        sid = s["stageId"]
        if sid not in stage_owner:
            continue
        rows.append(
            {
                "q": stage_owner[sid],
                "stage": sid,
                "name": s["name"].split("\n")[0][:70],
                "wall_ms": None,
                "exec_ms": s.get("executorRunTime"),
                "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                "tasks": s.get("numCompleteTasks"),
                "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 2),
                "sh_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 2),
                "in_mb": round((s.get("inputBytes") or 0) / 1e6, 2),
                "submit": s.get("submissionTime"),
                "complete": s.get("completionTime"),
            }
        )
    # wall per stage from submission->completion
    from datetime import datetime

    def ts(x):
        return (
            datetime.strptime(x.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            if x
            else None
        )

    for r in rows:
        a, b = ts(r.pop("submit")), ts(r.pop("complete"))
        r["wall_ms"] = int((b - a).total_seconds() * 1000) if a and b else None

    for name in names:
        mine = sorted(
            (r for r in rows if r["q"] == name),
            key=lambda r: -(r["wall_ms"] or 0),
        )
        print(f"\n=== {name}: {len(mine)} stages (run1), top {args.top} by wall ===")
        for r in mine[: args.top]:
            print(
                f"  wall={r['wall_ms']:>6}ms exec={r['exec_ms']:>6}ms "
                f"cpu={r['cpu_ms']:>6}ms tasks={r['tasks']:>3} "
                f"shR={r['sh_read_mb']:>7}MB shW={r['sh_write_mb']:>7}MB "
                f"in={r['in_mb']:>6}MB  {r['name']}"
            )
        tot_wall = sum(r["wall_ms"] or 0 for r in mine)
        tot_exec = sum(r["exec_ms"] or 0 for r in mine)
        print(f"  TOTAL stage-wall={tot_wall}ms exec={tot_exec}ms")


if __name__ == "__main__":
    main()
