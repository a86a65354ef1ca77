"""r15 VERDICT item 6: root-cause ann_ivfpq_topk's 4.2-5.6 s variance
band. Runs the query N times in one session (bench methodology), times
each run, and captures the POST-EXECUTION adaptive plan per run so a
run-to-run join-strategy flip (AQE) would show up as a plan diff.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab04_spark_streaming_spark.registry import queries
from lab04_spark_streaming_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("ANN_VAR_OUT", "/root/repo/plans/r15")
RUNS = int(os.environ.get("ANN_VAR_RUNS", "6"))


def main() -> None:
    spark = get_spark(app_name="ann-var-r15")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()["ann_ivfpq_topk"]
    # warm codegen once with a different query so run 1 is comparable
    queries()["q1_pricing_summary"](spark, SF_DIR).count()
    times = []
    for i in range(RUNS):
        spark.sparkContext.setJobDescription(f"ann_var run {i}")
        t0 = time.time()
        df = q(spark, SF_DIR)
        t1 = time.time()
        df.count()
        dt = time.time() - t1
        times.append({"construct": round(t1 - t0, 3), "count": round(dt, 3)})
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{OUT_DIR}/ann_var_run{i}_plan.txt", "w") as f:
            f.write(f"run {i}: {dt:.3f}s\n\n{plan}")
    print(json.dumps({"runs": times}))


if __name__ == "__main__":
    main()
