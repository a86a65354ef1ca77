#!/bin/bash
# r15 AQE coalescing-floor adjudication (VERDICT item 1): full driver
# methodology (bench.py = cold session, 24 queries, median-of-5) at
# minPartitionSize in {64k, 256k, 1m}, interleaved so box drift cannot
# favor one setting. Outputs to /root/repo/plans/r15/bench_r15_floor_<v>_run<n>.json
set -u
cd /tmp/repo_ab
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
for run in 1 2 3; do
  for v in 1m 256k 64k; do
    out="/root/repo/plans/r15/bench_r15_floor_${v}_run${run}.json"
    if [ -s "$out" ]; then continue; fi
    SPARK_GRAFT_AQE_MIN_PARTITION_SIZE=$v python bench.py > "$out" 2>/tmp/floor_ab_${v}_${run}.err
    echo "done $v run$run: $(python -c "import json;print(json.load(open('$out'))['value'])" 2>/dev/null)"
  done
done
echo ALL_DONE
