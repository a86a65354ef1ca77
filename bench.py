"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() forces the full plan —
aggregations/joins can't be pruned away) but results are not collected
to the driver, so this measures engine throughput, not py4j transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-agg, star join, sliding-window agg (short + long),
# as-of join, nested+JSON encode, sessionization, range join, MinHash
# LSH dedup, vector top-k. Names match registry entries.
HEADLINE = [
    "q1_pricing_summary",
    "q5_local_supplier",
    "moving_stats_flat",
    "moving_stats_long_windows",
    "zscore_asof_join",
    "moving_stats_nested_json",
    "sessionize_gap30m",
    "first_crossing_higher",
    "dedup_minhash_lsh_pairs",
    "knn_cosine_topk",
    # r6: the two most expensive registered plans get perf tracking too
    # (distributed Lloyd k-means; k-means cells -> within-cell cosine
    # pairs -> connected components -> keep-best representative).
    # r11: semdedup's cell count now scales with the corpus (k=ceil√n,
    # 45 cells at sf0.1 vs the old pinned 8), so this times the same
    # configuration the scale probe grades.
    "kmeans_clusters",
    "semdedup_keep_best",
    # r6: residual IVF-PQ — the two-level trained ANN index end to end.
    "ann_ivfpq_topk",
    # r6 mining wave: the exact set-similarity join (prefix filter +
    # verify — the non-probabilistic dedup flagship) and the SCD-2
    # interval build (events-scale gaps-and-islands, one exchange).
    "jaccard_prefix_join",
    "scd2_intervals",
    # r7 drift wave: full-corpus tokenize + double aggregation (KL) and
    # the basket self-join (pair fan-out + marginals + top-k).
    "source_kl_divergence",
    "copurchase_lift",
    # r8 wave: the df-prefiltered document pair walk (PMI) and the
    # boundary-replicated day-partitioned concurrency windows.
    "pmi_word_pairs",
    "concurrent_active_30m",
    # r9 wave: compact-forward triangle census (the heaviest graph
    # plan), the ×100 map-side replicate fan-out (Poisson bootstrap),
    # and the iterative farthest-point sweep (k-center coreset).
    "triangle_count",
    "poisson_bootstrap",
    "kcenter_coreset",
    # r9 wave: the RFF feature-map two-sample statistic (explode ×
    # broadcast-weights join over every embedding component) and the
    # per-series Arrow recursion over the hourly relation.
    "mmd_rff",
    "holt_backtest",
]


def main() -> None:
    from lab04_spark_streaming_spark.operators.similarity import (
        cosine_topk_vs_id_fold,
    )
    from lab04_spark_streaming_spark.registry import queries
    from lab04_spark_streaming_spark.session import get_spark
    from lab04_spark_streaming_spark.sources.files import load_table

    spark = get_spark(app_name="lab04-bench")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()
    # Bench measures the PRODUCTION paths. knn's registry entry is the
    # integer-quantized posexplode anchor (kept for the cross-engine
    # oracle); users run the zero-shuffle zip_with fold, so that is what
    # gets timed (ids identical, asserted in tests/test_plans.py).
    q["knn_cosine_topk"] = lambda spark, sf: cosine_topk_vs_id_fold(
        load_table(spark, sf, "embeddings"), query_id=0, k=10
    )

    # Warm the JVM/codegen once (not measured): a trivial scan-agg.
    q["q1_pricing_summary"](spark, SF_DIR).count()

    # Median of 5 runs per query: run-to-run noise at sf0.1 is ±15-25%
    # (codegen/GC — whole-session totals were observed to swing 15.3 →
    # 20.8 s with zero code change), and the first run per query carries
    # one-time codegen that a 3-run median still half-samples. Five runs
    # put the median safely in steady state while keeping the whole
    # bench under ~3 minutes.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(runs):
        for name in HEADLINE:
            t0 = time.time()
            q[name](spark, SF_DIR).count()
            samples[name].append(time.time() - t0)

    timings = {
        name: round(sorted(ts)[len(ts) // 2], 3) for name, ts in samples.items()
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "runs_per_query": runs,
        "aggregation": "median",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
