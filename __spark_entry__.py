"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``lab04_spark_streaming_spark.registry``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module from any cwd — anchor the package
# path to this file's directory.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from lab04_spark_streaming_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full stage-2 pipeline shape (6 sliding windows of
    guarded avg/stddev, nested to the reference's wire schema) over the
    events table at sf0.001.

    Served via the single-shuffle explode(sequence) variant rather than
    the built-in window() union: the 1h/10s window()'s 360-way Expand
    exceeds janino's 64 KB method limit and silently falls back to
    interpreted evaluation (observed in round-9 driver logs), while the
    Generate-based plan stays inside whole-stage codegen with
    bit-identical output (tests/test_plans.py
    ::test_moving_stats_exploded_variant_agrees)."""
    from lab04_spark_streaming_spark.operators.moving_stats import (
        moving_stats_exploded,
        nest_window_stats,
    )
    from lab04_spark_streaming_spark.sources.files import load_table

    events = load_table(spark, SMOKE_SF_DIR, "events")
    flat = moving_stats_exploded(events, "ts", ["event_type"], "value")
    return nest_window_stats(flat, ["event_type"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
