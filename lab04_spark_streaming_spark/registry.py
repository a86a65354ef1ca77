"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Each :class:`QuerySpec` pairs a PySpark query (``fn(spark, sf_dir) ->
DataFrame``) with its DuckDB oracle SQL (or ``None`` for genuinely
non-SQL-expressible operators → the driver records a rows-only check).

Cross-engine determinism rules (every query here follows them):
  * Alias every computed column identically in Spark and SQL.
  * Money-style SUMs go through ``decimal`` per-row casts so the
    aggregate is exact and bit-identical across engines (summation
    order of doubles is non-deterministic in both engines).
  * AVG/STDDEV outputs are ``round(x, 4)`` in both engines — per-row
    IEEE arithmetic is bit-identical; only the aggregation-order error
    (~1e-12 relative) differs, far below the rounding grain.
  * Timestamps stay on whole-second grids or are emitted as-is (both
    engines render microsecond-precision naive UTC timestamps).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from lab04_spark_streaming_spark.plans import analytics, llm, reference_parity, tpch_full


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check


def all_specs() -> list[QuerySpec]:
    specs: list[QuerySpec] = []
    specs += reference_parity.specs()
    specs += analytics.specs()
    specs += tpch_full.specs()
    specs += llm.specs()
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.sql for s in all_specs() if s.sql is not None}
