"""General batch analytics surface (SURVEY.md §7 step 5).

TPC-H-style queries plus operator-coverage queries (joins of every
flavor, rollup/cube, window functions, set ops, top-k, scalar function
batteries) over the driver's star schema. All are free Spark built-ins;
the engineering content is the plan shape:

  * dimension joins are broadcast (`F.broadcast`) — at 100 TB the fact
    table never shuffles for a dim join;
  * aggregates go through per-row decimal casts where the oracle
    comparison needs exactness (see registry.py docstring);
  * every query is expressed so Catalyst can push filters/prune columns
    into the parquet scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab04_spark_streaming_spark.functions.guards import exact_avg, sql_exact_avg
from lab04_spark_streaming_spark.sources.files import load_table


def _dec_sum(col, scale: int = 2, alias: str | None = None):
    """Exact cross-engine SUM: per-row cast to decimal (deterministic),
    decimal summation (order-independent), emitted as double."""
    c = F.sum(col.cast(f"decimal(30,{scale})")).cast("double")
    return c.alias(alias) if alias else c


# --- TPC-H Q1: pricing summary report -------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy group-by: filter → 2-key hash agg. At scale this is a
    single shuffle of partial aggregates (4 groups); the shipdate filter
    and 7-column projection push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    # Per-row arithmetic in double is bit-identical across engines; the
    # per-row decimal cast then makes the SUM order-independent/exact.
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-06-30"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), 2, "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), 2, "sum_base_price"),
            _dec_sum(disc_price, 6, "sum_disc_price"),
            _dec_sum(charge, 6, "sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                     AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
       {sql_exact_avg("l_quantity")} AS avg_qty,
       {sql_exact_avg("l_extendedprice")} AS avg_price,
       {sql_exact_avg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-06-30'
GROUP BY l_returnflag, l_linestatus
"""


def specs():
    from lab04_spark_streaming_spark.registry import QuerySpec

    return [
        QuerySpec("q1_pricing_summary", q1_pricing_summary, SQL_Q1),
    ]
