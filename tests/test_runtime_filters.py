"""Runtime-filter audits: dynamic partition pruning and runtime
Bloom-filter join pruning — the two Catalyst features that, at 100 TB,
turn a star join's fact scan from "read everything, filter at the
join" into "read only what can match". Declarative plans get them for
free; these tests pin that our layouts/joins actually trigger them
(and that results are unchanged).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lab04_spark_streaming_spark.sources.files import load_table
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def month_partitioned(spark, sf_dir, tmp_path_factory):
    """lineitem re-laid-out partitioned by ship month (the
    write_partitioned layout), plus a month-dim with a non-key
    attribute — the classic date-dim star shape."""
    d = tmp_path_factory.mktemp("dpp")
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_mon", F.date_format("l_shipdate", "yyyy-MM")
    )
    li.write.partitionBy("ship_mon").parquet(str(d / "fact"))
    dim = (
        li.select("ship_mon")
        .distinct()
        .withColumn(
            "quarter",
            F.expr(
                "concat(substring(ship_mon,1,4), '-Q', "
                "cast((cast(substring(ship_mon,6,2) as int)+2) div 3 as string))"
            ),
        )
    )
    dim.write.parquet(str(d / "dim"))
    return str(d)


def test_dynamic_partition_pruning_triggers(spark, month_partitioned):
    """A quarter filter on the DIM (not the join key — a join-key
    filter would constraint-propagate into a static PartitionFilter)
    must reach the fact scan as a dynamicpruning PartitionFilter: at
    100 TB this is the difference between scanning 3 months and
    scanning the whole table."""
    fact = spark.read.parquet(month_partitioned + "/fact")
    dim = spark.read.parquet(month_partitioned + "/dim").filter(
        F.col("quarter") == "1995-Q2"
    )
    j = fact.join(dim, "ship_mon").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = plan_of(j)
    assert "dynamicpruning" in plan.lower()
    # semantics unchanged vs an explicit static month filter
    months = [r["ship_mon"] for r in dim.select("ship_mon").collect()]
    expected = (
        spark.read.parquet(month_partitioned + "/fact")
        .filter(F.col("ship_mon").isin(months))
        .agg(F.sum("l_quantity").alias("q"))
        .collect()[0]["q"]
    )
    assert j.collect()[0]["q"] == expected


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """When the big side of a shuffle join is too large to broadcast
    the small side's keys exactly, Spark can still inject a Bloom
    filter built from the selective side and apply it BEFORE the big
    side's shuffle — rows that cannot match never leave the scan
    stage. Verified: might_contain/bloom_filter_agg in the plan, and
    identical results with the feature off. (Thresholds are lowered
    because the local fixture is far below the 10 GB application-side
    default; the conf is the same lever a 100 TB deployment tunes.)"""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sel = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey", "o_totalprice")
        )
        big = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        j = big.join(sel, "o_orderkey")
        plan = plan_of(j)
        assert "bloom_filter_agg" in plan and "might_contain" in plan
        with_bloom = j.count()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # feature back at defaults (broadcast join, no bloom): same rows
    sel = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice")
    )
    big = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    assert big.join(sel, "o_orderkey").count() == with_bloom
