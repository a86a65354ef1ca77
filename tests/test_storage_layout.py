"""Storage-layout scale levers: partition pruning and bucketed
shuffle-free joins, asserted at the physical-plan level."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab04_spark_streaming_spark.sources.files import (
    load_table,
    write_bucketed,
    write_partitioned,
)
from tests.test_plans import plan_of


def test_partition_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["day"])

    df = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "2024-01-02" in plan
    # the data filter did NOT become a row-level PushedFilter — it was
    # resolved by directory pruning
    n_days = df.select("day").distinct().count()
    assert n_days <= 1


def test_bucketed_join_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # saveAsTable refuses a leftover warehouse dir from a prior session
    # (table gone from the in-memory catalog, location still on disk).
    import shutil

    for t in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    write_bucketed(li, "li_b", "l_orderkey", 8, sort_col="l_orderkey")
    write_bucketed(orders, "ord_b", "o_orderkey", 8, sort_col="o_orderkey")
    a = spark.table("li_b")
    b = spark.table("ord_b")
    joined = a.join(b, a["l_orderkey"] == b["o_orderkey"])
    # At fixture scale the planner prefers broadcast (bucketing
    # "disabled by query planner") — disable auto-broadcast to expose
    # the bucketed path a 100 TB fact-fact join would take.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(joined)
        # Both sides pre-bucketed on the join key: a sort-merge join
        # with NO shuffle exchange on either side.
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "ShuffleExchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_star_table_schema_contract(spark, sf_dir):
    """Every star table's post-load schema equals the documented
    contract (schemas.STAR_TABLE_CONTRACT). One testdata-regeneration
    encoding drift → one focused failure here, not 18 downstream hash
    mismatches (VERDICT r5 item 5)."""
    from lab04_spark_streaming_spark.schemas import (
        STAR_TABLE_CONTRACT,
        STAR_TABLES,
    )

    assert set(STAR_TABLE_CONTRACT) == set(STAR_TABLES)
    for name in STAR_TABLES:
        df = load_table(spark, sf_dir, name)
        got = tuple((f.name, f.dataType.simpleString()) for f in df.schema.fields)
        assert got == STAR_TABLE_CONTRACT[name], name
