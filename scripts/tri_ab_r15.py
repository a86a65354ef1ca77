"""r15 VERDICT item 3: clean sf0.1 adjudication of the r14 pair-build
rewrite (groupBy+comprehension) vs the old distinct+self-join, for
triangle_count and its copurchase_lift twin, under bench methodology
(one session, count sink, interleaved runs, median of 5).

The OLD variants are copied verbatim from git `e0caef0~1` (the commit
before the rewrite); the NEW variants are the current registry plans.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from lab04_spark_streaming_spark.plans.wave7 import _LIFT_TOPK, q_copurchase_lift
from lab04_spark_streaming_spark.plans.wave9 import (
    _BCAST_EDGE_CAP,
    _estimate_copurchase_edges,
    q_triangle_count,
)
from lab04_spark_streaming_spark.functions.guards import stable_round
from lab04_spark_streaming_spark.session import get_spark
from lab04_spark_streaming_spark.sources.files import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def tri_old(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .repartition(spark.sparkContext.defaultParallelism, "ok")
        .distinct()
    )
    _PIN = StorageLevel.MEMORY_AND_DISK
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "ok")
        .filter(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
        .localCheckpoint(eager=False, storageLevel=_PIN)
    )
    deg = (
        pairs.select(F.col("u").alias("x"))
        .unionAll(pairs.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = (
        pairs.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        .localCheckpoint(eager=False, storageLevel=_PIN)
    )
    adj = (
        oriented.groupBy("s")
        .agg(F.array_sort(F.collect_list("t")).alias("nbrs"))
        .localCheckpoint(eager=False, storageLevel=_PIN)
    )
    _maybe_b = (
        F.broadcast
        if _estimate_copurchase_edges(sf_dir) <= _BCAST_EDGE_CAP
        else (lambda d: d.hint("shuffle_hash"))
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = adj.agg(
        F.sum(F.expr("size(nbrs) * (size(nbrs) - 1) / 2")).cast("long").alias("n_wedges")
    )
    n_tri = (
        oriented.join(_maybe_b(adj), "s")
        .join(
            _maybe_b(adj.select(F.col("s").alias("t"), F.col("nbrs").alias("nbrs_t"))),
            "t",
        )
        .agg(
            F.sum(F.expr("size(array_intersect(nbrs, nbrs_t))"))
            .cast("long")
            .alias("n_triangles")
        )
    )
    return (
        n_edges.crossJoin(n_wedges)
        .crossJoin(n_tri)
        .select(
            "n_edges",
            F.coalesce("n_wedges", F.lit(0)).alias("n_wedges"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            stable_round(
                F.when(F.coalesce("n_wedges", F.lit(0)) == 0, F.lit(0.0)).otherwise(
                    3.0
                    * F.coalesce("n_triangles", F.lit(0)).cast("double")
                    / F.col("n_wedges").cast("double")
                ),
                6,
            ).alias("global_clustering"),
        )
    )


def copurchase_old(spark, sf_dir):
    basket = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    n_orders = basket.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    marg = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("m"))
    pairs = (
        basket.alias("a")
        .join(basket.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    top = (
        pairs.orderBy(F.desc("n_pair"), "p1", "p2")
        .limit(_LIFT_TOPK)
        .join(marg.select(F.col("l_partkey").alias("p1"), F.col("m").alias("m1")), "p1")
        .join(marg.select(F.col("l_partkey").alias("p2"), F.col("m").alias("m2")), "p2")
        .crossJoin(F.broadcast(n_orders))
    )
    rk = F.row_number().over(Window.orderBy(F.desc("n_pair"), "p1", "p2"))
    return top.select(
        "p1",
        "p2",
        "n_pair",
        "m1",
        "m2",
        (
            (F.col("n_pair") * F.col("n_orders")).cast("double")
            / (F.col("m1") * F.col("m2"))
        ).alias("lift"),
        rk.cast("int").alias("rank"),
    )


def main() -> None:
    spark = get_spark(app_name="tri-ab-r15")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "triangle_old": tri_old,
        "triangle_new": q_triangle_count,
        "copurchase_old": copurchase_old,
        "copurchase_new": q_copurchase_lift,
    }
    # warm the JVM once
    q_triangle_count(spark, SF_DIR).count()
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(5):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).count()
            samples[name].append(time.time() - t0)
    out = {
        k: {
            "median": round(statistics.median(v), 3),
            "runs": [round(x, 3) for x in v],
        }
        for k, v in samples.items()
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
