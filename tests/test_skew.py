from __future__ import annotations

from pyspark.sql import functions as F

from lab04_spark_streaming_spark.functions.skew import (
    direct_moments,
    salted_moments,
)
from lab04_spark_streaming_spark.sources.files import load_table
from tests.test_plans import plan_of


def test_salted_moments_bit_identical(spark, sf_dir):
    """Salting redistributes the shuffle but, with exact decimal
    moments, must not change a single bit of the result — even on a
    deliberately skewed key distribution."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "skewed_key",
        F.when(F.col("event_id") % 10 != 0, F.lit("hot")).otherwise(
            F.col("event_type")
        ),
    )
    a = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in direct_moments(ev, ["skewed_key"], "value").collect()
    }
    b = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in salted_moments(ev, ["skewed_key"], "value").collect()
    }
    assert a == b


def test_salted_plan_has_two_exchanges(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = plan_of(salted_moments(ev, ["event_type"], "value"))
    assert plan.count("Exchange") >= 2  # (key,salt) then (key)


def test_session_enables_aqe_skew_join(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_jaccard_stop_shingle_cap_bounds_hot_bucket(spark, tmp_path):
    """One boilerplate shingle shared by EVERY doc must not create a
    quadratic inverted-index bucket: with max_df below the corpus size
    the hot shingle is dropped before the self-join, and pairs whose
    only overlap was boilerplate disappear. Docs that genuinely overlap
    keep their (recounted) Jaccard."""
    from lab04_spark_streaming_spark.operators.dedup import jaccard_pairs

    boiler = "all rights reserved worldwide"
    rows = [
        (0, f"alpha beta gamma delta epsilon zeta {boiler}"),
        (1, f"alpha beta gamma delta epsilon zeta {boiler}"),  # true dup of 0
        (2, f"completely different words entirely here now {boiler}"),
        (3, f"unrelated tokens again nothing shared whatsoever {boiler}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = jaccard_pairs(docs, threshold=0.01, max_df=None)
    assert uncapped.count() == 6  # boilerplate pairs everyone with everyone

    capped = jaccard_pairs(docs, threshold=0.01, max_df=3)
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    assert set(got) == {(0, 1)}  # only the true near-dup survives
    assert got[(0, 1)] == 1.0  # recounted over capped sets: exact dup
