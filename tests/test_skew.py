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


def test_cooccurrence_pair_walk_bounded_by_distinct_words(spark, tmp_path):
    """A pathological mega-doc (10k tokens, 20 distinct words) must not
    blow up the co-occurrence pair walk: the distinct-word projection
    caps its contribution at C(20,2) pairs regardless of token count."""
    from lab04_spark_streaming_spark.plans.corpus import q_word_cooccurrence

    words = [f"w{i:02d}" for i in range(20)]
    mega = " ".join(words[i % 20] for i in range(10_000))
    df = spark.createDataFrame(
        [(0, mega, "en", "src0", len(mega))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = q_word_cooccurrence(spark, str(tmp_path)).collect()
    # top-20 of the 190 possible pairs, every pair with n_docs == 1
    assert len(rows) == 20
    assert all(r.n_docs == 1 for r in rows)


def test_token_budget_pack_tie_stability(spark, tmp_path):
    """All-equal-length docs: the budget cut must fall deterministically
    by doc_id (the declared tie-break), independent of partitioning."""
    from lab04_spark_streaming_spark.plans.corpus import q_token_budget_pack

    text = " ".join(["tok"] * 100)  # 100 tokens each
    df = spark.createDataFrame(
        [(i, text, "en", "srcA", len(text)) for i in range(80)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.repartition(8).write.parquet(str(tmp_path / "documents.parquet"))
    kept = sorted(
        r.doc_id for r in q_token_budget_pack(spark, str(tmp_path)).collect()
    )
    # budget 5000 → exactly the 50 lowest doc_ids admitted
    assert kept == list(range(50))


def test_textrank_disconnected_components(spark, tmp_path):
    """Two disjoint co-occurrence components: ranks must still be a
    contiguous 1..k and every node's score positive — the damping base
    term keeps isolated components from starving."""
    from lab04_spark_streaming_spark.plans.corpus import q_textrank_keywords

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "en", "s", 10),
            (1, "alpha beta", "en", "s", 10),
            (2, "delta epsilon", "en", "s", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = sorted(
        q_textrank_keywords(spark, str(tmp_path)).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.textrank_q > 0 for r in rows)
    # the triangle's hub words outrank the isolated pair's
    top2 = {rows[0].word, rows[1].word}
    assert top2 <= {"alpha", "beta", "gamma"}
