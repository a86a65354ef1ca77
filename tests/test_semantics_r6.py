"""Ground-truth semantic tests for the round-6 third-wave operators.

The DuckDB oracle harness proves CROSS-ENGINE equality; these tests
prove the operators compute the RIGHT THING on constructed inputs with
known answers — a recovered regression line, a located step change, a
sketch's one-sided error, a Bloom filter's no-false-negative guarantee.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

_EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _write_events(spark, tmp_path, rows, name):
    path = str(tmp_path / name)
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.parquet(path)
    return str(tmp_path)


def test_ols_recovers_exact_line(spark, tmp_path):
    """On exactly-linear data y = 0.02·x + 5 (cents-exact at every
    sampled x), the exact-moment OLS must return the line's slope and
    intercept to double precision."""
    from lab04_spark_streaming_spark.plans.timeseries import q_user_trend_ols

    rows = []
    for i in range(50):
        x = 100 * i  # seconds
        y = round(5.0 + 0.02 * x, 2)  # exact cents
        rows.append(
            (i, T0 + dt.timedelta(seconds=x), 1, "view", y, None)
        )
    sf = _write_events(spark, tmp_path, rows, "events.parquet")
    out = q_user_trend_ols(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r.slope_per_s - 0.02) < 1e-12, r.slope_per_s
    assert abs(r.intercept - 5.0) < 1e-9, r.intercept


def test_cusum_locates_step_change(spark, tmp_path):
    """A clean level shift at index 60 of 100 must put the CUSUM
    argmax exactly at the last pre-shift point."""
    from lab04_spark_streaming_spark.plans.timeseries import (
        q_cusum_changepoint,
    )

    rows = []
    for i in range(100):
        v = 10.0 if i < 60 else 20.0
        rows.append((i, T0 + dt.timedelta(seconds=10 * i), 1, "view", v, None))
    sf = _write_events(spark, tmp_path, rows, "events.parquet")
    r = q_cusum_changepoint(spark, sf).collect()[0]
    assert r.changepoint_t == 60, r  # 1-based rank of last pre-shift row
    assert r.n == 100


def test_winsorize_bounds_and_counts(spark, tmp_path):
    """Clipped mean must lie within [p01, p99] and clip counts must
    match the values actually outside the band."""
    from lab04_spark_streaming_spark.plans.timeseries import (
        q_winsorize_p01_p99,
    )

    vals = [50.0] * 96 + [0.01, 0.02, 999.0, 998.0]
    rows = [
        (i, T0 + dt.timedelta(seconds=i), 1, "view", v, None)
        for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows, "events.parquet")
    r = q_winsorize_p01_p99(spark, sf).collect()[0]
    assert r.p01 <= r.clipped_mean <= r.p99
    assert r.n == 100
    assert r.n_clipped_low >= 1 and r.n_clipped_high >= 1


def test_cms_overestimates_never_under(spark, sf_dir):
    """Count-min property: every estimate ≥ the true count (one-sided
    error), asserted on the real fixture corpus."""
    from lab04_spark_streaming_spark.plans.corpus import q_heavy_hitters_cms

    for r in q_heavy_hitters_cms(spark, sf_dir).collect():
        assert r.cms_est >= r.true_cnt, (r.word, r.cms_est, r.true_cnt)


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom property: every incoming digest that IS in the base must
    be a bloom hit (false positives allowed, false negatives never)."""
    from lab04_spark_streaming_spark.plans.corpus import q_bloom_membership

    rows = q_bloom_membership(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.in_base:
            assert r.bloom_hit, r
        # and the flag is consistent by construction
        assert r.is_false_positive == (r.bloom_hit and not r.in_base)


def test_textrank_mass_and_order(spark, sf_dir):
    """TextRank invariants: scores positive, ranks contiguous from 1,
    ordered by (score desc, word)."""
    from lab04_spark_streaming_spark.plans.corpus import q_textrank_keywords

    rows = sorted(
        q_textrank_keywords(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.textrank_q > 0 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert (a.textrank_q, b.word) > (b.textrank_q, a.word) or (
            a.textrank_q > b.textrank_q
        ) or (a.textrank_q == b.textrank_q and a.word < b.word)


def test_assoc_rules_bounds(spark, sf_dir):
    """Association-rule invariants on the fixture: confidences in
    (0, 1], n_both ≤ min(n_a, n_b), lift consistent with its
    definition."""
    from lab04_spark_streaming_spark.plans.timeseries import (
        q_session_assoc_rules,
    )

    rows = q_session_assoc_rules(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.conf_a_to_b <= 1 and 0 < r.conf_b_to_a <= 1
        assert r.n_both <= min(r.n_a, r.n_b)
        expected_lift = (r.n_both * r.n_sessions) / (r.n_a * r.n_b)
        assert math.isclose(r.lift, expected_lift, rel_tol=1e-12)


def test_unigram_logprob_range(spark, sf_dir):
    """Average −log2 p is positive and at most log2(N) (rarest
    possible token everywhere)."""
    from lab04_spark_streaming_spark.plans.corpus import q_unigram_logprob

    rows = q_unigram_logprob(spark, sf_dir).collect()
    assert rows
    n_total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert 0 < r.avg_neg_log2p <= math.log2(n_total) + 1e-9
