"""Wave-13 robustness: brute-force references (Good–Turing identity,
Heaps monotonicity, Benford digit extraction, Tukey fences, credit
conservation in time-decay attribution) and a random-events fuzz."""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lab04_spark_streaming_spark.plans import wave13
from tests.oracle_harness import compare_query

_T0 = dt.datetime(2024, 6, 1, 0, 0, 0)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offs=st.lists(
        st.integers(min_value=0, max_value=40 * 86400),
        min_size=2,
        max_size=40,
        unique=True,
    ),
    data=st.data(),
)
def test_random_events_wave13_parity(spark, tmp_path_factory, offs, data):
    n = len(offs)
    users = data.draw(
        st.lists(st.integers(min_value=0, max_value=4), min_size=n, max_size=n)
    )
    cents = data.draw(
        st.lists(
            st.integers(min_value=-400, max_value=40_000),
            min_size=n,
            max_size=n,
        )
    )
    types = data.draw(
        st.lists(
            st.sampled_from(["click", "view", "purchase"]),
            min_size=n,
            max_size=n,
        )
    )
    d = str(tmp_path_factory.mktemp("w13ev"))
    rows = [
        (
            i,
            _T0 + dt.timedelta(seconds=off),
            users[i],
            types[i],
            cents[i] / 100.0,
            "{}",
        )
        for i, off in enumerate(offs)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet/*.parquet')"
        )
        for fn, sql in [
            (wave13.q_tukey_fences, wave13.SQL_TUKEY_FENCES),
            (wave13.q_cohort_ltv, wave13.SQL_COHORT_LTV),
            (
                wave13.q_time_decay_attribution,
                wave13.SQL_TIME_DECAY_ATTRIBUTION,
            ),
        ]:
            compare_query(spark, con, fn, sql, d)
    finally:
        con.close()


def test_good_turing_matches_bruteforce(spark, sf_dir):
    import re
    from collections import Counter

    import duckdb as dd

    con = dd.connect()
    docs = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    counts: Counter = Counter()
    for (text,) in docs:
        counts.update(t for t in re.split("[^a-z0-9]+", text.lower()) if t)
    nr = Counter(counts.values())
    got = {
        r.r: (r.n_r, r.n_r_plus_1, r.r_star)
        for r in wave13.q_good_turing(spark, sf_dir).collect()
    }
    for r, (n_r, n_r1, r_star) in got.items():
        assert n_r == nr[r], r
        assert n_r1 == nr.get(r + 1, 0), r
        if nr.get(r + 1):
            assert abs(r_star - (r + 1) * nr[r + 1] / nr[r]) < 1e-5
        else:
            assert r_star is None


def test_heaps_points_monotone_and_beta_plausible(spark, sf_dir):
    rows = sorted(
        wave13.q_heaps_law(spark, sf_dir).collect(), key=lambda r: r.dec
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens >= a.n_tokens
        assert b.vocab >= a.vocab
    betas = {r.beta for r in rows}
    assert len(betas) == 1
    beta = betas.pop()
    if beta is not None:
        # sublinear vocabulary growth; the synthetic corpus's CLOSED
        # ~60-word vocabulary saturates in the first decile, so beta
        # rounding to exactly 0 is the correct answer there
        assert 0.0 <= beta <= 1.0


def test_benford_digits_match_bruteforce(spark, sf_dir):
    import duckdb as dd

    con = dd.connect()
    vals = [
        r[0]
        for r in con.execute(
            "SELECT o_totalprice FROM "
            f"read_parquet('{sf_dir}/orders.parquet') WHERE o_totalprice > 0"
        ).fetchall()
    ]
    con.close()
    from collections import Counter

    def first_digit(x: float) -> int:
        s = repr(abs(x))
        for ch in s:
            if ch in "123456789":
                return int(ch)
        return 0

    expected = Counter(first_digit(v) for v in vals)
    got = {
        r.d: r.n_obs for r in wave13.q_benford_audit(spark, sf_dir).collect()
    }
    for d in range(1, 10):
        assert got.get(d, 0) == expected.get(d, 0), d


def test_tukey_fences_match_bruteforce(spark, sf_dir):
    import duckdb as dd

    con = dd.connect()
    rows = con.execute(
        "SELECT event_type, value FROM "
        f"read_parquet('{sf_dir}/events.parquet') "
        "ORDER BY event_type, value, event_id"
    ).fetchall()
    con.close()
    by_t: dict = {}
    for t, v in rows:
        by_t.setdefault(t, []).append(v)
    got = {
        r.event_type: r for r in wave13.q_tukey_fences(spark, sf_dir).collect()
    }
    for t, vs in by_t.items():
        n = len(vs)
        q1 = vs[math.ceil(n / 4) - 1]
        q3 = vs[math.ceil(3 * n / 4) - 1]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        n_out = sum(1 for v in vs if v < lo or v > hi)
        r = got[t]
        assert r.n == n
        assert abs(r.q1 - q1) < 1e-6 and abs(r.q3 - q3) < 1e-6
        assert r.n_outliers == n_out, t


def test_time_decay_credit_conserved(spark, sf_dir):
    """Total credit across channels must equal the number of purchases
    that HAVE at least one attributable touch (each such purchase's
    credits are normalized to 1)."""
    import duckdb as dd

    rows = wave13.q_time_decay_attribution(spark, sf_dir).collect()
    total_credit = sum(r.total_credit for r in rows)
    con = dd.connect()
    n_attributable = con.execute(
        f"""
        WITH p AS (SELECT user_id, event_id, ts FROM
                   read_parquet('{sf_dir}/events.parquet')
                   WHERE event_type = 'purchase')
        SELECT COUNT(*) FROM p WHERE EXISTS (
          SELECT 1 FROM read_parquet('{sf_dir}/events.parquet') t
          WHERE t.user_id = p.user_id AND t.event_type IN ('click', 'view')
            AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
        )
        """
    ).fetchone()[0]
    con.close()
    assert abs(total_credit - n_attributable) < 0.01
