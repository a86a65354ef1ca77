"""Property-based robustness: random corpora and tick series through
the same cross-engine / brute-force oracles the fixture tests use.
Catches input-shape edge cases a fixed fixture can't (empty docs,
unicode, punctuation runs, ties in tick values).

Examples are capped small: each Spark round-trip costs ~1s, so the
budget goes to input diversity, not example count.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lab04_spark_streaming_spark.plans import llm
from tests.oracle_harness import compare_query

# Mix of scripts, digits, punctuation, whitespace — and '' docs.
_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789äöüßéàçñ中文.,!?'\"()-@#",
    min_size=1,
    max_size=8,
)
_DOC = st.lists(_WORD, min_size=0, max_size=25).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)

_PROP_QUERIES = [
    (llm.q_text_metrics, llm.SQL_TEXT_METRICS),
    (llm.q_fingerprint, llm.SQL_FINGERPRINT),
    (llm.q_dedup_exact, llm.SQL_DEDUP_EXACT),
    (llm.q_jaccard_pairs, llm.SQL_JACCARD_PAIRS),
    (llm.q_token_count_bpe, llm.SQL_TOKEN_COUNT_BPE),
    (llm.q_pii_scrub, llm.SQL_PII_SCRUB),
]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_random_corpus_cross_engine_parity(spark, tmp_path_factory, corpus):
    d = str(tmp_path_factory.mktemp("propdocs"))
    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(corpus)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet/*.parquet')"
        )
        for fn, sql in _PROP_QUERIES:
            compare_query(spark, con, fn, sql, d)
    finally:
        con.close()


_T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _brute_first_crossing(ticks, horizon_s, direction):
    """O(n²) reference: for each tick, seconds until the first strictly
    higher/lower value within the horizon, else None."""
    out = {}
    for t, v in ticks:
        hit = None
        for t2, v2 in ticks:
            if t < t2 <= t + dt.timedelta(seconds=horizon_s):
                if (v2 > v) if direction == "higher" else (v2 < v):
                    if hit is None or t2 < hit:
                        hit = t2
        out[t] = (hit - t).total_seconds() if hit else None
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=120), min_size=1, max_size=30, unique=True
    ),
    # small value domain on purpose: ties are the interesting case
    vals=st.lists(st.integers(min_value=0, max_value=5), min_size=30, max_size=30),
    direction=st.sampled_from(["higher", "lower"]),
)
def test_first_crossing_batch_matches_bruteforce(spark, offsets, vals, direction):
    from lab04_spark_streaming_spark.streaming.state import first_crossing_batch

    ticks = [
        (_T0 + dt.timedelta(seconds=o), float(v)) for o, v in zip(offsets, vals)
    ]
    rows = [("K", v, t, i) for i, (t, v) in enumerate(ticks)]
    df = spark.createDataFrame(
        rows, "symbol string, price double, event_time timestamp, seq long"
    )
    got = {
        r.ts: r.seconds_until
        for r in first_crossing_batch(
            df, "event_time", ["symbol"], "price", 40, direction
        ).collect()
    }
    expected = _brute_first_crossing(ticks, 40, direction)
    assert got.keys() == expected.keys()
    for ts in expected:
        if expected[ts] is None:
            assert got[ts] is None, ts
        else:
            assert got[ts] == pytest.approx(expected[ts], abs=1e-6), ts
