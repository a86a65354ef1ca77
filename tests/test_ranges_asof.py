"""Unit tests for the generic interval join and the forward as-of
direction (the oracle-parity suite covers the registered queries; these
pin operator-level semantics the queries don't reach)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lab04_spark_streaming_spark.operators.asof import asof_join
from lab04_spark_streaming_spark.operators.ranges import interval_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def tiny(spark):
    points = spark.createDataFrame(
        [("k", _ts(5), 1), ("k", _ts(95), 2), ("k", _ts(400), 3), ("x", _ts(95), 4)],
        "key string, ts timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [
            ("k", _ts(0), _ts(100), 10),
            ("k", _ts(90), _ts(300), 11),  # overlaps the first
            ("x", _ts(200), _ts(250), 12),
        ],
        "key string, start_ts timestamp, end_ts timestamp, iid int",
    )
    return points, intervals


def test_interval_join_inner_pairs(tiny):
    points, intervals = tiny
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, ["key"], "ts", "start_ts", "end_ts", bucket_s=60
        ).collect()
    )
    # pid2 (t=95) is inside BOTH overlapping k intervals; pid3/pid4 in none.
    assert got == [(1, 10), (2, 10), (2, 11)]


def test_interval_join_left_keeps_uncovered_points(tiny):
    points, intervals = tiny
    out = interval_join(
        points, intervals, ["key"], "ts", "start_ts", "end_ts",
        bucket_s=60, how="left",
    )
    rows = {(r.pid, r.iid) for r in out.collect()}
    assert (3, None) in rows and (4, None) in rows
    assert len(rows) == 5


def test_interval_join_no_nested_loop(tiny):
    import contextlib
    import io

    points, intervals = tiny
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        interval_join(
            points, intervals, ["key"], "ts", "start_ts", "end_ts", bucket_s=60
        ).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_forward_matches_next_and_tolerance(spark):
    left = spark.createDataFrame(
        [("k", _ts(0), 1), ("k", _ts(50), 2), ("k", _ts(200), 3)],
        "key string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [("k", _ts(50), 7.0), ("k", _ts(60), 8.0)],
        "key string, ts timestamp, v double",
    )
    out = {
        r.lid: (r.ts_next, r.v_next)
        for r in asof_join(
            left, right, "ts", ["key"], ["v"],
            tolerance_s=30, suffix="_next", direction="forward",
        ).collect()
    }
    assert out[1] == (None, None)  # next right at +50s is out of tolerance
    assert out[2] == (_ts(50), 7.0)  # same-ts right visible (>= tie rule)
    assert out[3] == (None, None)  # nothing after


def test_asof_forward_chunked_equals_unchunked(spark, sf_dir):
    from lab04_spark_streaming_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    spikes = (
        ev.filter(F.col("value") >= 250)
        .groupBy("event_type", "ts")
        .agg(F.max("value").alias("sv"))
    )
    kw = dict(ts_col="ts", by=["event_type"], value_cols=["sv"],
              direction="forward", suffix="_n")
    a = asof_join(ev, spikes, chunk_s=3600, **kw)
    b = asof_join(ev, spikes, chunk_s=None, **kw)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
