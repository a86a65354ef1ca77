"""Generic point-in-interval (range) join, bucketed into an equi-join.

Spark has no native range-join operator: a raw ``ON p.ts BETWEEN
i.start AND i.end`` predicate plans as BroadcastNestedLoopJoin (or a
cartesian product) — quadratic and fatal at scale. The classic fix,
used by every streaming/interval engine (and by
streaming/state.first_crossing_batch for its fixed-horizon case), is
time bucketing: pick a bucket width ``bucket_s``; an interval
[start, end] overlaps only buckets floor(start/B) .. floor(end/B), so
exploding each interval across its covered buckets turns the range
predicate into a plain shuffled equi-join on (key, bucket) plus a
cheap post-filter for exact containment.

Scale shape: expansion per interval is ceil(span/B)+1 rows — choose
``bucket_s`` near the TYPICAL interval span so expansion is ~2× and
each bucket's candidate set stays small. One shuffle on (key, bucket);
no nested loop anywhere (asserted in tests/test_plans.py). Skewed hot
buckets fall under AQE skew-join handling like any other equi-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_s: int = 300,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point_ts <= end`` in
    the same ``by`` group. Column sets of both inputs are preserved
    (caller projects first; overlapping names other than ``by`` must be
    disambiguated by the caller). ``how`` is ``inner`` or ``left``
    (every point kept, interval columns NULL when uncovered)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = list(by)
    p = points.alias("p").withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_s)
    )
    iv = intervals.alias("i").withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_s),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_s),
            )
        ),
    )
    cond = p["_bucket"] == iv["_bucket"]
    for k in by:
        cond = cond & (p[k] == iv[k])
    cond = (
        cond
        & (p[point_ts] >= iv[start_col])
        & (p[point_ts] <= iv[end_col])
    )
    joined = p.join(iv, cond, how)
    keep_p = [p[c] for c in points.columns]
    keep_i = [iv[c] for c in intervals.columns if c not in by]
    return joined.select(*keep_p, *keep_i)
