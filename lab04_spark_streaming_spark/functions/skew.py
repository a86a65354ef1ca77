"""Hot-key (skew) mitigation helpers.

AQE's skew-join splitting (on in session.py) handles skewed JOINS; for
skewed AGGREGATIONS the standard fix is two-phase salted aggregation:
shuffle 1 groups on (key, salt) so a hot key spreads over ``n_salts``
reducers, shuffle 2 merges the tiny per-salt partials. With the
engine's exact decimal/integer moments the merge is a plain SUM and
the result is bit-identical to the direct aggregation (asserted in
tests) — salting changes the plan, never the answer.

When to use: a groupBy whose key histogram has outliers larger than an
executor's share (e.g. dedup counts by language, events by bot user).
Partial aggregation already absorbs most skew map-side; salting is for
the residual case where even one reducer's merged state is too large.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_moments(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    scale: int = 4,
) -> DataFrame:
    """Two-phase (count, Σv, Σv²) per key with an ``n_salts``-way salt.

    Salt is derived from a hash of the value column (deterministic, no
    rand() — keeps the plan replayable/resumable), spreading each key's
    rows uniformly. Output: key_cols, n, s, sq (exact decimal moments —
    avg/std derivable via functions/guards arithmetic).
    """
    v = F.col(value_col)
    salt = F.pmod(F.xxhash64(v), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.count(v).alias("_n"),
            F.sum(v.cast(f"decimal(30,{scale})")).alias("_s"),
            F.sum((v * v).cast(f"decimal(30,{2 * scale})")).alias("_sq"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias("s"),
        F.sum("_sq").alias("sq"),
    )


def direct_moments(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """Single-phase twin of :func:`salted_moments` (for comparison)."""
    v = F.col(value_col)
    return df.groupBy(*key_cols).agg(
        F.count(v).alias("n"),
        F.sum(v.cast(f"decimal(30,{scale})")).alias("s"),
        F.sum((v * v).cast(f"decimal(30,{2 * scale})")).alias("sq"),
    )
