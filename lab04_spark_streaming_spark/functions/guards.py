"""Null/NaN/zero guard expressions.

The reference guards every statistic it emits (sample stddev over a
1-row group is NULL; a z-score with std 0/NULL/NaN would be ±inf/NaN):

  * avg  → ``coalesce(avg, 0.0)``          (moving_statistic.py:84)
  * std  → ``when(isnull|isnan, 0.0)``     (moving_statistic.py:86-87)
  * z    → ``when(std bad, 0.0).otherwise((price-avg)/std)``
                                           (zscore_calculator.py:127-133)

These are pure Catalyst expressions — they stay inside whole-stage
codegen, cost nothing at scale, and are shared by the batch and
streaming plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def guarded_avg(c: Column) -> Column:
    """avg with the reference's null→0.0 coalesce (moving_statistic.py:84)."""
    return F.coalesce(F.avg(c), F.lit(0.0))


def guarded_std(c: Column) -> Column:
    """Sample stddev with null/NaN→0.0 (moving_statistic.py:85-87).

    Spark's ``stddev`` is ``stddev_samp`` — NULL for 1-row groups.
    """
    s = F.stddev(c)
    return F.when(F.isnull(s) | F.isnan(s), F.lit(0.0)).otherwise(s)


def bad_std(std: Column) -> Column:
    """Predicate: std is unusable for a z-score (zscore_calculator.py:128)."""
    return F.isnull(std) | F.isnan(std) | (std == F.lit(0.0))


def safe_zscore(value: Column, avg: Column, std: Column) -> Column:
    """(value - avg) / std, forced to 0.0 when std is 0/NULL/NaN
    (zscore_calculator.py:127-133)."""
    return F.when(bad_std(std), F.lit(0.0)).otherwise((value - avg) / std)


# --- Exact (cross-engine bit-identical) moment aggregates ------------------
# Plain double SUM/AVG/STDDEV are order-dependent (parallel summation), so
# two engines legitimately disagree in the last ulps — fatal for the
# value-hash oracle when a result sits on a rounding boundary (e.g. the
# exact half 63.92125). These variants compute the aggregate from EXACT
# decimal moments: per-row casts are deterministic, decimal summation is
# order-independent, and the final double arithmetic is identical IEEE on
# identical inputs — so Spark and DuckDB produce bit-identical doubles
# and no output rounding is needed at all. Still fully incremental
# (sum/count/sumsq) → streaming- and partial-agg-friendly.

def exact_avg(c: Column, scale: int = 4) -> Column:
    """Order-independent avg == guarded_avg semantics (null→0.0)."""
    n = F.count(c)
    s = F.sum(c.cast(f"decimal(30,{scale})")).cast("double")
    return F.when(n == 0, F.lit(0.0)).otherwise(s / n)


def exact_std(c: Column, scale: int = 4) -> Column:
    """Order-independent sample stddev == guarded_std semantics (1-row or
    empty group → 0.0), via sqrt((Σv² − (Σv)²/n)/(n−1)) on exact moments."""
    n = F.count(c)
    s = F.sum(c.cast(f"decimal(30,{scale})")).cast("double")
    sq = F.sum((c * c).cast(f"decimal(30,{2 * scale})")).cast("double")
    var = (sq - s * s / n) / (n - F.lit(1))
    return F.when(n <= 1, F.lit(0.0)).otherwise(F.sqrt(F.greatest(var, F.lit(0.0))))


def sql_exact_avg(col: str, scale: int = 4) -> str:
    """DuckDB SQL mirroring :func:`exact_avg` expression-for-expression."""
    return (
        f"CASE WHEN COUNT({col}) = 0 THEN 0.0 "
        f"ELSE CAST(SUM(CAST({col} AS DECIMAL(30,{scale}))) AS DOUBLE) / COUNT({col}) END"
    )


def stable_round(c: Column, digits: int = 4) -> Column:
    """Cross-engine-stable round: floor(x*10^d + 0.5)/10^d computed in
    double. Unlike F.round (decimal-string HALF_UP) vs DuckDB round
    (binary), this is the same IEEE expression in both engines, so equal
    inputs give bit-equal outputs. Use only for display-style rounding
    (JSON payloads); oracle queries prefer exact moments + no rounding."""
    p = float(10**digits)
    return F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(p)


def sql_stable_round(col: str, digits: int = 4) -> str:
    """DuckDB SQL mirroring :func:`stable_round`. ``col`` is
    parenthesized before the scale multiply — a compound expression
    with a top-level +/- would otherwise bind only its last factor to
    the scale (caught live on ``a - b * c / d``, round 8)."""
    p = float(10**digits)
    return f"floor(({col}) * {p} + 0.5) / {p}"


def sql_exact_std(col: str, scale: int = 4) -> str:
    """DuckDB SQL mirroring :func:`exact_std` expression-for-expression."""
    s = f"CAST(SUM(CAST({col} AS DECIMAL(30,{scale}))) AS DOUBLE)"
    sq = f"CAST(SUM(CAST({col} * {col} AS DECIMAL(30,{2 * scale}))) AS DOUBLE)"
    n = f"COUNT({col})"
    return (
        f"CASE WHEN {n} <= 1 THEN 0.0 "
        f"ELSE sqrt(greatest(({sq} - {s} * {s} / {n}) / ({n} - 1), 0.0)) END"
    )
