"""Generic as-of join — the reusable form of the §3.4 intended
semantics (reference zscore_calculator.py:50-73 grid-join, fixed as an
as-of lookup in operators/zscore.py; this module is the user-facing
operator a reference user would reach for directly).

``asof_join(left, right, ...)`` attaches, to every left row, the most
recent right row with ``right.ts <= left.ts`` within the same key
group (and optionally within a tolerance); ``direction="forward"``
flips the scan to the EARLIEST right row with ``right.ts >= left.ts``
(the "next event after" lookup — e.g. next quote after a trade). Implemented as a union-fill
scan, NOT a range join: left and right rows are unioned, sorted by
(ts, side) per key, and the right row's payload is carried forward
with ``last_value(ignoreNulls)`` — one ordered scan, no row-pair
blowup, which is the shape that survives 100 TB (a range join's
candidate pairs grow with right-density × tolerance; the scan is
linear in rows).

The ordered scan is chunk-parallelized exactly like
plans/reference_parity.q_watermark_drop: per (key, ts-range chunk)
local fill in parallel, then a tiny per-chunk summary relation (the
last right payload of each chunk) provides each chunk's carry-in via
an exclusive running ``last_value`` over chunks — so no
single-partition window ever scans the data, and parallelism follows
the time axis, not the key cardinality.

DuckDB twin: native ``ASOF LEFT JOIN`` (same tie rule: the largest
right.ts <= left.ts), so the operator is fully oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_CHUNK_S = 16384  # seconds per chunk of the two-level scan


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    tolerance_s: int | None = None,
    suffix: str = "_asof",
    chunk_s: int | None = _CHUNK_S,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, the latest right row with right.ts <= left.ts
    (``direction="backward"``, default) or the earliest right row with
    right.ts >= left.ts (``"forward"``) in the same ``by`` group. Right
    rows must be unique per (by, ts) — pre-aggregate if not (ambiguous
    payloads have no deterministic as-of answer). Appends
    ``<ts_col><suffix>`` and ``<c><suffix>`` for each value column; all
    NULL when no right row qualifies (or the match is further than
    ``tolerance_s``). Both directions share the chunked union-fill
    scan — forward just reverses the scan order and the chunk-carry
    direction."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    by = list(by)
    value_cols = list(value_cols)

    lhs = left.withColumn("_is_left", F.lit(1))
    rhs = right.select(
        *by,
        F.col(ts_col),
        *[F.col(c) for c in value_cols],
    ).withColumn("_is_left", F.lit(0))
    payload = F.struct(
        F.col(ts_col).alias("_ats"), *[F.col(c).alias(c) for c in value_cols]
    )
    unioned = (
        lhs.unionByName(rhs, allowMissingColumns=True)
        .withColumn("_p", F.when(F.col("_is_left") == 0, payload))
    )

    def carried(df: DataFrame, extra_part: list[str]) -> Column:
        # right rows (0) sort before left rows (1) at equal ts, so a
        # same-timestamp right row IS visible to the left row — the
        # standard as-of tie rule (DuckDB ASOF JOIN matches <= / >=).
        # Forward direction = the same carry scan over reversed ts
        # order (the earliest following right row is the last one seen
        # walking backward from the end).
        ts_ord = F.col(ts_col).desc() if fwd else F.col(ts_col).asc()
        w = (
            Window.partitionBy(*by, *extra_part)
            .orderBy(ts_ord, "_is_left")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("_p", ignorenulls=True).over(w)

    if chunk_s is None:
        filled = unioned.withColumn("_fill", carried(unioned, []))
    else:
        b = unioned.withColumn(
            "_chunk", F.floor(F.unix_timestamp(F.col(ts_col)) / chunk_s)
        )
        local = b.withColumn("_local", carried(b, ["_chunk"]))
        # One row per (key, chunk) FOR EVERY chunk present (left-only
        # chunks included — they still need a carry-in), holding the
        # chunk's final right payload if the chunk has one.
        # Backward keeps each chunk's LATEST right payload and carries
        # it to later chunks; forward keeps the EARLIEST and carries it
        # to earlier chunks.
        pick = F.min if fwd else F.max
        per_chunk = (
            b.groupBy(*by, "_chunk")
            .agg(
                pick(
                    F.when(
                        F.col("_is_left") == 0,
                        F.struct(F.col(ts_col).alias("_ats"), "_p"),
                    )
                ).alias("_m")
            )
            .select(*by, "_chunk", F.col("_m._p").alias("_chunk_last"))
        )
        cw = (
            Window.partitionBy(*by)
            .orderBy(F.col("_chunk").desc() if fwd else F.col("_chunk").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = per_chunk.select(
            *by,
            "_chunk",
            F.last("_chunk_last", ignorenulls=True).over(cw).alias("_carry"),
        )
        filled = local.join(F.broadcast(carry), [*by, "_chunk"], "left").withColumn(
            "_fill", F.coalesce(F.col("_local"), F.col("_carry"))
        )

    out = filled.filter(F.col("_is_left") == 1)
    if tolerance_s is not None:
        tol = F.expr(f"INTERVAL {tolerance_s} SECONDS")
        in_tol = (
            F.col("_fill._ats") <= F.col(ts_col) + tol
            if fwd
            else F.col("_fill._ats") >= F.col(ts_col) - tol
        )
        out = out.withColumn("_fill", F.when(in_tol, F.col("_fill")))
    return out.select(
        *[c for c in left.columns],
        F.col("_fill._ats").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_fill.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
