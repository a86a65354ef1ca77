"""Scale-path implementation of the sliding-window statistics.

Spark's built-in sliding ``window()`` physically EXPANDS each input row
into duration/slide copies (a 360-way Expand for 1h/10s — visible in
explain()). Correct, but at 100 TB the shuffle carries
rows × Σ(D_i/S) duplicates — the dominant cost of the reference
pipeline's plan (measured: 48 s of a 77 s bench at sf0.1).

This module computes identical results from per-slot prefix sums:

  1. bucket   — ONE shuffle: groupBy (key, 10 s slot) → exact decimal
                moments (n, Σv, Σv²). Output size is bounded by
                time-range/slide × keys, INDEPENDENT of row count —
                the crucial property at scale.
  2. cumsum   — per-key running moments ordered by slot (window
                function; one shuffle by key, partition-local sort).
  3. probe    — any window [e−D, e) statistic is cum(e−1) − cum(e−1−D/S),
                an as-of lookup into the sparse slot axis, implemented
                as union + last_value(ignoreNulls) — still no expansion.

avg/std derived from the same exact decimal moments as
functions/guards.py, so results are bit-identical to the reference
implementation (asserted in tests and against the DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lab04_spark_streaming_spark.functions.guards import safe_zscore
from lab04_spark_streaming_spark.operators.moving_stats import (
    REFERENCE_WINDOWS,
    _duration_seconds,
)


def bucket_moments(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    slide_s: int = 10,
) -> DataFrame:
    """Stage 1: exact moments per (key, slot). The only row-count-
    proportional shuffle in the pipeline (with map-side partial agg)."""
    v = F.col(value_col)
    return (
        df.withColumn("_slot", F.floor(F.unix_timestamp(F.col(ts_col)) / slide_s))
        .groupBy(*key_cols, "_slot")
        .agg(
            F.count(v).alias("_n"),
            F.sum(v.cast("decimal(30,4)")).alias("_s"),
            F.sum((v * v).cast("decimal(30,8)")).alias("_sq"),
        )
    )


def cumulative_moments(
    buckets: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Stage 2: per-key running moments (decimal sums stay exact)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return buckets.select(
        *key_cols,
        "_slot",
        F.sum("_n").over(w).alias("_cn"),
        F.sum("_s").over(w).alias("_cs"),
        F.sum("_sq").over(w).alias("_csq"),
    )


def asof_cum_lookup(
    cums: DataFrame,
    probes: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """For each probe (key, slot) return the cumulative moments through
    that slot (zeros when no bucket precedes it). Union + ordered
    last_value(ignoreNulls): one shuffle by key, no expansion."""
    b = cums.select(
        *key_cols,
        "_slot",
        F.lit(1).alias("_isb"),
        "_cn",
        "_cs",
        "_csq",
    )
    p = probes.select(
        *key_cols,
        "_slot",
        F.lit(0).alias("_isb"),
        F.lit(None).cast(b.schema["_cn"].dataType).alias("_cn"),
        F.lit(None).cast(b.schema["_cs"].dataType).alias("_cs"),
        F.lit(None).cast(b.schema["_csq"].dataType).alias("_csq"),
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_slot"), F.col("_isb").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    filled = b.unionByName(p).select(
        *key_cols,
        "_slot",
        "_isb",
        F.last("_cn", ignorenulls=True).over(w).alias("_cn"),
        F.last("_cs", ignorenulls=True).over(w).alias("_cs"),
        F.last("_csq", ignorenulls=True).over(w).alias("_csq"),
    )
    return (
        filled.filter(F.col("_isb") == 0)
        .drop("_isb")
        .withColumn("_cn", F.coalesce(F.col("_cn"), F.lit(0)))
        .withColumn(
            "_cs", F.coalesce(F.col("_cs"), F.lit(0).cast(b.schema["_cs"].dataType))
        )
        .withColumn(
            "_csq",
            F.coalesce(F.col("_csq"), F.lit(0).cast(b.schema["_csq"].dataType)),
        )
    )


def _stats_from_moment_diff(n: Column, s: Column, sq: Column) -> tuple[Column, Column]:
    """avg/std from moment differences — the exact same arithmetic as
    functions/guards.exact_avg/exact_std, so results are bit-identical."""
    sd = s.cast("double")
    sqd = sq.cast("double")
    avg = F.when(n == 0, F.lit(0.0)).otherwise(sd / n)
    var = (sqd - sd * sd / n) / (n - F.lit(1))
    std = F.when(n <= 1, F.lit(0.0)).otherwise(F.sqrt(F.greatest(var, F.lit(0.0))))
    return avg, std


def moving_stats_flat_fast(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    windows: Sequence[tuple[str, str]] = REFERENCE_WINDOWS,
    slide_s: int = 10,
) -> DataFrame:
    """Prefix-sum equivalent of operators/moving_stats.moving_stats_flat
    (bit-identical output, asserted in tests). Instead of expanding
    every ROW into Σ(D/S) window memberships, candidate window ends are
    enumerated from each key's [min_slot, max_slot] range — work bounded
    by time-range/slide × keys × windows, independent of row count.

    Parallelism note: the per-key cumulative sort limits parallelism to
    the key cardinality; with few keys and a long time axis, salt the
    cumsum by slot-range chunks (carry chunk offsets in a second pass) —
    not needed at this fixture's scale, noted for 100 TB."""
    buckets = bucket_moments(df, ts_col, key_cols, value_col, slide_s)
    cums = cumulative_moments(buckets, key_cols)
    dmax = max(_duration_seconds(d) // slide_s for _, d in windows)

    bounds = buckets.groupBy(*key_cols).agg(
        F.min("_slot").alias("_lo"), F.max("_slot").alias("_hi")
    )
    probes = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_lo") - dmax, F.col("_hi") + dmax - 1)
        ).alias("_slot"),
    )
    looked = asof_cum_lookup(cums, probes, key_cols)

    wspec = ", ".join(
        f"struct('{label}' as label, {_duration_seconds(dur) // slide_s} as dslots)"
        for label, dur in windows
    )
    ends = (
        bounds.withColumn("_w", F.explode(F.expr(f"array({wspec})")))
        .select(
            *key_cols,
            F.col("_w.label").alias("window"),
            F.col("_w.dslots").alias("_dslots"),
            F.explode(
                F.sequence(F.col("_lo") + 1, F.col("_hi") + F.col("_w.dslots"))
            ).alias("_end"),
        )
    )
    hi = looked.select(
        *key_cols,
        F.col("_slot").alias("_hi_slot"),
        F.col("_cn").alias("_hn"),
        F.col("_cs").alias("_hs"),
        F.col("_csq").alias("_hsq"),
    )
    lo = looked.select(
        *key_cols,
        F.col("_slot").alias("_lo_slot"),
        F.col("_cn").alias("_ln"),
        F.col("_cs").alias("_ls"),
        F.col("_csq").alias("_lsq"),
    )
    j = (
        ends.withColumn("_hi_slot", F.col("_end") - 1)
        .withColumn("_lo_slot", F.col("_end") - 1 - F.col("_dslots"))
        .join(hi, [*key_cols, "_hi_slot"])
        .join(lo, [*key_cols, "_lo_slot"])
    )
    n = F.col("_hn") - F.col("_ln")
    s = F.col("_hs") - F.col("_ls")
    sq = F.col("_hsq") - F.col("_lsq")
    avg, std = _stats_from_moment_diff(n, s, sq)
    return (
        j.filter(n > 0)
        .select(
            (F.col("_end") * slide_s).cast("timestamp").alias("timestamp"),
            *key_cols,
            "window",
            avg.alias("avg_value"),
            std.alias("std_value"),
        )
    )


def zscore_asof_fast(
    ticks: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    windows: Sequence[tuple[str, str]] = REFERENCE_WINDOWS,
    slide_s: int = 10,
    max_stale_slots: int = 1,
    id_col: str | None = None,
) -> DataFrame:
    """Prefix-sum equivalent of operators/zscore.zscore_asof over
    moving_stats_flat: for each tick × window label, the z-score
    against the most recent non-empty window ending ≤ the tick's slot
    (falling back ≤ ``max_stale_slots``).

    Plan shape: 2 shuffles total (bucket agg; key-partitioned window
    functions + final broadcast-free sort-merge join on (key, slot)) —
    versus the naive plan's 669-way row expansion feeding a giant
    hash-agg plus join. Output verified equal to the naive operator
    (tests) and to the DuckDB oracle."""
    buckets = bucket_moments(ticks, ts_col, key_cols, value_col, slide_s)
    cums = cumulative_moments(buckets, key_cols)

    # Probe axis: every slot a lookup could reference — generated from
    # each key's [min,max] bucket range (cheap bounds agg, zero extra
    # shuffles) rather than distinct tick-derived slots (which costs
    # two distincts over ~rows-sized data; measured slower).
    dmax = max(_duration_seconds(d) // slide_s for _, d in windows)
    bounds = buckets.groupBy(*key_cols).agg(
        F.min("_slot").alias("_lo"), F.max("_slot").alias("_hi")
    )
    probes = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("_lo") - dmax - max_stale_slots - 1,
                F.col("_hi") + max_stale_slots,
            )
        ).alias("_slot"),
    )
    looked = asof_cum_lookup(cums, probes, key_cols)

    # One reference row per (tick, window-label, staleness, hi|lo): the
    # hi lookup is cum through the candidate end's last covered slot,
    # the lo lookup is cum through the slot just before the window.
    out_id = [F.col(id_col)] if id_col else []
    refs = []
    for label, dur in windows:
        dslots = _duration_seconds(dur) // slide_s
        for stale in range(max_stale_slots + 1):
            for kind, off in (("h", 1 + stale), ("l", 1 + stale + dslots)):
                refs.append(
                    f"struct('{label}' as label, "
                    f"'{kind}{stale}' as kind, _end0 - {off} as _slot)"
                )
    base = ticks.select(
        *out_id,
        F.col(ts_col).alias("timestamp"),
        *[F.col(k) for k in key_cols],
        F.col(value_col).alias("_v"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / slide_s).alias("_end0"),
    ).withColumn("_r", F.explode(F.expr(f"array({', '.join(refs)})")))

    joined = base.select(
        *out_id,
        "timestamp",
        *key_cols,
        "_v",
        F.col("_r.label").alias("_label"),
        F.col("_r.kind").alias("_kind"),
        F.col("_r._slot").alias("_slot"),
    ).join(looked, [*key_cols, "_slot"])

    def side(agg_col: str, kind: str):
        return F.max(F.when(F.col("_kind") == kind, F.col(agg_col)))

    # Single pivot per (tick, label): all stales in one aggregation, the
    # freshest non-empty candidate picked with when() — no second
    # shuffle, no row_number window.
    per_stale = []
    grouped = joined.groupBy(*out_id, "timestamp", *key_cols, "_v", "_label").agg(
        *[
            (side(c, f"{k}{st}") ).alias(f"_{c[1:]}_{k}{st}")
            for st in range(max_stale_slots + 1)
            for k in ("h", "l")
            for c in ("_cn", "_cs", "_csq")
        ]
    )
    for st in range(max_stale_slots + 1):
        n = F.col(f"_cn_h{st}") - F.col(f"_cn_l{st}")
        s = F.col(f"_cs_h{st}") - F.col(f"_cs_l{st}")
        sq = F.col(f"_csq_h{st}") - F.col(f"_csq_l{st}")
        avg, std = _stats_from_moment_diff(n, s, sq)
        per_stale.append((n, safe_zscore(F.col("_v"), avg, std)))
    z = F.lit(None).cast("double")
    n_any = F.lit(False)
    for n, zs in reversed(per_stale):
        z = F.when(n > 0, zs).otherwise(z)
        n_any = n_any | (n > 0)
    return (
        grouped.filter(n_any)
        .select(
            *out_id,
            "timestamp",
            *key_cols,
            F.col("_label").alias("window"),
            z.alias("zscore_value"),
        )
    )
