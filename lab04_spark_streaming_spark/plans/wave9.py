"""Round-9 wave (built in driver round 8): statistical testing,
mergeable sketches, graph triangles, lakehouse layout planning, and
curation-eval queries — the inferential layer a training-data pipeline
runs on top of the drift/mixing reports from waves 7-8: "is this
difference real?" (KS, Mann-Whitney, randomization test), "how
concentrated is activity?" (Gini), "how good is my blocking / my
layout / my half-dim index?" (blocking eval, zone-map pruning eval,
compaction packing, Matryoshka recall).

Cross-engine determinism (registry.py rules, same as waves 7-8):
  * every TEST DECISION (extreme-count, membership, bucket, rank) is
    pure BIGINT / exact-decimal arithmetic — cross-multiplied
    rationals instead of divisions, doubled midranks instead of .5
    fractions — so the emitted set can never flip on a ulp;
  * doubles appear only as stable_round(…) displays on top of those
    integer decisions;
  * DuckDB SUM(BIGINT)→HUGEINT is always re-cast to BIGINT (the r6
    red-stamp bug class);
  * windows are always partitioned (per pair / per type / per source)
    and ordered with a full deterministic tie-break.

Scale notes per query are in the docstrings; the standing rules from
waves 7-8 apply: candidate relations are key-bounded, scalar totals
are broadcast one-row relations, ordered scans ride distinct-value
compression (the window runs over the GRID, not the raw rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lab04_spark_streaming_spark.functions.guards import (
    sql_stable_round,
    stable_round,
)
from lab04_spark_streaming_spark.sources.files import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- two-sample Kolmogorov–Smirnov ----------------------------------------
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov D between the `value`
    distributions of every event-type pair — the distribution-shift
    test behind "did the metric's whole SHAPE move", not just its mean
    (source_kl_divergence covers categorical drift; this is the
    continuous twin). D·na·nb is an exact BIGINT
    (max |cum_a·nb − cum_b·na| over the merged sample points, the
    right-continuous ECDF convention, ties jump jointly), so the
    statistic is ulp-proof; `d` is a rounded display.

    Scale: the ECDF scan runs over the per-pair DISTINCT-value GRID
    (groupBy value first), not the raw rows — the window input is
    bounded by value cardinality × pairs, and each window is
    partitioned by pair. Pair tagging is two broadcast equi-joins
    (types² pair relation), never an OR-join (which would force a
    nested-loop over the fact)."""
    ev = _events(spark, sf_dir).select("event_type", "value")
    types = ev.select(F.col("event_type").alias("t")).distinct()
    pairs = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.t") < F.col("b.t"))
        .select(F.col("a.t").alias("t1"), F.col("b.t").alias("t2"))
    )
    tag_a = ev.join(
        F.broadcast(pairs), ev.event_type == pairs.t1
    ).select("t1", "t2", "value", F.lit(1).alias("is_a"))
    tag_b = ev.join(
        F.broadcast(pairs), ev.event_type == pairs.t2
    ).select("t1", "t2", "value", F.lit(0).alias("is_a"))
    grid = (
        tag_a.unionByName(tag_b)
        .groupBy("t1", "t2", "value")
        .agg(
            F.sum("is_a").alias("ca"),
            F.sum(1 - F.col("is_a")).alias("cb"),
        )
    )
    w = Window.partitionBy("t1", "t2").orderBy("value")
    wp = Window.partitionBy("t1", "t2")
    cum = grid.select(
        "t1",
        "t2",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wp).alias("na"),
        F.sum("cb").over(wp).alias("nb"),
    )
    return cum.groupBy("t1", "t2").agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max(
            F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
        ).alias("d_num"),
        stable_round(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")
                ).cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ),
            6,
        ).alias("d"),
    )


SQL_KS_TWO_SAMPLE = f"""
WITH types AS (SELECT DISTINCT event_type AS t FROM events),
pairs AS (
  SELECT a.t AS t1, b.t AS t2 FROM types a JOIN types b ON a.t < b.t
),
tagged AS (
  SELECT p.t1, p.t2, e.value, 1 AS is_a
  FROM events e JOIN pairs p ON e.event_type = p.t1
  UNION ALL
  SELECT p.t1, p.t2, e.value, 0 AS is_a
  FROM events e JOIN pairs p ON e.event_type = p.t2
),
grid AS (
  SELECT t1, t2, value,
         CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb
  FROM tagged GROUP BY t1, t2, value
),
cum AS (
  SELECT t1, t2,
         CAST(SUM(ca) OVER (PARTITION BY t1, t2 ORDER BY value) AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER (PARTITION BY t1, t2 ORDER BY value) AS BIGINT) AS cum_b,
         CAST(SUM(ca) OVER (PARTITION BY t1, t2) AS BIGINT) AS na,
         CAST(SUM(cb) OVER (PARTITION BY t1, t2) AS BIGINT) AS nb
  FROM grid
)
SELECT t1, t2,
       MAX(na) AS na,
       MAX(nb) AS nb,
       MAX(ABS(cum_a * nb - cum_b * na)) AS d_num,
       {sql_stable_round(
           "MAX(CAST(ABS(cum_a * nb - cum_b * na) AS DOUBLE)"
           " / CAST(na * nb AS DOUBLE))", 6)} AS d
FROM cum GROUP BY t1, t2
"""


# --- Mann–Whitney U / AUC --------------------------------------------------
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (≡ rank-sum, ≡ AUC) for `value` between every
    event-type pair — the nonparametric "which group is stochastically
    larger" companion to the KS shape test and the Welch mean test
    (ab_test_welch). Tie handling is exact midranks, kept integral by
    doubling: a tie group of size c starting after `prev` items has
    2·midrank = 2·prev + c + 1, so 2·R_a = Σ ca·(2·prev + c + 1) and
    u2 = 2·R_a − na·(na+1) are BIGINTs; `auc` = u2/(2·na·nb) is the
    display (AUC 0.5 = no stochastic dominance).

    Scale: identical shape to the KS query — per-pair distinct-value
    grid, partitioned window, broadcast pair relation; the rank scan
    never touches raw rows."""
    ev = _events(spark, sf_dir).select("event_type", "value")
    types = ev.select(F.col("event_type").alias("t")).distinct()
    pairs = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.t") < F.col("b.t"))
        .select(F.col("a.t").alias("t1"), F.col("b.t").alias("t2"))
    )
    tag_a = ev.join(
        F.broadcast(pairs), ev.event_type == pairs.t1
    ).select("t1", "t2", "value", F.lit(1).alias("is_a"))
    tag_b = ev.join(
        F.broadcast(pairs), ev.event_type == pairs.t2
    ).select("t1", "t2", "value", F.lit(0).alias("is_a"))
    grid = (
        tag_a.unionByName(tag_b)
        .groupBy("t1", "t2", "value")
        .agg(
            F.sum("is_a").alias("ca"),
            F.sum(1 - F.col("is_a")).alias("cb"),
        )
        .withColumn("c", F.col("ca") + F.col("cb"))
    )
    w = Window.partitionBy("t1", "t2").orderBy("value")
    wp = Window.partitionBy("t1", "t2")
    ranked = grid.select(
        "t1",
        "t2",
        "ca",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("prev"),
        F.sum("ca").over(wp).alias("na"),
        F.sum("cb").over(wp).alias("nb"),
    )
    return (
        ranked.groupBy("t1", "t2")
        .agg(
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
            F.sum(
                F.col("ca") * (2 * F.col("prev") + F.col("c") + 1)
            ).alias("r2a"),
        )
        .select(
            "t1",
            "t2",
            "na",
            "nb",
            (F.col("r2a") - F.col("na") * (F.col("na") + 1)).alias("u2"),
            stable_round(
                (F.col("r2a") - F.col("na") * (F.col("na") + 1)).cast("double")
                / (2 * F.col("na") * F.col("nb")).cast("double"),
                6,
            ).alias("auc"),
        )
    )


SQL_MANN_WHITNEY_U = f"""
WITH types AS (SELECT DISTINCT event_type AS t FROM events),
pairs AS (
  SELECT a.t AS t1, b.t AS t2 FROM types a JOIN types b ON a.t < b.t
),
tagged AS (
  SELECT p.t1, p.t2, e.value, 1 AS is_a
  FROM events e JOIN pairs p ON e.event_type = p.t1
  UNION ALL
  SELECT p.t1, p.t2, e.value, 0 AS is_a
  FROM events e JOIN pairs p ON e.event_type = p.t2
),
grid AS (
  SELECT t1, t2, value,
         CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM tagged GROUP BY t1, t2, value
),
ranked AS (
  SELECT t1, t2, ca, c,
         CAST(SUM(c) OVER (PARTITION BY t1, t2 ORDER BY value) - c AS BIGINT) AS prev,
         CAST(SUM(ca) OVER (PARTITION BY t1, t2) AS BIGINT) AS na,
         CAST(SUM(cb) OVER (PARTITION BY t1, t2) AS BIGINT) AS nb
  FROM grid
),
agg AS (
  SELECT t1, t2, MAX(na) AS na, MAX(nb) AS nb,
         CAST(SUM(ca * (2 * prev + c + 1)) AS BIGINT) AS r2a
  FROM ranked GROUP BY t1, t2
)
SELECT t1, t2, na, nb,
       r2a - na * (na + 1) AS u2,
       {sql_stable_round(
           "CAST(r2a - na * (na + 1) AS DOUBLE)"
           " / CAST(2 * na * nb AS DOUBLE)", 6)} AS auc
FROM agg
"""


# --- hash-randomization test ----------------------------------------------
_RAND_TEST_A = "click"
_RAND_TEST_B = "view"
_RAND_TEST_PERMS = 100


def q_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-exchangeability randomization test for mean(value),
    click vs view: re-label each event by a deterministic md5 coin per
    (permutation, event_id), recompute the mean difference, and count
    permutations at least as extreme as the observed split. Everything
    that decides `n_extreme` is exact: group sums are per-row
    DECIMAL(30,6) casts (order-independent), and the comparison
    |Δ_perm| ≥ |Δ_obs| is cross-multiplied to
    |sa·nb − sb·na|·(na0·nb0) ≥ |sa0·nb0 − sb0·na0|·(na·nb) — no
    division anywhere. p_value = (1 + n_extreme)/(1 + P) is the
    standard add-one permutation estimate, emitted as a display.

    Scale: the fact is filtered to the two arms BEFORE the
    permutation fan-out (predicate reaches the scan), the P-row
    permutation index is a broadcast relation, and the fan-out is a
    map-side ×P expansion feeding one partial-aggregated groupBy(p) —
    shuffle rows = P, not P·n."""
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin(_RAND_TEST_A, _RAND_TEST_B))
        .select("event_id", "event_type", "value")
    )
    dec = F.col("value").cast("decimal(30,6)")
    obs = ev.groupBy().agg(
        F.sum(F.when(F.col("event_type") == _RAND_TEST_A, dec)).alias("sa0"),
        F.count(F.when(F.col("event_type") == _RAND_TEST_A, 1)).alias("na0"),
        F.sum(F.when(F.col("event_type") == _RAND_TEST_B, dec)).alias("sb0"),
        F.count(F.when(F.col("event_type") == _RAND_TEST_B, 1)).alias("nb0"),
    )
    perms = spark.range(_RAND_TEST_PERMS).select(F.col("id").alias("p"))
    coin = F.expr(
        "pmod(cast(conv(substring(md5(concat(cast(p as string), '|',"
        " cast(event_id as string))), 1, 8), 16, 10) as bigint), 2)"
    )
    per = (
        ev.crossJoin(F.broadcast(perms))
        .withColumn("is_a", coin == 0)
        .groupBy("p")
        .agg(
            F.sum(F.when(F.col("is_a"), dec)).alias("sa"),
            F.count(F.when(F.col("is_a"), 1)).alias("na"),
            F.sum(F.when(~F.col("is_a"), dec)).alias("sb"),
            F.count(F.when(~F.col("is_a"), 1)).alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
    )
    joined = per.crossJoin(F.broadcast(obs))
    extreme = F.abs(
        F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")
    ) * (F.col("na0") * F.col("nb0")) >= F.abs(
        F.col("sa0") * F.col("nb0") - F.col("sb0") * F.col("na0")
    ) * (
        F.col("na") * F.col("nb")
    )
    return joined.groupBy().agg(
        F.count(F.lit(1)).alias("n_perms"),
        F.sum(F.when(extreme, 1).otherwise(0)).alias("n_extreme"),
        stable_round(
            (1 + F.sum(F.when(extreme, 1).otherwise(0))).cast("double")
            / (1 + F.count(F.lit(1))).cast("double"),
            6,
        ).alias("p_value"),
    )


SQL_RANDOMIZATION_TEST = f"""
WITH ev AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(30,6)) AS v
  FROM events WHERE event_type IN ('{_RAND_TEST_A}', '{_RAND_TEST_B}')
),
obs AS (
  SELECT SUM(CASE WHEN event_type = '{_RAND_TEST_A}' THEN v END) AS sa0,
         COUNT(CASE WHEN event_type = '{_RAND_TEST_A}' THEN 1 END) AS na0,
         SUM(CASE WHEN event_type = '{_RAND_TEST_B}' THEN v END) AS sb0,
         COUNT(CASE WHEN event_type = '{_RAND_TEST_B}' THEN 1 END) AS nb0
  FROM ev
),
per AS (
  SELECT t.p,
         SUM(CASE WHEN coin = 0 THEN v END) AS sa,
         COUNT(CASE WHEN coin = 0 THEN 1 END) AS na,
         SUM(CASE WHEN coin <> 0 THEN v END) AS sb,
         COUNT(CASE WHEN coin <> 0 THEN 1 END) AS nb
  FROM (
    SELECT ev.v AS v, pp.p AS p,
           CAST(('0x' || substring(md5(CAST(pp.p AS VARCHAR) || '|' ||
                 CAST(ev.event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS coin
    FROM ev, range({_RAND_TEST_PERMS}) AS pp(p)
  ) AS t
  GROUP BY t.p
  HAVING COUNT(CASE WHEN coin = 0 THEN 1 END) > 0
     AND COUNT(CASE WHEN coin <> 0 THEN 1 END) > 0
),
flagged AS (
  SELECT CASE WHEN ABS(sa * nb - sb * na) * (na0 * nb0)
              >= ABS(sa0 * nb0 - sb0 * na0) * (na * nb)
         THEN 1 ELSE 0 END AS ex
  FROM per, obs
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_perms,
       CAST(SUM(ex) AS BIGINT) AS n_extreme,
       {sql_stable_round(
           "CAST(1 + SUM(ex) AS DOUBLE) / CAST(1 + COUNT(*) AS DOUBLE)",
           6)} AS p_value
FROM flagged
"""


# --- Gini concentration ----------------------------------------------------
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity within each event type —
    the inequality complement to length_theil_by_source (Theil is
    decomposable, Gini is the headline number reviewers expect). Uses
    the sorted-rank identity G = (2·Σ i·x_i − (n+1)·Σ x_i)/(n·Σ x_i)
    with x ascending; the numerator `gini_num` is an exact BIGINT
    (ties contribute x·Σi regardless of intra-tie order, and the
    (cnt, user_id) sort is fully deterministic anyway), `gini` is the
    display.

    Scale: the window ranks USERS (bounded: one row per (type, user)
    after the pre-aggregation), partitioned by event type."""
    ucnt = (
        _events(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("cnt", "user_id")
    ranked = ucnt.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cnt").alias("total_events"),
            F.sum(F.col("i") * F.col("cnt")).alias("ix"),
        )
        .select(
            "event_type",
            "n_users",
            "total_events",
            (
                2 * F.col("ix") - (F.col("n_users") + 1) * F.col("total_events")
            ).alias("gini_num"),
            stable_round(
                (
                    2 * F.col("ix")
                    - (F.col("n_users") + 1) * F.col("total_events")
                ).cast("double")
                / (F.col("n_users") * F.col("total_events")).cast("double"),
                6,
            ).alias("gini"),
        )
    )


SQL_GINI_CONCENTRATION = f"""
WITH ucnt AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT event_type, cnt,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY cnt, user_id) AS BIGINT) AS i
  FROM ucnt
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(cnt) AS BIGINT) AS total_events,
         CAST(SUM(i * cnt) AS BIGINT) AS ix
  FROM ranked GROUP BY event_type
)
SELECT event_type, n_users, total_events,
       2 * ix - (n_users + 1) * total_events AS gini_num,
       {sql_stable_round(
           "CAST(2 * ix - (n_users + 1) * total_events AS DOUBLE)"
           " / CAST(n_users * total_events AS DOUBLE)", 6)} AS gini
FROM agg
"""


# --- KMV distinct sketch ---------------------------------------------------
_KMV_K = 256


def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-token sketch per source, plus
    the MERGED all-corpus sketch built from the per-source sketches
    alone — the mergeability property that makes KMV (like the HLL
    already in plans/mining.py) a per-partition/per-day sketch you can
    roll up without re-reading data. Estimator: with k-th smallest
    32-bit hash h_k, distinct ≈ (k−1)·2³²/h_k; when a scope has < k
    distinct hashes the sketch is exact and the estimate IS the count.
    The k-th hash selection is an integer rank over DISTINCT hash
    values; `est` and `rel_err` are displays next to the exact truth.

    Scale: per-source candidate space is the source's distinct token
    set (vocab-bounded after the first groupBy); the merged sketch
    ranks only the ≤ sources·k surviving sketch rows — the raw token
    relation is never re-scanned, which is the whole point."""
    toks = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.explode(
                F.expr("array_distinct(array_remove("
                       "split(lower(text), '[^a-z0-9]+'), ''))")
            ).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "source",
            "tok",
            F.expr(
                "cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)"
            ).alias("h"),
        )
    )
    # distinct hash values per scope (KMV operates on the hash SET)
    per_src_h = toks.select("source", "h").distinct()
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("n_exact")
    )
    w = Window.partitionBy("source").orderBy("h")
    sketch = per_src_h.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= _KMV_K
    )
    # merged sketch: k smallest of the UNION of per-source sketch rows
    merged_h = sketch.select("h").distinct()
    wg = Window.partitionBy(F.lit(1)).orderBy("h")
    merged = (
        merged_h.withColumn("r", F.row_number().over(wg))
        .filter(F.col("r") <= _KMV_K)
        .select(F.lit("__all__").alias("source"), "h", "r")
    )
    exact_all = (
        toks.select("tok")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .select(F.lit("__all__").alias("source"), "n_exact")
    )
    both = sketch.select("source", "h", "r").unionByName(merged)
    stats = both.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(F.when(F.col("r") == _KMV_K, F.col("h"))).alias("hk"),
    )
    est = F.when(
        F.col("n_sketch") < _KMV_K, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        * F.lit(4294967296.0)
        / F.col("hk").cast("double")
    )
    return (
        stats.join(exact.unionByName(exact_all), "source")
        .select(
            "source",
            "n_exact",
            "n_sketch",
            F.coalesce("hk", F.lit(-1)).alias("kth_hash"),
            stable_round(est, 2).alias("est"),
            stable_round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                4,
            ).alias("rel_err"),
        )
    )


SQL_KMV_DISTINCT_SKETCH = f"""
WITH toks AS (
  SELECT source, tok,
         CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM (
    SELECT source, UNNEST(list_distinct(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> x <> ''))) AS tok
    FROM documents
  ) GROUP BY source, tok, h
),
per_src_h AS (SELECT DISTINCT source, h FROM toks),
exact AS (
  SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact
  FROM toks GROUP BY source
),
sketch AS (
  SELECT source, h, r FROM (
    SELECT source, h,
           CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS BIGINT) AS r
    FROM per_src_h
  ) WHERE r <= {_KMV_K}
),
merged AS (
  SELECT '__all__' AS source, h, r FROM (
    SELECT h, CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS r
    FROM (SELECT DISTINCT h FROM sketch)
  ) WHERE r <= {_KMV_K}
),
exact_all AS (
  SELECT '__all__' AS source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact
  FROM toks
),
allrows AS (
  SELECT source, h, r FROM sketch UNION ALL SELECT source, h, r FROM merged
),
stats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sketch,
         MAX(CASE WHEN r = {_KMV_K} THEN h END) AS hk
  FROM allrows GROUP BY source
),
est_t AS (
  SELECT s.source, e.n_exact, s.n_sketch,
         COALESCE(s.hk, -1) AS kth_hash,
         CASE WHEN s.n_sketch < {_KMV_K}
              THEN CAST(s.n_sketch AS DOUBLE)
              ELSE {float(_KMV_K - 1)} * 4294967296.0 / CAST(s.hk AS DOUBLE)
         END AS est_raw
  FROM stats s
  JOIN (SELECT * FROM exact UNION ALL SELECT * FROM exact_all) e
    ON s.source = e.source
)
SELECT source, n_exact, n_sketch, kth_hash,
       {sql_stable_round("est_raw", 2)} AS est,
       {sql_stable_round(
           "ABS(est_raw - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)",
           4)} AS rel_err
FROM est_t
"""


# --- weighted Bernoulli (Poisson) sampling ---------------------------------
_WSAMPLE_TARGET = 0.2  # expected fraction of docs kept


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional Poisson sampling of documents: inclusion
    probability π_i = n_target·w_i/Σw with w = n_chars — the standard
    size-biased sampler behind "sample 10 B tokens, long docs
    proportionally more likely" (PPS sampling; Ohlsson 1998). The
    inclusion TEST is all-BIGINT: keep iff h_i·Σw < n_target·w_i·2³²
    with h_i a 32-bit md5 of the doc key — no division, no double, so
    the kept SET is bit-stable across engines and reruns. π is a
    display. (At petabyte Σw the products want DECIMAL(38) — the
    comparison stays exact; noted, not needed at lab scale.)

    Scale: one broadcast 1-row total, one scan, no shuffle for the
    filter itself. π_i > 1 docs (w_i > Σw/n_target) are always kept —
    the min(1, ·) branch falls out of the same inequality."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    tot = docs.agg(
        F.sum("n_chars").alias("sw"), F.count(F.lit(1)).alias("n_docs")
    )
    n_target = F.floor(
        F.col("n_docs") * F.lit(int(_WSAMPLE_TARGET * 1000)) / F.lit(1000)
    )
    h = F.expr(
        "cast(conv(substring(md5(concat('ws|', cast(doc_id as string))),"
        " 1, 8), 16, 10) as bigint)"
    )
    joined = docs.crossJoin(F.broadcast(tot)).withColumn(
        "nt", n_target
    )
    kept = joined.filter(
        h * F.col("sw") < F.col("nt") * F.col("n_chars") * F.lit(4294967296)
    )
    return kept.select(
        "doc_id",
        "source",
        "n_chars",
        stable_round(
            F.least(
                F.lit(1.0),
                (F.col("nt") * F.col("n_chars")).cast("double")
                / F.col("sw").cast("double"),
            ),
            6,
        ).alias("pi"),
    )


SQL_WEIGHTED_SAMPLE = f"""
WITH tot AS (
  SELECT CAST(SUM(n_chars) AS BIGINT) AS sw,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents
),
j AS (
  SELECT d.doc_id, d.source, d.n_chars, t.sw,
         CAST(FLOOR(t.n_docs * {int(_WSAMPLE_TARGET * 1000)} / 1000) AS BIGINT) AS nt,
         CAST(('0x' || substring(md5('ws|' || CAST(d.doc_id AS VARCHAR)),
               1, 8)) AS BIGINT) AS h
  FROM documents d, tot t
)
SELECT doc_id, source, n_chars,
       {sql_stable_round(
           "LEAST(1.0, CAST(nt * n_chars AS DOUBLE) / CAST(sw AS DOUBLE))",
           6)} AS pi
FROM j
WHERE h * sw < nt * n_chars * 4294967296
"""


# --- triangle counting -----------------------------------------------------
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle / wedge census of the part co-purchase graph
    (parts co-occurring in an order are adjacent) — the clustering
    structure probe next to k-core and label propagation in
    plans/mining.py. Node-iterator with DEGREE ORIENTATION: every
    edge is directed from its lower-(degree, id) endpoint, so each
    wedge (a→b, a→c with b<c in the same order) is generated exactly
    once and closed by one semi-join on the oriented edge set —
    per-node fan-out is bounded by out-degree ≤ O(√m) on any graph
    (the classic Schank–Wagner bound), never by raw degree, which is
    what makes this survive power-law hubs at scale. All counts are
    BIGINT; global_clustering = 3·triangles/wedges is the display.

    Scale: pair generation is a per-order self-join (bounded by order
    width); the edge relation is distinct pairs; the wedge join and
    the closing semi-join shuffle on node keys only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "ok")
        .filter(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    deg = (
        pairs.select(F.col("u").alias("x"))
        .unionAll(pairs.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = (
        pairs.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.s") == F.col("e2.s"))
        .filter(F.col("e1.t") < F.col("e2.t"))
        .select(F.col("e1.t").alias("b"), F.col("e2.t").alias("c"))
    )
    closed = wedges.join(
        oriented.select(
            F.col("s").alias("b"), F.col("t").alias("c")
        ).unionAll(
            oriented.select(F.col("t").alias("b"), F.col("s").alias("c"))
        ).distinct(),
        ["b", "c"],
        "left_semi",
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n_wedges"))
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        n_edges.crossJoin(n_wedges)
        .crossJoin(n_tri)
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            stable_round(
                F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                    3.0
                    * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double")
                ),
                6,
            ).alias("global_clustering"),
        )
    )


SQL_TRIANGLE_COUNT = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pairs AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM pairs UNION ALL SELECT v AS x FROM pairs
  ) GROUP BY x
),
oriented AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND p.u < p.v)
              THEN p.u ELSE p.v END AS s,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND p.u < p.v)
              THEN p.v ELSE p.u END AS t
  FROM pairs p JOIN deg du ON p.u = du.x JOIN deg dv ON p.v = dv.x
),
wedges AS (
  SELECT e1.t AS b, e2.t AS c
  FROM oriented e1 JOIN oriented e2
    ON e1.s = e2.s AND e1.t < e2.t
),
undirected AS (
  SELECT s AS b, t AS c FROM oriented
  UNION SELECT t AS b, s AS c FROM oriented
),
closed AS (
  SELECT w.b, w.c FROM wedges w
  WHERE EXISTS (SELECT 1 FROM undirected u WHERE u.b = w.b AND u.c = w.c)
),
agg AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM closed) AS n_triangles
)
SELECT n_edges, n_wedges, n_triangles,
       {sql_stable_round(
           "CASE WHEN n_wedges = 0 THEN 0.0 ELSE"
           " 3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE) END",
           6)} AS global_clustering
FROM agg
"""


# --- compaction bin packing ------------------------------------------------
_COMPACT_TARGET_CHARS = 4096


def q_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan per source: treat each document as a
    small file of n_chars bytes and assign it to an output bin by
    running-sum chunking — bin = floor(exclusive-prefix-sum / target)
    in doc_id order. This is the one-pass distributable approximation
    of next-fit bin packing every lakehouse compactor (Delta OPTIMIZE,
    Iceberg rewrite) actually uses: bins can overshoot by at most one
    trailing file, and the assignment needs only a per-source prefix
    sum, no sequential loop. All-BIGINT; output is the per-bin
    manifest (file count, bytes) a rewrite job would execute.

    Scale: partitioned window over (source) ordered by doc_id; at
    petabyte scale the same shape rides the chunked prefix-sum carry
    pattern (README 'running scans')."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = docs.withColumn(
        "bin",
        F.floor(
            (F.sum("n_chars").over(w) - F.col("n_chars"))
            / F.lit(_COMPACT_TARGET_CHARS)
        ),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SQL_COMPACTION_BINS = f"""
WITH binned AS (
  SELECT source, doc_id, n_chars,
         CAST(FLOOR(CAST(SUM(n_chars) OVER (
             PARTITION BY source ORDER BY doc_id) - n_chars AS BIGINT)
             / {_COMPACT_TARGET_CHARS}) AS BIGINT) AS bin
  FROM documents
)
SELECT source, bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM binned GROUP BY source, bin
"""


# --- zone-map pruning eval -------------------------------------------------
_ZONEMAP_THRESHOLDS = [50.0, 100.0, 150.0, 200.0, 300.0]


def q_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) pruning effectiveness report:
    partition events by day, collect per-day min/max of `value`, and
    for each candidate predicate `value >= q` report how many
    day-partitions a scan could skip outright (day_max < q) and how
    many rows those skipped partitions hold — the number that tells
    you whether sorting/z-ordering by this column (zorder_keys) is
    worth the rewrite. Decisions are double-vs-literal comparisons
    with identical constants in both engines (exact), counts BIGINT,
    fractions display.

    Scale: one pass builds the per-partition stats relation (tiny);
    the threshold grid is a broadcast literal relation — the fact
    table is scanned once regardless of grid size."""
    stats = (
        _events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.max("value").alias("vmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    thresholds = spark.createDataFrame(
        [(q,) for q in _ZONEMAP_THRESHOLDS], ["q"]
    )
    j = stats.crossJoin(F.broadcast(thresholds))
    return (
        j.groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.when(F.col("vmax") < F.col("q"), 1).otherwise(0)).alias(
                "n_pruned"
            ),
            F.sum(
                F.when(F.col("vmax") < F.col("q"), F.col("n_rows")).otherwise(0)
            ).alias("rows_skipped"),
        )
        .select(
            "q",
            "n_parts",
            "n_pruned",
            "rows_skipped",
            stable_round(
                F.col("n_pruned").cast("double")
                / F.col("n_parts").cast("double"),
                6,
            ).alias("prune_frac"),
        )
    )


SQL_ZONEMAP_PRUNING = f"""
WITH stats AS (
  SELECT CAST(ts AS DATE) AS day, MAX(value) AS vmax,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY day
),
grid AS (
  SELECT CAST(UNNEST([{", ".join(str(q) for q in _ZONEMAP_THRESHOLDS)}]) AS DOUBLE) AS q
)
SELECT g.q,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN s.vmax < g.q THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
       CAST(SUM(CASE WHEN s.vmax < g.q THEN s.n_rows ELSE 0 END) AS BIGINT)
         AS rows_skipped,
       {sql_stable_round(
           "CAST(SUM(CASE WHEN s.vmax < g.q THEN 1 ELSE 0 END) AS DOUBLE)"
           " / CAST(COUNT(*) AS DOUBLE)", 6)} AS prune_frac
FROM stats s, grid g
GROUP BY g.q
"""


def specs():
    from lab04_spark_streaming_spark.registry import QuerySpec

    return [
        QuerySpec("ks_two_sample", q_ks_two_sample, SQL_KS_TWO_SAMPLE),
        QuerySpec("mann_whitney_u", q_mann_whitney_u, SQL_MANN_WHITNEY_U),
        QuerySpec(
            "randomization_test", q_randomization_test, SQL_RANDOMIZATION_TEST
        ),
        QuerySpec(
            "gini_concentration", q_gini_concentration, SQL_GINI_CONCENTRATION
        ),
        QuerySpec(
            "kmv_distinct_sketch", q_kmv_distinct_sketch, SQL_KMV_DISTINCT_SKETCH
        ),
        QuerySpec("weighted_sample", q_weighted_sample, SQL_WEIGHTED_SAMPLE),
        QuerySpec("triangle_count", q_triangle_count, SQL_TRIANGLE_COUNT),
        QuerySpec("compaction_bins", q_compaction_bins, SQL_COMPACTION_BINS),
        QuerySpec("zonemap_pruning", q_zonemap_pruning, SQL_ZONEMAP_PRUNING),
    ]
