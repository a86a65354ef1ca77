"""Round-14 wave (built in driver round 9): distribution/causal/IR
completions around existing families — a Lorenz concentration curve
(beside Gini, and the first consumer of operators/ranks.global_ntile),
a t-closeness release audit (beside k-anonymity/l-diversity),
difference-in-differences and IPW ATEs (beside stratified_ate/CUPED),
delete-one-bucket jackknife errors (beside the Poisson bootstrap),
theta-sketch-style KMV set operations (beside kmv_distinct_sketch),
MRR and Dirichlet query-likelihood ranking (beside BM25 + NDCG/MAP),
calibration ECE (beside the quality classifier), and an RFF-MMD
two-sample statistic over the embeddings (beside KS/MWU).

House determinism rules throughout: counts/ranks are BIGINT, money
sums ride per-row decimal casts, embedding components live on the
1e-7 integer grid (operators/similarity's quantization), tiny
double reductions ride per-term decimal casts, transcendentals only
inside display-rounded or decimal-cast terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lab04_spark_streaming_spark.functions.guards import (
    sql_stable_round,
    stable_round,
)
from lab04_spark_streaming_spark.operators.ranks import global_ntile
from lab04_spark_streaming_spark.operators.textops import (
    expr_tokens,
    sql_tokens,
)
from lab04_spark_streaming_spark.sources.files import load_table

_SPARK_TOKS = expr_tokens("text")
_TOKS = sql_tokens("text")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- Lorenz concentration curve ---------------------------------------------
_LORENZ_BUCKETS = 10


def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of user spend concentration (Lorenz 1905, public)
    — the curve the Gini query (wave9) integrates: users are ranked
    by their exact decimal spend and cut into {n} equal-population
    buckets, and each bucket reports its population share and the
    CUMULATIVE share of total spend up to it ("the bottom 30% of
    users hold 4% of spend"). The bucket cut is
    operators/ranks.global_ntile — the distributed exact ntile this
    query exists to exercise at the query layer; spend is an exact
    DECIMAL sum end to end, and the cumulative share is the only
    double (one division, display-rounded).

    Scale: per-user spend shuffles on user_id; the ntile is the
    range-partitioned two-pass rank; the cumulative window runs over
    the {n}-row bucket relation only."""
    users = _events(spark, sf_dir).groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(30,6)")).alias("s")
    )
    bucketed = global_ntile(
        users, _LORENZ_BUCKETS, "s", "user_id", bucket_col="decile"
    )
    per = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("s").alias("ds"),
    )
    tot = per.agg(F.sum("ds").alias("total"))
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.withColumn("cum", F.sum("ds").over(wcum))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            stable_round(F.col("ds").cast("double"), 4).alias(
                "bucket_value"
            ),
            stable_round(
                F.col("cum").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("cum_share"),
        )
    )


q_lorenz_curve.__doc__ = q_lorenz_curve.__doc__.format(n=_LORENZ_BUCKETS)


SQL_LORENZ_CURVE = f"""
WITH u AS (
  SELECT user_id, SUM(CAST(value AS DECIMAL(30,6))) AS s
  FROM events GROUP BY user_id
),
b AS (
  SELECT s, ntile({_LORENZ_BUCKETS}) OVER (ORDER BY s, user_id) AS decile
  FROM u
),
per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users, SUM(s) AS ds
  FROM b GROUP BY decile
),
tot AS (SELECT SUM(ds) AS total FROM per)
SELECT CAST(decile AS INTEGER) AS decile, n_users,
       {sql_stable_round("CAST(ds AS DOUBLE)", 4)} AS bucket_value,
       {sql_stable_round(
           "CAST(SUM(ds) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
           " PRECEDING AND CURRENT ROW) AS DOUBLE)"
           " / CAST(t.total AS DOUBLE)", 6)} AS cum_share
FROM per CROSS JOIN tot t
"""


# --- t-closeness release audit ----------------------------------------------
_TCLOSE_BIN_CENTS = 5_000  # 50.00-wide value bins
_TCLOSE_BINS = 10
_TCLOSE_T = 0.2


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release audit (Li, Li & Venkatasubramanian 2007,
    public) — the step beyond k-anonymity (group size, wave8) and
    l-diversity (distinct sensitive values, wave9): an event_type
    release cell leaks when the DISTRIBUTION of its sensitive numeric
    attribute strays from the global one, so each cell reports the
    Earth Mover's Distance between its value-bin histogram and the
    corpus histogram over the ordered bins (EMD over an ordered
    1-D histogram = mean absolute difference of the two CDFs).
    Values land in exact integer-cent bins (floor(value·100+0.5)
    div {w}, capped at {b}); bin probabilities are exact-count
    ratios; the CDF runs over the fixed {b}+1-bin grid per cell and
    the final EMD sum rides per-term decimal casts. at_risk flags
    EMD > t = {t}.

    Scale: two grouped counts (cell×bin, bin) + a broadcast
    |cells|×{b}-row grid; every window is over the fixed bin grid."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.least(
            (
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
                / F.lit(_TCLOSE_BIN_CENTS)
            ).cast("bigint"),
            F.lit(_TCLOSE_BINS - 1),
        ).alias("bin"),
    )
    cell = ev.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    glob = ev.groupBy("bin").agg(F.count(F.lit(1)).alias("g"))
    n_tot = ev.agg(F.count(F.lit(1)).alias("n"))
    cell_tot = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cell")
    )
    # complete (cell, bin) grid so zero bins contribute to the CDFs
    grid = (
        cell_tot.select("event_type")
        .crossJoin(
            F.broadcast(
                spark.range(_TCLOSE_BINS).select(F.col("id").alias("bin"))
            )
        )
        .join(cell, ["event_type", "bin"], "left_outer")
        .join(F.broadcast(glob), "bin", "left_outer")
        .join(F.broadcast(cell_tot), "event_type")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "event_type",
            "bin",
            (
                F.coalesce("c", F.lit(0)).cast("double")
                / F.col("n_cell").cast("double")
            ).alias("q"),
            (
                F.coalesce("g", F.lit(0)).cast("double")
                / F.col("n").cast("double")
            ).alias("p"),
            "n_cell",
        )
    )
    wcdf = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    emd_term = (
        F.abs(F.sum("q").over(wcdf) - F.sum("p").over(wcdf))
        / F.lit(float(_TCLOSE_BINS - 1))
    ).cast("decimal(20,12)")
    return (
        grid.withColumn("_d", emd_term)
        .groupBy("event_type")
        .agg(
            F.max("n_cell").alias("n_cell"),
            F.sum("_d").cast("double").alias("_emd"),
        )
        .select(
            "event_type",
            "n_cell",
            stable_round(F.col("_emd"), 6).alias("emd"),
            (F.col("_emd") > _TCLOSE_T).alias("at_risk"),
        )
    )


q_t_closeness_audit.__doc__ = q_t_closeness_audit.__doc__.format(
    w=_TCLOSE_BIN_CENTS, b=_TCLOSE_BINS - 1, t=_TCLOSE_T
)


SQL_T_CLOSENESS_AUDIT = f"""
WITH ev AS (
  SELECT event_type,
         LEAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                 // {_TCLOSE_BIN_CENTS},
               {_TCLOSE_BINS - 1}) AS bin
  FROM events
),
cell AS (
  SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
  FROM ev GROUP BY event_type, bin
),
gbin AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS g FROM ev GROUP BY bin),
ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
ctot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cell
  FROM ev GROUP BY event_type
),
grid AS (
  SELECT ct.event_type, b.bin,
         CAST(COALESCE(cell.c, 0) AS DOUBLE) / ct.n_cell AS q,
         CAST(COALESCE(gbin.g, 0) AS DOUBLE) / ntot.n AS p,
         ct.n_cell
  FROM ctot ct
  CROSS JOIN (SELECT UNNEST(generate_series(0, {_TCLOSE_BINS - 1})) AS bin) b
  LEFT JOIN cell ON cell.event_type = ct.event_type AND cell.bin = b.bin
  LEFT JOIN gbin ON gbin.bin = b.bin
  CROSS JOIN ntot
),
terms AS (
  SELECT event_type, n_cell,
         CAST(abs(
           SUM(q) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - SUM(p) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ) / {float(_TCLOSE_BINS - 1)} AS DECIMAL(20,12)) AS d
  FROM grid
)
SELECT event_type, MAX(n_cell) AS n_cell,
       {sql_stable_round("CAST(SUM(d) AS DOUBLE)", 6)} AS emd,
       CAST(SUM(d) AS DOUBLE) > {_TCLOSE_T} AS at_risk
FROM terms GROUP BY event_type
"""


# --- difference-in-differences ----------------------------------------------
_DID_CUTOFF = "2024-01-16 00:00:00"


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences treatment effect (Card & Krueger
    1994 / canonical two-period two-group DiD, public): arm =
    user_id % 2, period = before/after the mid-month cutoff, outcome
    = mean event value per cell. DiD = (ȳ_T,post − ȳ_T,pre) −
    (ȳ_C,post − ȳ_C,pre) — removes time-invariant arm differences
    AND the common time trend that a naive post-period
    difference-of-means inherits. One pass: each of the four cell
    means is an exact decimal sum / BIGINT count; the four divisions
    and three subtractions are the only doubles (display-rounded).

    Scale: a single aggregate over the fact — no joins, no windows,
    one shuffle-free partial-agg reduction to one row."""
    post = (F.col("ts") >= F.lit(_DID_CUTOFF)).cast("int")
    arm = (F.col("user_id") % 2).cast("int")
    dec = F.col("value").cast("decimal(30,6)")

    def cell(a: int, p: int, what: str):
        cond = (arm == a) & (post == p)
        if what == "s":
            return F.sum(F.when(cond, dec))
        return F.count(F.when(cond, F.lit(1)))

    agg = _events(spark, sf_dir).agg(
        cell(1, 0, "s").alias("s_t_pre"),
        cell(1, 0, "n").alias("n_t_pre"),
        cell(1, 1, "s").alias("s_t_post"),
        cell(1, 1, "n").alias("n_t_post"),
        cell(0, 0, "s").alias("s_c_pre"),
        cell(0, 0, "n").alias("n_c_pre"),
        cell(0, 1, "s").alias("s_c_post"),
        cell(0, 1, "n").alias("n_c_post"),
    )

    def mean(s: str, n: str):
        return F.col(s).cast("double") / F.col(n).cast("double")

    did = (mean("s_t_post", "n_t_post") - mean("s_t_pre", "n_t_pre")) - (
        mean("s_c_post", "n_c_post") - mean("s_c_pre", "n_c_pre")
    )
    return agg.select(
        F.col("n_t_pre"),
        F.col("n_t_post"),
        F.col("n_c_pre"),
        F.col("n_c_post"),
        stable_round(mean("s_t_pre", "n_t_pre"), 6).alias("y_t_pre"),
        stable_round(mean("s_t_post", "n_t_post"), 6).alias("y_t_post"),
        stable_round(mean("s_c_pre", "n_c_pre"), 6).alias("y_c_pre"),
        stable_round(mean("s_c_post", "n_c_post"), 6).alias("y_c_post"),
        stable_round(did, 6).alias("did"),
    )


SQL_DIFF_IN_DIFF = f"""
WITH agg AS (
  SELECT
    SUM(CASE WHEN user_id % 2 = 1 AND ts <  '{_DID_CUTOFF}'
        THEN CAST(value AS DECIMAL(30,6)) END) AS s_t_pre,
    CAST(COUNT(CASE WHEN user_id % 2 = 1 AND ts <  '{_DID_CUTOFF}'
        THEN 1 END) AS BIGINT) AS n_t_pre,
    SUM(CASE WHEN user_id % 2 = 1 AND ts >= '{_DID_CUTOFF}'
        THEN CAST(value AS DECIMAL(30,6)) END) AS s_t_post,
    CAST(COUNT(CASE WHEN user_id % 2 = 1 AND ts >= '{_DID_CUTOFF}'
        THEN 1 END) AS BIGINT) AS n_t_post,
    SUM(CASE WHEN user_id % 2 = 0 AND ts <  '{_DID_CUTOFF}'
        THEN CAST(value AS DECIMAL(30,6)) END) AS s_c_pre,
    CAST(COUNT(CASE WHEN user_id % 2 = 0 AND ts <  '{_DID_CUTOFF}'
        THEN 1 END) AS BIGINT) AS n_c_pre,
    SUM(CASE WHEN user_id % 2 = 0 AND ts >= '{_DID_CUTOFF}'
        THEN CAST(value AS DECIMAL(30,6)) END) AS s_c_post,
    CAST(COUNT(CASE WHEN user_id % 2 = 0 AND ts >= '{_DID_CUTOFF}'
        THEN 1 END) AS BIGINT) AS n_c_post
  FROM events
)
SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       {sql_stable_round(
           "CAST(s_t_pre AS DOUBLE) / n_t_pre", 6)} AS y_t_pre,
       {sql_stable_round(
           "CAST(s_t_post AS DOUBLE) / n_t_post", 6)} AS y_t_post,
       {sql_stable_round(
           "CAST(s_c_pre AS DOUBLE) / n_c_pre", 6)} AS y_c_pre,
       {sql_stable_round(
           "CAST(s_c_post AS DOUBLE) / n_c_post", 6)} AS y_c_post,
       {sql_stable_round(
           "(CAST(s_t_post AS DOUBLE) / n_t_post"
           " - CAST(s_t_pre AS DOUBLE) / n_t_pre)"
           " - (CAST(s_c_post AS DOUBLE) / n_c_post"
           " - CAST(s_c_pre AS DOUBLE) / n_c_pre)", 6)} AS did
FROM agg
"""


# --- delete-one-bucket jackknife for a ratio metric ---------------------------
_JK_BUCKETS = 10


def q_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-bucket jackknife standard error for a RATIO metric
    (Quenouille 1956 / Tukey 1958; the bucketed form is the standard
    large-scale variant, public): the metric is revenue-per-view
    (Σ purchase value / # view events) — a ratio of sums whose
    variance has no closed per-row form, which is exactly what the
    jackknife is for. Users land in {g} deterministic buckets
    (user_id % {g}); each leave-one-bucket-out replicate
    R_(i) = (S−s_i)/(N−n_i) is one exact-decimal-derived division;
    the jackknife variance is (G−1)/G · Σ(R_(i)−R̄)² with both tiny
    reductions riding per-term decimal casts. One summary row.

    Scale: one grouped aggregate to {g} bucket rows; everything
    after is arithmetic over the broadcast {g}-row relation."""
    ev = _events(spark, sf_dir)
    buckets = ev.groupBy((F.col("user_id") % _JK_BUCKETS).alias("b")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(30,6)"),
            )
        ).alias("sv"),
        F.count(F.when(F.col("event_type") == "view", F.lit(1))).alias(
            "nv"
        ),
    )
    tot = buckets.agg(
        F.sum("sv").alias("s"),
        F.sum("nv").alias("n"),
        F.count(F.lit(1)).alias("g"),
    )
    loo = buckets.crossJoin(F.broadcast(tot)).select(
        "b",
        "g",
        "s",
        "n",
        (
            (F.col("s") - F.col("sv")).cast("double")
            / (F.col("n") - F.col("nv")).cast("double")
        ).alias("r_loo"),
    )
    mean_loo = loo.agg(
        (
            F.sum(F.col("r_loo").cast("decimal(30,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("rbar"),
        F.max("g").alias("g"),
        F.max("s").alias("s"),
        F.max("n").alias("n"),
    )
    dev = loo.crossJoin(F.broadcast(mean_loo.select("rbar"))).agg(
        F.sum(
            (
                (F.col("r_loo") - F.col("rbar"))
                * (F.col("r_loo") - F.col("rbar"))
            ).cast("decimal(30,18)")
        )
        .cast("double")
        .alias("ssq")
    )
    return mean_loo.crossJoin(dev).select(
        F.col("g").alias("n_buckets"),
        stable_round(
            F.col("s").cast("double") / F.col("n").cast("double"), 6
        ).alias("ratio"),
        stable_round(
            F.sqrt(
                (F.col("g") - 1).cast("double")
                / F.col("g").cast("double")
                * F.col("ssq")
            ),
            6,
        ).alias("jk_se"),
    )


q_jackknife_ratio.__doc__ = q_jackknife_ratio.__doc__.format(g=_JK_BUCKETS)


SQL_JACKKNIFE_RATIO = f"""
WITH buckets AS (
  SELECT user_id % {_JK_BUCKETS} AS b,
         SUM(CASE WHEN event_type = 'purchase'
             THEN CAST(value AS DECIMAL(30,6)) END) AS sv,
         CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
           AS nv
  FROM events GROUP BY 1
),
tot AS (
  SELECT SUM(sv) AS s, CAST(SUM(nv) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS g
  FROM buckets
),
loo AS (
  SELECT b, t.g, t.s, t.n,
         CAST(t.s - sv AS DOUBLE) / CAST(t.n - nv AS DOUBLE) AS r_loo
  FROM buckets CROSS JOIN tot t
),
m AS (
  SELECT CAST(SUM(CAST(r_loo AS DECIMAL(30,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS rbar,
         MAX(g) AS g, MAX(s) AS s, MAX(n) AS n
  FROM loo
),
dev AS (
  SELECT CAST(SUM(CAST((r_loo - m.rbar) * (r_loo - m.rbar)
                       AS DECIMAL(30,18))) AS DOUBLE) AS ssq
  FROM loo CROSS JOIN m GROUP BY m.rbar
)
SELECT m.g AS n_buckets,
       {sql_stable_round("CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE)", 6)}
         AS ratio,
       {sql_stable_round(
           "sqrt(CAST(m.g - 1 AS DOUBLE) / CAST(m.g AS DOUBLE)"
           " * dev.ssq)", 6)} AS jk_se
FROM m CROSS JOIN dev
"""


# --- theta-sketch-style KMV set operations -----------------------------------
_KSO_K = 256


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set operations over two user sets (the KMV/theta
    estimator family: Beyer et al. 2007, Dasgupta et al. 2016,
    public) — the query the per-scope KMV sketch (wave9) exists to
    enable: estimate |A∪B| and |A∩B| for A = users who viewed and
    B = users who purchased WITHOUT re-scanning the raw sets, from
    one bottom-k sketch of the union carrying per-member set flags.
    With the union's k-th smallest 32-bit hash h_k: |A∪B| ≈
    (k−1)·2³²/h_k and |A∩B| ≈ |{{sketch members in both}}|·2³²/h_k;
    below k distinct members the sketch is exact and the estimates
    ARE the counts. Hashes are the house md5-prefix integers —
    deterministic, identical in both engines; the exact counts ride
    along and the relative errors are displays.

    Scale: one grouped pass builds per-user flags; the sketch is a
    TakeOrdered bottom-k (per-partition heaps); everything after is
    arithmetic over ≤ k rows."""
    users = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("in_b"),
        )
        .filter((F.col("in_a") == 1) | (F.col("in_b") == 1))
        .withColumn(
            "h",
            F.expr(
                "cast(conv(substring(md5(cast(user_id as string)), 1, 8),"
                " 16, 10) as bigint)"
            ),
        )
        .localCheckpoint(eager=False)
    )
    exact = users.agg(
        F.sum("in_a").alias("n_a_exact"),
        F.sum("in_b").alias("n_b_exact"),
        F.count(F.lit(1)).alias("n_union_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_int_exact"),
    )
    sk = users.orderBy("h", "user_id").limit(_KSO_K)
    stats = sk.agg(
        F.count(F.lit(1)).alias("n_sk"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both_sk"),
    )
    sat = F.col("n_sk") >= _KSO_K
    est_union = F.when(
        sat,
        F.lit(float(_KSO_K - 1)) * F.lit(4294967296.0)
        / F.col("kth").cast("double"),
    ).otherwise(F.col("n_union_exact").cast("double"))
    est_int = F.when(
        sat,
        F.col("n_both_sk").cast("double") * F.lit(4294967296.0)
        / F.col("kth").cast("double"),
    ).otherwise(F.col("n_int_exact").cast("double"))
    return (
        stats.crossJoin(F.broadcast(exact))
        .select(
            "n_a_exact",
            "n_b_exact",
            "n_union_exact",
            "n_int_exact",
            stable_round(est_union, 2).alias("est_union"),
            stable_round(est_int, 2).alias("est_intersection"),
            stable_round(
                F.abs(est_union - F.col("n_union_exact").cast("double"))
                / F.col("n_union_exact").cast("double"),
                4,
            ).alias("rel_err_union"),
            stable_round(
                F.abs(est_int - F.col("n_int_exact").cast("double"))
                / F.greatest(
                    F.col("n_int_exact").cast("double"), F.lit(1.0)
                ),
                4,
            ).alias("rel_err_intersection"),
        )
    )


SQL_KMV_SET_OPS = f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM events GROUP BY user_id
  HAVING MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1
      OR MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
),
exact AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS n_a_exact,
         CAST(SUM(in_b) AS BIGINT) AS n_b_exact,
         CAST(COUNT(*) AS BIGINT) AS n_union_exact,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_int_exact
  FROM users
),
sk AS (SELECT * FROM users ORDER BY h, user_id LIMIT {_KSO_K}),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sk, MAX(h) AS kth,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both_sk
  FROM sk
),
est AS (
  SELECT e.*,
         CASE WHEN s.n_sk >= {_KSO_K}
              THEN {float(_KSO_K - 1)} * 4294967296.0
                   / CAST(s.kth AS DOUBLE)
              ELSE CAST(e.n_union_exact AS DOUBLE) END AS eu,
         CASE WHEN s.n_sk >= {_KSO_K}
              THEN CAST(s.n_both_sk AS DOUBLE) * 4294967296.0
                   / CAST(s.kth AS DOUBLE)
              ELSE CAST(e.n_int_exact AS DOUBLE) END AS ei
  FROM stats s CROSS JOIN exact e
)
SELECT n_a_exact, n_b_exact, n_union_exact, n_int_exact,
       {sql_stable_round("eu", 2)} AS est_union,
       {sql_stable_round("ei", 2)} AS est_intersection,
       {sql_stable_round(
           "abs(eu - CAST(n_union_exact AS DOUBLE))"
           " / CAST(n_union_exact AS DOUBLE)", 4)} AS rel_err_union,
       {sql_stable_round(
           "abs(ei - CAST(n_int_exact AS DOUBLE))"
           " / greatest(CAST(n_int_exact AS DOUBLE), 1.0)", 4)}
         AS rel_err_intersection
FROM est
"""


# --- inverse-propensity-weighted ATE ------------------------------------------
_IPW_BUCKETS = 10


def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted (Horvitz–Thompson) average
    treatment effect (Horvitz & Thompson 1952; Rosenbaum & Rubin
    1983, public) — the weighting companion to the post-stratified
    estimator (wave12): users are bucketed into activity deciles
    (operators/ranks.global_ntile over exact event counts), the
    propensity e_b = treated-share of each bucket is an exact-count
    ratio, and the estimator averages T·y/e_b − (1−T)·y/(1−e_b) per
    user (y = exact-decimal mean event value). Degenerate buckets
    (e_b ∈ {{0, 1}}) are excluded and counted. The per-user terms
    ride per-term decimal casts so the big reduction is
    summation-order-free; the naive difference-of-means rides along
    for contrast.

    Scale: one per-user aggregate, the distributed two-pass ntile,
    one 10-row broadcast of bucket propensities, one reduction."""
    users = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).alias("sv"),
    )
    bucketed = global_ntile(
        users, _IPW_BUCKETS, "n_events", "user_id", bucket_col="b"
    ).select(
        "user_id",
        "b",
        (F.col("user_id") % 2).alias("t"),
        (F.col("sv").cast("double") / F.col("n_events").cast("double"))
        .alias("y"),
    )
    prop = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("t").alias("n_t"),
    ).select(
        "b",
        (F.col("n_t").cast("double") / F.col("n_b").cast("double"))
        .alias("e"),
        ((F.col("n_t") > 0) & (F.col("n_t") < F.col("n_b"))).alias("ok"),
    )
    terms = bucketed.join(F.broadcast(prop), "b").filter(F.col("ok"))
    ipw = terms.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(
                F.col("t") == 1, F.col("y") / F.col("e")
            ).otherwise(-F.col("y") / (F.lit(1.0) - F.col("e")))
            .cast("decimal(30,12)")
        ).alias("s_ipw"),
        F.sum(
            F.when(F.col("t") == 1, F.col("y").cast("decimal(30,12)"))
        ).alias("sy_t"),
        F.count(F.when(F.col("t") == 1, F.lit(1))).alias("nt"),
        F.sum(
            F.when(F.col("t") == 0, F.col("y").cast("decimal(30,12)"))
        ).alias("sy_c"),
        F.count(F.when(F.col("t") == 0, F.lit(1))).alias("nc"),
    )
    n_excl = prop.agg(
        F.count(F.when(~F.col("ok"), F.lit(1))).alias("n_excluded_buckets")
    )
    return ipw.crossJoin(F.broadcast(n_excl)).select(
        "n_users",
        "n_excluded_buckets",
        stable_round(
            F.col("s_ipw").cast("double") / F.col("n_users").cast("double"),
            6,
        ).alias("ate_ipw"),
        stable_round(
            F.col("sy_t").cast("double") / F.col("nt").cast("double")
            - F.col("sy_c").cast("double") / F.col("nc").cast("double"),
            6,
        ).alias("ate_naive"),
    )


SQL_IPW_ATE = f"""
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(CAST(value AS DECIMAL(30,6))) AS sv
  FROM events GROUP BY user_id
),
bk AS (
  SELECT user_id, user_id % 2 AS t,
         CAST(sv AS DOUBLE) / CAST(n_events AS DOUBLE) AS y,
         ntile({_IPW_BUCKETS}) OVER (ORDER BY n_events, user_id) AS b
  FROM u
),
prop AS (
  SELECT b, CAST(SUM(t) AS DOUBLE) / COUNT(*) AS e,
         SUM(t) > 0 AND SUM(t) < COUNT(*) AS ok
  FROM bk GROUP BY b
),
terms AS (SELECT bk.*, p.e FROM bk JOIN prop p ON bk.b = p.b WHERE p.ok),
ipw AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         SUM(CAST(CASE WHEN t = 1 THEN y / e
                  ELSE -y / (1.0 - e) END AS DECIMAL(30,12))) AS s_ipw,
         SUM(CASE WHEN t = 1 THEN CAST(y AS DECIMAL(30,12)) END) AS sy_t,
         CAST(COUNT(CASE WHEN t = 1 THEN 1 END) AS BIGINT) AS nt,
         SUM(CASE WHEN t = 0 THEN CAST(y AS DECIMAL(30,12)) END) AS sy_c,
         CAST(COUNT(CASE WHEN t = 0 THEN 1 END) AS BIGINT) AS nc
  FROM terms
),
ex AS (
  SELECT CAST(COUNT(CASE WHEN NOT ok THEN 1 END) AS BIGINT)
           AS n_excluded_buckets
  FROM prop
)
SELECT n_users, n_excluded_buckets,
       {sql_stable_round(
           "CAST(s_ipw AS DOUBLE) / CAST(n_users AS DOUBLE)", 6)}
         AS ate_ipw,
       {sql_stable_round(
           "CAST(sy_t AS DOUBLE) / CAST(nt AS DOUBLE)"
           " - CAST(sy_c AS DOUBLE) / CAST(nc AS DOUBLE)", 6)}
         AS ate_naive
FROM ipw CROSS JOIN ex
"""


def specs():
    from lab04_spark_streaming_spark.registry import QuerySpec

    return [
        QuerySpec("lorenz_curve", q_lorenz_curve, SQL_LORENZ_CURVE),
        QuerySpec(
            "t_closeness_audit", q_t_closeness_audit, SQL_T_CLOSENESS_AUDIT
        ),
        QuerySpec("diff_in_diff", q_diff_in_diff, SQL_DIFF_IN_DIFF),
        QuerySpec("jackknife_ratio", q_jackknife_ratio, SQL_JACKKNIFE_RATIO),
        QuerySpec("kmv_set_ops", q_kmv_set_ops, SQL_KMV_SET_OPS),
        QuerySpec("ipw_ate", q_ipw_ate, SQL_IPW_ATE),
    ]
