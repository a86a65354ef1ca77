"""General batch analytics surface (SURVEY.md §7 step 5).

TPC-H-style queries plus operator-coverage queries (joins of every
flavor, rollup/cube, window functions, set ops, top-k, scalar function
batteries) over the driver's star schema. All are free Spark built-ins;
the engineering content is the plan shape:

  * dimension joins are broadcast (`F.broadcast`) — at 100 TB the fact
    table never shuffles for a dim join;
  * aggregates go through per-row decimal casts where the oracle
    comparison needs exactness (see registry.py docstring);
  * every query is expressed so Catalyst can push filters/prune columns
    into the parquet scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab04_spark_streaming_spark.functions.guards import exact_avg, sql_exact_avg
from lab04_spark_streaming_spark.sources.files import load_table


def _dec_sum(col, scale: int = 2, alias: str | None = None):
    """Exact cross-engine SUM: per-row cast to decimal (deterministic),
    decimal summation (order-independent), emitted as double."""
    c = F.sum(col.cast(f"decimal(30,{scale})")).cast("double")
    return c.alias(alias) if alias else c


# --- TPC-H Q1: pricing summary report -------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy group-by: filter → 2-key hash agg. At scale this is a
    single shuffle of partial aggregates (4 groups); the shipdate filter
    and 7-column projection push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    # Per-row arithmetic in double is bit-identical across engines; the
    # per-row decimal cast then makes the SUM order-independent/exact.
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-06-30"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), 2, "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), 2, "sum_base_price"),
            _dec_sum(disc_price, 4, "sum_disc_price"),
            # charge has 6 true decimals (scale-4 per-row rounding hits
            # exact .xx50 ties that engines break differently, and so
            # does rounding the exact sum: Spark HALF_UP vs DuckDB
            # half-even). Sum the exact scale-6 decimals, TRUNCATE to
            # cents (floor — tie-free), emit as double (cents < 2^53).
            (F.floor(F.sum(charge.cast("decimal(30,6)")) * 100).cast("double") / 100.0)
            .alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4)))
            AS DOUBLE) AS sum_disc_price,
       CAST(floor(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                           AS DECIMAL(30,6))) * 100) AS DOUBLE) / 100.0
         AS sum_charge,
       {sql_exact_avg("l_quantity")} AS avg_qty,
       {sql_exact_avg("l_extendedprice")} AS avg_price,
       {sql_exact_avg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-06-30'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3: shipping priority (3-way join + top-k) ---------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⨝ orders ⨝ lineitem with a top-10. customer is small
    relative to the facts → broadcast; orders⨝lineitem co-shuffles on
    the order key. Tie-broken fully (revenue, orderdate, orderkey) so
    LIMIT is deterministic cross-engine."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-06-15")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", F.col("o_orderdate").cast("timestamp").alias("o_orderdate"), "o_orderpriority")
        .agg(_dec_sum(disc_price, 4, "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'MACHINERY'
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate > TIMESTAMP '1999-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --- TPC-H Q5: local supplier volume (6-way join) -------------------------
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: all four dims broadcast; the lineitem⨝orders fact join
    is the only shuffle. At 100 TB this is the canonical plan — verify
    with explain() that no dim lands on a sort-merge join."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("region", "nation", "customer", "supplier", "orders", "lineitem")}
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .groupBy("n_name")
        .agg(_dec_sum(disc_price, 4, "revenue"))
    )


SQL_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- TPC-H Q4: order priority checking (correlated EXISTS) ----------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-correlated subquery → left_semi physical join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01")
    )
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1999-01-01')
GROUP BY o_orderpriority
"""


# --- TPC-H Q12: shipmode line-priority buckets (conditional agg) ----------
def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01"))
        & (F.col("l_shipdate") < F.lit("2000-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


SQL_Q12 = """
SELECT l_linestatus,
       COUNT(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       COUNT(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate < TIMESTAMP '2000-01-01'
GROUP BY l_linestatus
"""


# --- TPC-H Q14: promotion revenue ratio -----------------------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional revenue ratio — both sums exact decimals, the final
    ratio identical IEEE division."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-06-01"))
        & (F.col("l_shipdate") < F.lit("1999-07-01"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,4)"
    )
    promo = F.col("p_type").startswith("PROMO")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(promo, disc)).cast("double")
            / F.sum(disc).cast("double")
        ).alias("promo_revenue_pct")
    )


SQL_Q14 = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN
                        CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))
                        END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(30,4))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1999-06-01'
  AND l_shipdate < TIMESTAMP '1999-07-01'
"""


# --- Semi / anti joins ----------------------------------------------------
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi — customers with ≥1 high-value order. Semi joins only
    carry the key side across the shuffle (no payload duplication)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000.0
    )
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti — customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- Outer join with null-producing side ----------------------------------
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000.0
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            _dec_sum(F.col("o_totalprice"), 2, "sum_big"),
        )
        .withColumn("sum_big", F.coalesce(F.col("sum_big"), F.lit(0.0)))
    )


SQL_OUTER_JOIN = """
SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders,
       coalesce(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 0.0)
         AS sum_big
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
  ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# --- Rollup / cube / grouping sets ----------------------------------------
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), _dec_sum(F.col("l_quantity"), 2, "qty"))
    )


SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- Ranking / analytic window functions ----------------------------------
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number with full tiebreak. The
    partition-local sort never shuffles more than (customer) keys."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals + lag/lead. The cumulative sum goes through a
    per-row decimal cast so the prefix sums are exact cross-engine."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.rank().over(w).cast("long").alias("rnk"),
    )


SQL_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_total,
       lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_order,
       lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS next_order,
       rank() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS rnk
FROM orders
"""


# --- Distinct aggregation -------------------------------------------------
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_DISTINCT_AGG = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# --- Set operations -------------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation-key projections, tagged so
    one result covers all three."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    union = cust.union(supp).distinct().withColumn("op", F.lit("union"))
    inter = cust.intersect(supp).withColumn("op", F.lit("intersect"))
    exc = cust.exceptAll(supp).distinct().withColumn("op", F.lit("except"))
    return union.union(inter).union(exc)


SQL_SET_OPS = """
SELECT nk, 'union' AS op FROM
  (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nk, 'intersect' AS op FROM
  (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT DISTINCT s.nk, 'except' AS op FROM
  (SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier) s
"""


# --- Global sort + limit (top-k) ------------------------------------------
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20. Spark plans TakeOrderedAndProject — a per-partition
    heap + driver merge, NOT a full sort; the right plan at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


SQL_SORT_LIMIT = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
"""


# --- Scalar function batteries --------------------------------------------
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("long").alias("len"),
        F.substring("p_name", 1, 5).alias("sub"),
        F.concat_ws("|", "p_brand", "p_type").alias("cat"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.replace(F.col("p_type"), F.lit("SMALL"), F.lit("S")).alias("repl"),
        F.col("p_name").contains("red").alias("has_red"),
        # array_join: the driver's canonicalizer hashes pandas cells, and
        # list-typed cells are unhashable — serialize arrays in BOTH engines.
        F.array_join(F.split(F.col("p_name"), " "), ",").alias("words"),
    )


SQL_STRING_FUNCS = """
SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
       length(p_name) AS len, substring(p_name, 1, 5) AS sub,
       concat_ws('|', p_brand, p_type) AS cat, trim('  x  ') AS trimmed,
       replace(p_type, 'SMALL', 'S') AS repl,
       contains(p_name, 'red') AS has_red,
       array_to_string(string_split(p_name, ' '), ',') AS words
FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long").alias("days_to_y2k"),
        F.add_months(F.col("o_orderdate"), 3).cast("date").alias("plus3mo"),
    )


SQL_DATE_FUNCS = """
SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
         AS days_to_y2k,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo
FROM orders
"""


def q_math_case_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("absd"),
        F.ceil("l_extendedprice").alias("ce"),
        F.floor("l_extendedprice").alias("fl"),
        F.sqrt("l_quantity").alias("sq"),
        (F.col("l_orderkey") % 7).alias("m7"),
        F.when(F.col("l_quantity") > 25, "big")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("x")).alias(
            "nn"
        ),
        F.greatest("l_tax", "l_discount").alias("gr"),
        F.least("l_tax", "l_discount").alias("le"),
    )


SQL_MATH_CASE_FUNCS = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS absd,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
       CAST(floor(l_extendedprice) AS BIGINT) AS fl,
       sqrt(l_quantity) AS sq,
       l_orderkey % 7 AS m7,
       CASE WHEN l_quantity > 25 THEN 'big'
            WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS bucket,
       coalesce(nullif(l_returnflag, 'N'), 'x') AS nn,
       greatest(l_tax, l_discount) AS gr, least(l_tax, l_discount) AS le
FROM lineitem
WHERE l_orderkey < 2000
"""


# --- Conditional aggregation (pivot-style) --------------------------------
def q_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in types
        ]
    )


SQL_CONDITIONAL_PIVOT = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS n_click,
       COUNT(*) FILTER (event_type = 'view') AS n_view,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (event_type = 'error') AS n_error
FROM events
GROUP BY user_id
"""


# --- Sessionization (gap-based) over events -------------------------------
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic gap-based sessionization (30 min inactivity) with window
    functions — the batch equivalent of a session window. Per-user
    partitions; no global sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


SQL_SESSIONIZE = """
WITH with_gap AS (
  SELECT user_id, event_id, ts,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM with_gap
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess
GROUP BY user_id, session_id
"""


# --- TPC-H Q6: forecast revenue change (pure filter-sum) ------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates push to the parquet scan; the agg is a
    single partial+final sum — the minimal-shuffle TPC-H query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01"))
            & (F.col("l_shipdate") < F.lit("2000-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,4)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate < TIMESTAMP '2000-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


# --- GROUPING SETS (distinct from rollup/cube) ----------------------------
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


# --- Array function battery -----------------------------------------------
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    # All list-typed outputs are array_join'd (and array_to_string'd on the
    # DuckDB side): the driver canonicalizer can't hash list cells.
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(words), ",").alias("sorted_words"),
        # sorted: DuckDB's list_distinct does not preserve input order
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias(
            "distinct_words"
        ),
        F.size(words).cast("long").alias("n_words"),
        F.array_contains(words, "red").alias("has_red"),
        F.array_join(F.slice(words, 1, 1), ",").alias("first_word"),
        F.array_join(F.reverse(words), ",").alias("rev_words"),
        F.array_max(F.transform(words, lambda w: F.length(w))).cast("long").alias(
            "max_word_len"
        ),
    )


SQL_ARRAY_FUNCS = """
SELECT p_partkey,
       array_to_string(list_sort(string_split(p_name, ' ')), ',')
         AS sorted_words,
       array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',')
         AS distinct_words,
       len(string_split(p_name, ' ')) AS n_words,
       list_contains(string_split(p_name, ' '), 'red') AS has_red,
       array_to_string(string_split(p_name, ' ')[1:1], ',') AS first_word,
       array_to_string(list_reverse(string_split(p_name, ' ')), ',')
         AS rev_words,
       list_max(list_transform(string_split(p_name, ' '), w -> length(w)))
         AS max_word_len
FROM part
"""


# --- Regexp battery --------------------------------------------------------
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("text"), "[a-z]{6,}", 0).alias("first_long_word"),
        F.regexp_replace(F.col("text"), "[aeiou]", "_").alias("devoweled"),
        F.col("text").rlike("window.*join").alias("has_window_join"),
        F.length(F.regexp_replace(F.col("text"), "[^ ]", ""))
        .cast("long")
        .alias("n_spaces"),
    )


SQL_REGEXP_FUNCS = """
SELECT doc_id,
       coalesce(regexp_extract(text, '[a-z]{6,}'), '') AS first_long_word,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(text, 'window.*join') AS has_window_join,
       length(regexp_replace(text, '[^ ]', '', 'g')) AS n_spaces
FROM documents
"""


# --- Scalar subquery -------------------------------------------------------
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders within 10% of the global max price. The scalar aggregate
    is broadcast (one row) — no shuffle of the fact side."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_totalprice").alias("_mx"))
    return (
        o.crossJoin(F.broadcast(mx))
        .filter(F.col("o_totalprice") >= 0.9 * F.col("_mx"))
        .select("o_orderkey", "o_totalprice")
    )


SQL_SCALAR_SUBQUERY = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice >= 0.9 * (SELECT MAX(o_totalprice) FROM orders)
"""


# --- Tumbling (non-sliding) event-time window -----------------------------
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window() without slide — the degenerate sliding case the engine
    also serves; no Expand in the plan (1 window per row)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_avg(F.col("value")).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )


SQL_TUMBLING_WINDOW = f"""
SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000)
         AS bucket_start,
       event_type, COUNT(*) AS n,
       {sql_exact_avg("value")} AS avg_value
FROM events
GROUP BY 1, 2
"""


# --- Native session windows (F.session_window) ----------------------------
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in gap-based session window (30 min) — the
    streaming-native twin of q_sessionize; session end = last event +
    gap by definition."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


SQL_SESSION_WINDOW = """
WITH with_gap AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM with_gap
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_id
"""


# --- Exact interpolated percentiles ----------------------------------------
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (non-approximate) interpolated percentiles per group —
    sorting the group exactly, both engines interpolate a+(b−a)·f on
    identical doubles. For 100 TB you'd reach for approx_percentile
    (t-digest, no global sort); the exact form is the correctness
    anchor and fine per-group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.95) AS p95,
       MIN(l_extendedprice) AS mn,
       MAX(l_extendedprice) AS mx
FROM lineitem
GROUP BY l_returnflag
"""


# --- Moment aggregates: variance / covariance / correlation ----------------
def q_moment_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """var_samp/var_pop/stddev_pop/covar_samp/corr derived from exact
    decimal moments (registry.py discipline): identical doubles in both
    engines, and the same partial-aggregation shape as the built-ins."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = F.sum(F.col("l_quantity").cast("decimal(30,4)")).cast("double")
    sxx = F.sum(
        (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(30,2)")
    ).cast("double")
    sy = F.sum(F.col("l_extendedprice").cast("decimal(30,4)")).cast("double")
    # scale 4 (the products' true scale): at ~1e10 magnitude the double
    # ulp (~2e-6) exceeds a scale-8 quantum and engines round the tail
    # differently; at scale 4 the quantum dwarfs the ulp -> exact.
    syy = F.sum(
        (F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(30,2)")
    ).cast("double")
    sxy = F.sum(
        (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(30,2)")
    ).cast("double")
    var_s = (sxx - sx * sx / n) / (n - F.lit(1))
    var_p = (sxx - sx * sx / n) / n
    cov_s = (sxy - sx * sy / n) / (n - F.lit(1))
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return li.groupBy("l_returnflag").agg(
        var_s.alias("var_samp_qty"),
        var_p.alias("var_pop_qty"),
        F.sqrt(var_p).alias("stddev_pop_qty"),
        cov_s.alias("covar_qty_price"),
        corr.alias("corr_qty_price"),
    )


def _sql_moments() -> str:
    sx = "CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)"
    sxx = "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,2))) AS DOUBLE)"
    sy = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)"
    syy = (
        "CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,2)))"
        " AS DOUBLE)"
    )
    sxy = (
        "CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)"
    )
    n = "COUNT(*)"
    return f"""
SELECT l_returnflag,
       ({sxx} - {sx} * {sx} / {n}) / ({n} - 1) AS var_samp_qty,
       ({sxx} - {sx} * {sx} / {n}) / {n} AS var_pop_qty,
       sqrt(({sxx} - {sx} * {sx} / {n}) / {n}) AS stddev_pop_qty,
       ({sxy} - {sx} * {sy} / {n}) / ({n} - 1) AS covar_qty_price,
       ({sxy} - {sx} * {sy} / {n})
         / (sqrt({sxx} - {sx} * {sx} / {n}) * sqrt({syy} - {sy} * {sy} / {n}))
         AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
"""


SQL_MOMENT_AGGS = _sql_moments()


# --- Approximate distinct --------------------------------------------------
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approx_count_distinct. The sketch estimate itself
    is algorithm-specific (Spark's HLL++ ≠ DuckDB's), so the oracle
    contract is the HLL++ error bound instead of the raw estimate:
    emit the exact count plus a within_5pct flag (rsd=0.01 → 5% is a
    5-sigma envelope, deterministic in practice) and let the oracle
    assert the flag is TRUE with the same exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.01)
                - F.count_distinct("l_partkey")
            )
            <= 0.05 * F.count_distinct("l_partkey")
        ).alias("within_5pct"),
    )


SQL_APPROX_DISTINCT = """
SELECT l_linestatus,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_5pct
FROM lineitem
GROUP BY l_linestatus
"""


def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna/KLL-style sketch — the 100 TB
    path: mergeable, no per-group sort). The sketch values are
    algorithm-specific, so as with approx_count_distinct the oracle
    contract is the error bound: accuracy=1000 guarantees rank error
    ≤ 0.1%, checked against the exact ±5%-rank percentile bracket
    (computed in the same pass) — the flags are deterministically TRUE
    and the exact anchors hash-match."""
    li = load_table(spark, sf_dir, "lineitem")
    p = "percentile(l_extendedprice, {})"
    a = "approx_percentile(l_extendedprice, {}, 1000)"
    g = li.groupBy("l_returnflag").agg(
        F.expr(p.format(0.5)).alias("p50_exact"),
        F.expr(p.format(0.95)).alias("p95_exact"),
        F.expr(p.format(0.45)).alias("_lo50"),
        F.expr(p.format(0.55)).alias("_hi50"),
        F.expr(p.format(0.90)).alias("_lo95"),
        F.expr(p.format(1.0)).alias("_hi95"),
        F.expr(a.format(0.5)).alias("_a50"),
        F.expr(a.format(0.95)).alias("_a95"),
    )
    return g.select(
        "l_returnflag",
        "p50_exact",
        "p95_exact",
        F.col("_a50").between(F.col("_lo50"), F.col("_hi50")).alias(
            "p50_within_rank_5pct"
        ),
        F.col("_a95").between(F.col("_lo95"), F.col("_hi95")).alias(
            "p95_within_rank_5pct"
        ),
    )


SQL_APPROX_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_exact,
       quantile_cont(l_extendedprice, 0.95) AS p95_exact,
       TRUE AS p50_within_rank_5pct,
       TRUE AS p95_within_rank_5pct
FROM lineitem
GROUP BY l_returnflag
"""


# --- JSON + map functions ---------------------------------------------------
def q_json_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + map construction/lookup over events.props
    (reference decodes this payload at sources.py S5; here the full
    scalar surface). Map-typed intermediates are exercised Spark-side
    but never OUTPUT as map cells — lookups and sorted key lists only,
    so the driver canonicalizer sees scalars/strings.

    The map is built FROM THE DATA (``map_from_arrays`` over the
    payload's own ``json_object_keys``), so every oracle cell —
    m_keys, m_k, m_mod, m_size — is derived from ``props`` in BOTH
    engines; a regression in Spark's map_keys/map_concat/size/
    element_at shows up as a value mismatch, not a pass-by-constant.
    map_concat runs under Spark's default duplicate-key EXCEPTION
    policy: a fixture whose props ever contains the appended keys
    fails loudly instead of silently deduping."""
    ev = load_table(spark, sf_dir, "events")
    # map from the JSON's own keys: {k -> string value of $.k, ...}
    m = (
        "map_from_arrays(json_object_keys(props), "
        "transform(json_object_keys(props), "
        "kk -> get_json_object(props, concat('$.', kk))))"
    )
    m2 = f"map_concat({m}, map('mod', cast(pmod(event_id, 5) as string)))"
    return ev.select(
        "event_id",
        F.expr("get_json_object(props, '$.k')").alias("k_str"),
        F.expr("array_join(json_object_keys(props), ',')").alias("props_keys"),
        F.expr("cast(get_json_object(props, '$.k') as int) + 1").alias("k_next"),
        F.expr(f"array_join(array_sort(map_keys({m2})), ',')").alias("m_keys"),
        F.expr(f"cast(element_at({m2}, 'k') as int)").alias("m_k"),
        F.expr(f"cast(element_at({m2}, 'mod') as int)").alias("m_mod"),
        F.expr(
            f"cast(size(map_concat({m2}, map('x', '1'))) as int)"
        ).alias("m_size"),
    )


SQL_JSON_MAP_FUNCS = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       array_to_string(json_keys(props), ',') AS props_keys,
       CAST(json_extract_string(props, '$.k') AS INTEGER) + 1 AS k_next,
       array_to_string(list_sort(list_append(json_keys(props), 'mod')), ',')
         AS m_keys,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS m_k,
       CAST(event_id % 5 AS INTEGER) AS m_mod,
       CAST(len(json_keys(props)) + 2 AS INTEGER) AS m_size
FROM events
"""


# --- unpivot / stack (wide → long) ----------------------------------------
def q_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip pivot → unpivot: per-user conditional counts widened
    to one column per event type, then melted back to long form with
    the DataFrame ``unpivot`` (SQL ``stack``) operator. Counts are
    coalesced so the unpivot emits exactly 5 rows/user in both engines
    (DuckDB's UNPIVOT drops NULL cells; the oracle uses the portable
    UNION ALL formulation instead)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["view", "click", "signup", "error", "purchase"]
    wide = ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in types
        ]
    )
    return wide.unpivot(
        ["user_id"], [f"n_{t}" for t in types], "metric", "n_events"
    )


SQL_UNPIVOT_STACK = """
WITH w AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
         COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
         COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
         COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
  FROM events GROUP BY user_id
)
SELECT user_id, 'n_view' AS metric, n_view AS n_events FROM w
UNION ALL SELECT user_id, 'n_click', n_click FROM w
UNION ALL SELECT user_id, 'n_signup', n_signup FROM w
UNION ALL SELECT user_id, 'n_error', n_error FROM w
UNION ALL SELECT user_id, 'n_purchase', n_purchase FROM w
"""


# --- ntile / percent_rank / cume_dist --------------------------------------
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window battery per nation: account-balance
    quartile (ntile), percent_rank, cume_dist. The ORDER BY is a total
    order (acctbal, custkey) so every rank — and therefore every
    emitted ratio — is deterministic cross-engine (ratios of small
    ints are identical IEEE doubles)."""
    cust = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


SQL_WINDOW_NTILE = """
SELECT c_nationkey, c_custkey, c_acctbal,
       ntile(4) OVER w AS bal_quartile,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


# --- fixed-width histogram -------------------------------------------------
def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound histogram of extended price (20 × 5500-wide buckets,
    top bucket open): pure floor arithmetic → single hash agg on ≤20
    groups — the fastest possible distributed histogram (no sort, no
    percentile state; fixed bounds also make it streaming/partial-agg
    friendly, unlike a min/max-dependent binning)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.lit(19), F.floor(F.col("l_extendedprice") / F.lit(5500.0))
    ).cast("int")
    return (
        li.select(bucket.alias("bucket"), "l_extendedprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dec_sum(F.col("l_extendedprice"), 2, "sum_price"),
        )
        .withColumn("bucket_lo", F.col("bucket").cast("double") * 5500.0)
    )


SQL_HISTOGRAM_BINS = """
SELECT bucket, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price,
       CAST(bucket AS DOUBLE) * 5500.0 AS bucket_lo
FROM (
  SELECT CAST(LEAST(19, CAST(floor(l_extendedprice / 5500.0) AS BIGINT))
              AS INTEGER) AS bucket,
         l_extendedprice
  FROM lineitem
)
GROUP BY bucket
"""


def specs():
    from lab04_spark_streaming_spark.registry import QuerySpec

    return [
        QuerySpec("q1_pricing_summary", q1_pricing_summary, SQL_Q1),
        QuerySpec("q3_shipping_priority", q3_shipping_priority, SQL_Q3),
        QuerySpec("q5_local_supplier", q5_local_supplier, SQL_Q5),
        QuerySpec("q4_order_priority", q4_order_priority, SQL_Q4),
        QuerySpec("q12_priority_buckets", q12_priority_buckets, SQL_Q12),
        QuerySpec("q14_promo_revenue", q14_promo_revenue, SQL_Q14),
        QuerySpec("semi_join_exists", q_semi_join, SQL_SEMI_JOIN),
        QuerySpec("anti_join_not_exists", q_anti_join, SQL_ANTI_JOIN),
        QuerySpec("outer_join_agg", q_outer_join, SQL_OUTER_JOIN),
        QuerySpec("rollup_agg", q_rollup, SQL_ROLLUP),
        QuerySpec("cube_agg", q_cube, SQL_CUBE),
        QuerySpec("window_topk_per_group", q_window_topk_per_group, SQL_WINDOW_TOPK),
        QuerySpec("window_running_lag_lead", q_window_running, SQL_WINDOW_RUNNING),
        QuerySpec("distinct_agg", q_distinct_agg, SQL_DISTINCT_AGG),
        QuerySpec("set_ops", q_set_ops, SQL_SET_OPS),
        QuerySpec("sort_limit_topk", q_sort_limit, SQL_SORT_LIMIT),
        QuerySpec("string_funcs", q_string_funcs, SQL_STRING_FUNCS),
        QuerySpec("date_funcs", q_date_funcs, SQL_DATE_FUNCS),
        QuerySpec("math_case_funcs", q_math_case_funcs, SQL_MATH_CASE_FUNCS),
        QuerySpec("conditional_pivot", q_conditional_pivot, SQL_CONDITIONAL_PIVOT),
        QuerySpec("sessionize_gap30m", q_sessionize, SQL_SESSIONIZE),
        QuerySpec("approx_count_distinct", q_approx_distinct, SQL_APPROX_DISTINCT),
        QuerySpec(
            "approx_percentiles", q_approx_percentiles, SQL_APPROX_PERCENTILES
        ),
        QuerySpec("q6_forecast_revenue", q6_forecast_revenue, SQL_Q6),
        QuerySpec("grouping_sets", q_grouping_sets, SQL_GROUPING_SETS),
        QuerySpec("array_funcs", q_array_funcs, SQL_ARRAY_FUNCS),
        QuerySpec("regexp_funcs", q_regexp_funcs, SQL_REGEXP_FUNCS),
        QuerySpec("scalar_subquery", q_scalar_subquery, SQL_SCALAR_SUBQUERY),
        QuerySpec("tumbling_window_1h", q_tumbling_window, SQL_TUMBLING_WINDOW),
        QuerySpec("session_window_agg", q_session_window, SQL_SESSION_WINDOW),
        QuerySpec("percentiles_exact", q_percentiles, SQL_PERCENTILES),
        QuerySpec("moment_aggs", q_moment_aggs, SQL_MOMENT_AGGS),
        QuerySpec("json_map_funcs", q_json_map_funcs, SQL_JSON_MAP_FUNCS),
        QuerySpec("unpivot_stack", q_unpivot_stack, SQL_UNPIVOT_STACK),
        QuerySpec("window_ntile_percent_rank", q_window_ntile, SQL_WINDOW_NTILE),
        QuerySpec("histogram_bins", q_histogram_bins, SQL_HISTOGRAM_BINS),
    ]
