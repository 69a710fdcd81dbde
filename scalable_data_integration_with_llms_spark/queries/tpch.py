"""Core relational surface: scan → filter → join → aggregate → top-k.

These exercise the engine primitives behind SURVEY §2.2–§2.6 on the driver's
TPC-H-ish tables: pushed-down filters/projections, broadcast vs shuffle joins
(Catalyst decides; small dims broadcast), hash aggregation with partial
(map-side) combine, and deterministic top-k.

Exactness: all money aggregates run through integer cents
(functions/determinism.py) so Spark's partial-agg order and DuckDB's
single-node order produce bit-identical results — see that module's docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import cents
from ..sources.readers import load_table
from .registry import query

# -- q1: pricing summary (TPC-H Q1 shape; SURVEY A5 metric aggregation) ------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty,
  SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
  SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)) / 100.0 AS sum_disc_price,
  SUM(CAST(round((((l_extendedprice * (1 - l_discount)) * (1 + l_tax)) * 100), 0) AS BIGINT)) / 100.0 AS sum_charge,
  (SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0) / COUNT(*) AS avg_qty,
  (SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0) / COUNT(*) AS avg_price,
  (SUM(CAST(round(l_discount * 10000, 0) AS BIGINT)) / 10000.0) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = l.l_extendedprice * (1 - l.l_discount)
    charge = disc_price * (1 + l.l_tax)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents(l.l_quantity)) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(cents(l.l_extendedprice)) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(cents(disc_price)) / F.lit(100.0)).alias("sum_disc_price"),
            (F.sum(cents(charge)) / F.lit(100.0)).alias("sum_charge"),
            ((F.sum(cents(l.l_quantity)) / F.lit(100.0)) / F.count(F.lit(1))).alias("avg_qty"),
            ((F.sum(cents(l.l_extendedprice)) / F.lit(100.0)) / F.count(F.lit(1))).alias("avg_price"),
            ((F.sum(cents(l.l_discount, 10000)) / F.lit(10000.0)) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# -- q3: shipping-priority top-k (join + agg + deterministic LIMIT) ----------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)) / 100.0 AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)) DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue_cents = F.sum(cents(l.l_extendedprice * (1 - l.l_discount)))
    # customer is the small side at any SF ratio -> broadcast it into orders;
    # orders⋈lineitem shuffles on the join key (the natural key at scale).
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_cents.alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            (F.col("revenue_cents") / F.lit(100.0)).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


# -- q5: region revenue rollup (5-way join; broadcast dims) ------------------

_Q5_ORACLE = """
SELECT
  n_name,
  SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)) / 100.0 AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('AMERICA', 'ASIA')
GROUP BY n_name
"""


@query("q5_region_revenue", _Q5_ORACLE)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    # dims are tiny at every SF -> broadcast all three; lineitem never shuffles
    # for the join (only for the final small agg, which AQE coalesces).
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            (F.sum(cents(l.l_extendedprice * (1 - l.l_discount))) / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# -- q_orders_per_status: simplest scan+agg smoke -----------------------------

_ORDERS_STATUS_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY o_orderstatus
"""


@query("q_orders_per_status", _ORDERS_STATUS_ORACLE)
def q_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents(o.o_totalprice)) / F.lit(100.0)).alias("total_price"),
    )


# -- anti/semi joins + correlated subquery (Catalyst subquery planning) ------

_NO_ORDERS_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@query("q_customers_without_orders", _NO_ORDERS_ORACLE)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left_anti join (Catalyst rewrites the correlated
    subquery; the engine expresses it declaratively either way)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_BIG_SPENDERS_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


@query("q_big_spenders", _BIG_SPENDERS_ORACLE)
def q_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


_ABOVE_AVG_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (SELECT (SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0)
                             / COUNT(*) * 1.5 FROM orders)
"""


@query("q_above_avg_orders", _ABOVE_AVG_ORACLE)
def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate via Spark SQL (exact-cents average so the
    threshold is engine-identical)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o
        WHERE o_totalprice > (SELECT (SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0)
                                     / COUNT(*) * 1.5 FROM v_orders)
        """
    )


# -- q7: volume shipping between nation pairs by year -------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)) / 100.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", _Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    # orders⋈lineitem is the one fact-fact shuffle; every dim broadcasts
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(cents(l.l_extendedprice * (1 - l.l_discount))) / F.lit(100.0)).alias("revenue"))
    )


# -- q9: profit by nation and year (retail-price cost proxy) ------------------

_Q9_ORACLE = """
SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
       SUM(CAST(round((((l_extendedprice * (1 - l_discount)) - ((p_retailprice * 0.1) * l_quantity)) * 100), 0) AS BIGINT)) / 100.0 AS profit
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


@query("q9_profit", _Q9_ORACLE)
def q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape with a retail-price cost proxy (the synthetic schema
    has no partsupp); amount computed per-row then exact-cents summed."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    amount = (l.l_extendedprice * (1 - l.l_discount)) - ((p.p_retailprice * 0.1) * l.l_quantity)
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(cents(amount)) / F.lit(100.0)).alias("profit"))
    )


# -- q10: top returned-revenue customers --------------------------------------

_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)) / 100.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)) DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_revenue", _Q10_ORACLE)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev_cents = F.sum(cents(l.l_extendedprice * (1 - l.l_discount)))
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev_cents.alias("rc"))
        .orderBy(F.desc("rc"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", (F.col("rc") / F.lit(100.0)).alias("revenue"))
    )


# -- q14: promo revenue share -------------------------------------------------

_Q14_ORACLE = """
SELECT
  (SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)
            ELSE 0 END) * 100.0)
  / SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * 100), 0) AS BIGINT)) AS promo_revenue_pct,
  COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


@query("q14_promo_share", _Q14_ORACLE)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio on exact cents: promo revenue share."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rc = cents(l.l_extendedprice * (1 - l.l_discount))
    promo = F.sum(F.when(p.p_type == "PROMO", rc).otherwise(F.lit(0)))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            ((promo * F.lit(100.0)) / F.sum(rc)).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
