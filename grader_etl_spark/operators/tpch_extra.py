"""Further TPC-H query shapes (Q4/Q13/Q15/Q18 analogs) — the
correlated-subquery, double-aggregation, and having-filter patterns
the first analytics batch (analytics.py: Q1/Q3/Q5 shapes) didn't
cover. Each decorrelates to a plain Spark plan:

- EXISTS            → left-semi join          (q_order_priority_count)
- COUNT per key,
  then histogram    → two chained aggs        (q_customer_distribution)
- = (SELECT MAX …)  → empty-frame window max  (q_top_supplier)
- IN (… HAVING …)   → agg → filter → join     (q_big_orders)

Money/quantity sums go through DECIMAL(18,2) so they are
order-independent and oracle-bit-equal (see registry.py discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize

_REVENUE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@query(
    "q_order_priority_count",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-07-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-sliced orders that have at least one
    returned line, counted by priority. The EXISTS decorrelates to a
    left-semi join — probe side never duplicates, no distinct needed —
    and the date range prunes the orders scan before the join."""
    orders = load(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).filter(
        (F.to_date("o_orderdate") >= F.lit("1997-07-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-10-01").cast("date"))
    )
    returned = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"]).filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram including
    zero-order customers — the left outer join keeps them,
    count(o_orderkey) ignores the null rows they carry, and a second
    aggregation buckets the counts. Two shuffles total (custkey, then
    c_count); the join predicate's extra conjunct rides the join
    rather than filtering customers."""
    cust = load(spark, sf_dir, "customer", columns=["c_custkey"])
    orders = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderstatus"])
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus != "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({_REVENUE}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue. The
    scalar subquery becomes max() over an empty window frame on the
    already-aggregated (tiny) per-supplier rows — one pass, no
    self-join, no second scan of lineitem."""
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue).cast("double").alias("total_revenue")
    )
    best = rev.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    supp = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return supp.join(
        F.broadcast(best), supp.s_suppkey == best.supplier_no
    ).select("s_suppkey", "s_name", "total_revenue")


@query(
    "q_big_orders",
    oracle="""
SELECT o_orderkey, o_orderdate_s AS orderdate, o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT o_orderkey,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate_s,
         o_totalprice,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey, o_orderdate, o_totalprice
)
WHERE total_qty > 150
""",
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose lines sum past a quantity
    threshold — the IN (… GROUP BY … HAVING …) pattern, flattened to
    one join + one agg + a post-agg filter (Catalyst's decorrelated
    form). Grouping by the order key carries the order attributes
    through the agg instead of joining back a second time."""
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .select(
            "o_orderkey",
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# G41 — supplier reliability scorecard (return rate)
# ---------------------------------------------------------------------------


@query(
    "q_supplier_reliability",
    oracle="""
WITH sc AS (
  SELECT s.s_suppkey, s.s_name,
         CAST(COUNT(*) AS BIGINT) AS n_shipments,
         CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS BIGINT) AS n_returned,
         CASE WHEN abs(CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS DOUBLE)
               / COUNT(*)) < 4.5e9 THEN floor((CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS DOUBLE)
               / COUNT(*)) * 1e6 + 0.5) / 1e6 ELSE (CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS DOUBLE)
               / COUNT(*)) END AS return_rate
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_suppkey, s.s_name
)
SELECT s_suppkey, s_name, n_shipments, n_returned, return_rate,
       CAST(ROW_NUMBER() OVER (ORDER BY return_rate DESC, s_suppkey) AS BIGINT) AS worst_rank
FROM sc
""",
)
def q_supplier_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier reliability scorecard: per-supplier shipment counts,
    returned lineitems (l_returnflag = 'R' — the Q10 returned-item
    predicate, scorecard form), return rate, and worst-first rank.
    The supplier dim broadcasts onto the lineitem spine; the rank
    window runs over the |suppliers|-sized scorecard, never facts;
    the scan prunes to 2 fact columns."""
    li = load(spark, sf_dir, "lineitem", columns=["l_suppkey", "l_returnflag"])
    sup = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    ret = F.count(F.when(F.col("l_returnflag") == "R", 1))
    sc = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            ret.alias("n_returned"),
            floor_quantize(ret.cast("double") / F.count(F.lit(1)), 6).alias("return_rate"),
        )
    )
    w = Window.orderBy(F.col("return_rate").desc(), "s_suppkey")
    return sc.withColumn("worst_rank", F.row_number().over(w).cast("long"))
