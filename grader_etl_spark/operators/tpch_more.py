"""Remaining TPC-H query shapes (Q7/Q8/Q10/Q11/Q14/Q16/Q17/Q19/Q21/Q22
analogs), adapted to the driver fixture schema (no partsupp table, no
l_shipmode/commitdate columns — see FIXTURES.md §2.2). The reference
has no joins at all (`main.py:278-289` is its only SQL), so this whole
relational layer is north-star breadth; each query demonstrates one
decorrelation / planning pattern the previous batches didn't:

- two-sided dimension pair filter        → q_nation_volume      (Q7)
- conditional share-of-total by group    → q_market_share       (Q8)
- grouped top-k with carried attributes  → q_returned_revenue   (Q10)
- HAVING vs global-scalar fraction       → q_important_parts    (Q11)
- conditional ratio over a join          → q_promo_revenue      (Q14)
- NOT IN exclusion + count distinct      → q_parts_supplier_count (Q16)
- correlated per-key AVG threshold       → q_small_qty_revenue  (Q17)
- disjunctive cross-table predicate      → q_disjunctive_pushdown (Q19)
- EXISTS + NOT EXISTS self-correlation   → q_waiting_suppliers  (Q21)
- global-avg filter + anti join          → q_idle_customers     (Q22)

Exactness discipline (registry.py): every money/quantity sum goes
through DECIMAL(18,2) so aggregation is order-independent; every
scalar-subquery comparison is rearranged into integer-scaled decimal
form (``x * n > sum`` instead of ``x > sum/n``) so no engine ever
divides — the oracle match is bit-exact, not epsilon.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize

_DEC = "decimal(18,2)"
_REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))


@query(
    "q_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS l_year,
         {_REVENUE_SQL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    ship year. The nation-pair disjunction is applied as an IN filter
    on EACH broadcast nation dim BEFORE the joins (pruning supplier
    and customer down to two nations' worth early), then the
    cross-pair condition reduces to supp_nation != cust_nation.
    Lineitem is scanned once with the date range pushed to parquet;
    the two fact joins shuffle only pre-pruned rows."""
    two = ["NATION_3", "NATION_7"]
    nat = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"]).filter(
        F.col("n_name").isin(two)
    )
    supp = (
        load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).filter(
        F.to_date("l_shipdate").between(
            F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date")
        )
    )
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("long").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q_market_share",
    oracle=f"""
SELECT o_year,
       CASE WHEN abs(100.0 * CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume END),
                                   0) AS DOUBLE)
                   / CAST(SUM(volume) AS DOUBLE)) < 4.5e9 THEN floor((100.0 * CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume END),
                                   0) AS DOUBLE)
                   / CAST(SUM(volume) AS DOUBLE)) * 1e2 + 0.5) / 1e2 ELSE (100.0 * CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume END),
                                   0) AS DOUBLE)
                   / CAST(SUM(volume) AS DOUBLE)) END AS mkt_share
FROM (
  SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS o_year,
         {_REVENUE_SQL} AS volume,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region    ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
)
GROUP BY o_year
""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional order volume per
    year — a conditional-sum / total-sum ratio inside one grouped
    aggregate (no second pass, no self-join). All dims (part filtered
    to one type, supplier+nation, customer+nation+region) broadcast
    around the orders⋈lineitem spine, so the only shuffles are the
    fact join and the final tiny per-year agg."""
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_type"]).filter(
        F.col("p_type") == "PROMO"
    )
    nat = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = load(spark, sf_dir, "region", columns=["r_regionkey", "r_name"]).filter(
        F.col("r_name") == "EUROPE"
    )
    supp = (
        load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
        .join(F.broadcast(nat.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_eu = (
        load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        .join(F.broadcast(nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
                          .select("n_nationkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).filter(
        F.to_date("o_orderdate").between(
            F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date")
        )
    )
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    vol = _revenue()
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_eu, orders.o_custkey == cust_eu.c_custkey)
        .select(
            F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    num = F.coalesce(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))),
        F.lit(0).cast(_DEC),
    )
    return joined.groupBy("o_year").agg(
        floor_quantize(
            F.lit(100.0) * num.cast("double") / F.sum("volume").cast("double"), 2).alias("mkt_share")
    )


@query(
    "q_returned_revenue",
    oracle=f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name, c_mktsegment
FROM (
  SELECT c_custkey, c_name, CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue,
         c_acctbal, n_name, c_mktsegment
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-07-01'
    AND CAST(o_orderdate AS DATE) <  DATE '1997-10-01'
    AND l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
)
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter. Customer attributes ride the grouping key (no
    join-back after the agg); the final top-k compiles to
    TakeOrderedAndProject — per-partition heaps, only 20 rows reach
    the driver side of the sort. c_custkey tie-break keeps the cutoff
    deterministic for the oracle."""
    cust = load(
        spark, sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    nat = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).filter(
        (F.to_date("o_orderdate") >= F.lit("1997-07-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-10-01").cast("date"))
    )
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
    )


@query(
    "q_important_parts",
    oracle=f"""
WITH pr AS (
  SELECT l_partkey, SUM({_REVENUE_SQL}) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM pr
WHERE val * 1500 > (SELECT SUM(val) FROM pr)
""",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds 0.5% of total —
    a HAVING against a global scalar subquery. The per-part aggregate
    is computed once and reused for both sides (Spark: the grand total
    is a 1-row agg of the per-part frame, broadcast back via cross
    join — no second lineitem scan, no single-partition window). The
    threshold is integer-rescaled (val*1500 > total) so the comparison
    is exact decimal, never a division."""
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    pr = li.groupBy("l_partkey").agg(F.sum(_revenue()).alias("val"))
    total = pr.agg(F.sum("val").alias("grand_total"))
    return (
        pr.crossJoin(F.broadcast(total))
        .filter(F.col("val") * 1500 > F.col("grand_total"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


@query(
    "q_promo_revenue",
    oracle=f"""
SELECT CASE WHEN abs(100.0 * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} END), 0) AS DOUBLE)
            / CAST(SUM({_REVENUE_SQL}) AS DOUBLE)) < 4.5e9 THEN floor((100.0 * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} END), 0) AS DOUBLE)
            / CAST(SUM({_REVENUE_SQL}) AS DOUBLE)) * 1e2 + 0.5) / 1e2 ELSE (100.0 * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} END), 0) AS DOUBLE)
            / CAST(SUM({_REVENUE_SQL}) AS DOUBLE)) END AS promo_share,
       CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} END), 0) AS DOUBLE) AS promo_revenue,
       CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-10-01'
""",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of one month's revenue — a
    conditional-sum ratio over a fact⋈dim join, one output row. The
    part dim broadcasts; the ship-month range prunes the lineitem scan
    before the join; numerator and denominator come out of the same
    single aggregate."""
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).filter(
        (F.to_date("l_shipdate") >= F.lit("1997-09-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-10-01").cast("date"))
    )
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    rev = _revenue()
    promo = F.coalesce(
        F.sum(F.when(F.col("p_type") == "PROMO", rev)), F.lit(0).cast(_DEC)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            floor_quantize(F.lit(100.0) * promo.cast("double") / F.sum(rev).cast("double"), 2)
            .alias("promo_share"),
            promo.cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


@query(
    "q_parts_supplier_count",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#11'
  AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 3000)
GROUP BY p_brand, p_type, p_size
""",
)
def q_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part profile with
    a NOT IN supplier exclusion. The NOT IN decorrelates to a
    broadcast left-anti join (s_suppkey is non-nullable, so anti join
    and NOT IN agree); the part dim filters broadcast-side before the
    fact join; the exact distinct count expands to (group, suppkey)
    pairs only after both prunes."""
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]).filter(
        (F.col("p_brand") != "Brand#11") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad_supp = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]).filter(
        F.col("s_acctbal") < 3000
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_small_qty_revenue",
    oracle="""
WITH pq AS (
  SELECT l_partkey AS pq_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq   ON pq_partkey = l_partkey
WHERE p_brand = 'Brand#11'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of a part's
    average quantity. The correlated scalar AVG decorrelates to one
    per-partkey aggregate joined back to lineitem; the threshold
    ``qty < 0.2 * avg`` is rescaled to ``qty * 5 * cnt < sum_qty`` so
    the filter compares exact decimals (no double division whose
    rounding could flip a boundary row between engines)."""
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_brand"]).filter(
        F.col("p_brand") == "Brand#11"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .filter(F.col("l_quantity").cast(_DEC) * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (
                F.coalesce(
                    F.sum(F.col("l_extendedprice").cast(_DEC)), F.lit(0).cast(_DEC)
                ).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "q_disjunctive_pushdown",
    oracle=f"""
SELECT CAST(COALESCE(SUM({_REVENUE_SQL}), 0) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three cross-table
    conjunct brackets. Catalyst derives the single-side residuals from
    the DNF — part scans only rows matching ANY brand+size bracket,
    lineitem only quantities in the union range [1,30] — then applies
    the full disjunction as a post-join filter; the join itself stays
    a broadcast equi-join on partkey rather than degrading to a
    nested-loop over the OR."""
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.coalesce(F.sum(_revenue()), F.lit(0).cast(_DEC))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q_waiting_suppliers",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for returns on
    multi-supplier finished orders. Both correlated subqueries (EXISTS
    another-supplier line; NOT EXISTS another-supplier RETURN line)
    collapse into ONE per-order aggregate — n_supp = distinct
    suppliers, r_supp = distinct suppliers with returns — joined back
    once: EXISTS ⟺ n_supp ≥ 2, NOT EXISTS ⟺ r_supp = 1 (the probing
    line is itself a return, so a singleton return-supplier set must
    be its own). One extra shuffle instead of two self-join subtrees
    over the fact table."""
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("r_supp"),
    )
    orders_f = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]).filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(orders_f, l1.l_orderkey == orders_f.o_orderkey, "left_semi")
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("r_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@query(
    "q_idle_customers",
    oracle="""
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY c_mktsegment
""",
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no pending orders,
    bucketed by market segment. The global-average threshold becomes a
    1-row broadcast cross join with the comparison integer-rescaled
    (bal * n > sum — exact decimal, no division); the NOT EXISTS
    becomes a left-anti join against the (status-pruned) orders fact
    keyed on custkey."""
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_acctbal", "c_mktsegment"])
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(_DEC)).alias("s"),
        F.count("*").alias("n"),
    )
    orders = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]).filter(
        F.col("o_orderstatus") == "P"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast(_DEC) * F.col("n") > F.col("s"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q_forecast_revenue",
    oracle=f"""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS potential_revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1996-01-01'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): a pure
    filter-and-aggregate with zero joins — the canonical predicate-
    pushdown + map-side-combine throughput probe. All four predicates
    reach the parquet scan (shipdate range prunes row groups on
    min/max footers at scale); the aggregate state is one
    (decimal, count) pair per task. Discount compares as DECIMAL so
    the 0.05/0.07 boundaries are exact on both engines."""
    li = load(
        spark, sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    d = F.col("l_discount").cast(_DEC)
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1996-01-01").cast("date"))
            & d.between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC) * d)
            .cast("double")
            .alias("potential_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
