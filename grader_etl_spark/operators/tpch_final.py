"""The last four TPC-H query shapes (Q2/Q9/Q12/Q20 analogs), closing
out all 22 — adapted to the fixture schema (no partsupp table, no
l_shipmode/l_commitdate columns; lineitem itself plays the
part↔supplier supply relation, FIXTURES.md §2.2). The reference repo
has no joins at all (`main.py:278-289` is its only SQL), so like
tpch_more.py this is north-star relational breadth; each query is the
canonical decorrelation pattern TPC-H uses it for:

- correlated scalar-MIN subquery       → q_min_cost_supplier (Q2)
- computed-measure profit star         → q_product_profit    (Q9)
- fact⋈fact conditional category count → q_shipmode_priority (Q12)
- correlated half-of-total threshold   → q_excess_suppliers  (Q20)

Scale notes: every dimension side (part after its filter, supplier,
nation, region) is broadcast — the only shuffles are the per-key
aggregates and, for Q12, the orderkey join of the two fact tables
(both sides 100 TB-class, so that one is a legitimate sort-merge
shuffle; bucketing both facts on orderkey — plans/bucketing.py —
removes it entirely). Exactness: quantity/price sums run as
DECIMAL(18,2) (order-independent), comparisons are integer-rescaled
(``2*pair > total`` instead of ``pair > total/2``), and doubles appear
only in final output casts from exact decimals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query

_DEC = "decimal(18,2)"


@query(
    "q_min_cost_supplier",
    oracle="""
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  JOIN part     ON p_partkey = l_partkey
  WHERE r_name = 'EUROPE' AND p_size <= 10 AND p_type = 'PROMO'
  GROUP BY 1, 2
),
best AS (
  SELECT *, MIN(supply_cost) OVER (PARTITION BY l_partkey) AS best_cost
  FROM costs
)
SELECT p_partkey, p_name, s_name, n_name,
       CAST(supply_cost AS DOUBLE) AS supply_cost
FROM best
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE supply_cost = best_cost
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the European
    supplier(s) offering it at the minimum cost — the correlated
    scalar-MIN subquery, decorrelated as one per-(part,supplier)
    aggregate plus a per-part window MIN over the aggregated frame
    (|parts|×|suppliers| rows, tiny at any fact scale, so the window's
    reshuffle is free). Part and supplier filters broadcast-prune the
    fact scan BEFORE the aggregate; ties on the minimum all survive,
    exactly like Q2's semantics. Cost stays DECIMAL until the final
    output cast."""
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = load(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = (
        load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    prt = load(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_size", "p_type"]).filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "PROMO")
    )
    li = load(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    costs = (
        li.join(F.broadcast(prt), li.l_partkey == prt.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey", "p_partkey", "p_name", "s_name", "n_name")
        .agg(F.min(F.col("l_extendedprice").cast(_DEC)).alias("supply_cost"))
    )
    best = F.min("supply_cost").over(Window.partitionBy("l_partkey"))
    return (
        costs.withColumn("best_cost", best)
        .filter(F.col("supply_cost") == F.col("best_cost"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
    )


@query(
    "q_product_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%ring%'
GROUP BY 1, 2
""",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and ship year for a
    product line, with the fixture's p_retailprice standing in for
    ps_supplycost (no partsupp table). The p_name LIKE filter prunes
    the broadcast part dim to ~12% before the fact join, so most
    lineitem rows die in the broadcast-hash probe without ever being
    shuffled; the only exchange is the final (nation, year) aggregate,
    map-side combined to |nations|×|years| rows per task. Every term
    of the profit expression is DECIMAL — the sum is
    order-independent and bit-equal to the oracle."""
    prt = load(spark, sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_name"]).filter(
        F.col("p_name").like("%ring%")
    )
    nat = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    supp = (
        load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    li = load(
        spark,
        sf_dir,
        "lineitem",
        columns=[
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    profit = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    ) - F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    return (
        li.join(F.broadcast(prt), li.l_partkey == prt.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("l_shipdate")).cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "q_shipmode_priority",
    oracle="""
SELECT l_returnflag AS ship_mode,
       CAST(COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 END) AS BIGINT) AS high_line_count,
       CAST(COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
GROUP BY 1
""",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts by category split into
    high/low-priority orders (l_returnflag stands in for the fixture's
    missing l_shipmode). The year filter is pushed into the lineitem
    parquet scan (row-group min/max pruning on l_shipdate); the
    orders⋈lineitem equi-join is the one honest fact⋈fact shuffle in
    the TPC-H set — at 100 TB both sides hash-partition on orderkey
    (or pre-bucketed layouts skip it, plans/bucketing.py), and the
    conditional counts partial-aggregate map-side to 3 rows per
    task."""
    # Range filter on the raw timestamp column (not to_date(), which
    # would block parquet predicate pushdown): under UTC, date ∈ 1997
    # ⇔ ts ∈ [1997-01-01, 1998-01-01).
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"]).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q_excess_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pair_qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND CAST(l_shipdate AS DATE)
        BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
  GROUP BY 1, 2
),
tot AS (
  SELECT *, SUM(pair_qty) OVER (PARTITION BY l_partkey) AS part_qty
  FROM shipped
)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM tot
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE pair_qty * 2 > part_qty
""",
)
def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominated the supply of some
    qualifying part (shipped more than half the part's 1996 volume) —
    Q20's nested correlated IN chain, decorrelated as one
    per-(supplier,part) quantity aggregate plus a per-part window
    total over the tiny aggregated frame. The half-of-total threshold
    is integer-rescaled (2*pair > total on DECIMAL sums) so no engine
    divides; the qualifying-supplier set is then DISTINCT'd
    (semi-join semantics) before the broadcast name joins."""
    prt = load(spark, sf_dir, "part", columns=["p_partkey", "p_name"]).filter(
        F.col("p_name").like("small%")
    )
    li = load(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).filter(
        # raw-timestamp bounds, pushdown-eligible (see q_shipmode_priority)
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(prt), li.l_partkey == prt.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("pair_qty"))
    )
    part_qty = F.sum("pair_qty").over(Window.partitionBy("l_partkey"))
    winners = (
        shipped.withColumn("part_qty", part_qty)
        .filter(F.col("pair_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nat = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    supp = (
        load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return winners.join(F.broadcast(supp), winners.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "n_name"
    )
