"""Data-governance and engine-diagnostic operators: k-anonymity
audit (privacy), key-skew profiling (the pre-flight check before
choosing a join/partition strategy), and equi-depth histograms (the
optimizer-statistics primitive).

These matter precisely AT scale: a skew profile tells you whether the
l_partkey join needs salting before you burn a 1000-executor shuffle
discovering it, and the k-anonymity audit is the release gate a
training-data pipeline runs before publishing user-derived tables.

All pure built-in aggregations; the only window is over post-agg
frames (|groups|- or |keys|-sized, already reduced by a partial agg).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize

K_ANON = 5  # minimum acceptable quasi-identifier group size


@query(
    "q_k_anonymity",
    oracle=f"""
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS group_n,
       CAST(COUNT(*) < {K_ANON} AS BOOLEAN) AS at_risk
FROM customer
GROUP BY c_nationkey, c_mktsegment
""",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): any equivalence class smaller than
    K_ANON re-identifies its members and flags at_risk — the privacy
    release gate for user-derived tables (the PII layer next to
    q_pii_redact's content layer).

    One partial+final hash aggregate; the output is
    |nations × segments|-sized regardless of input scale, so the
    audit costs one map-side-combined shuffle at 100 TB."""
    cust = load(spark, sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("group_n"),
        (F.count("*") < K_ANON).alias("at_risk"),
    )


@query(
    "q_key_skew",
    oracle="""
WITH per_key AS (
  SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(cnt) AS BIGINT)                          AS n_rows,
       COUNT(*)                                          AS n_keys,
       MAX(cnt)                                          AS max_cnt,
       CASE WHEN abs(CAST(MAX(cnt) AS DOUBLE) * COUNT(*)
             / CAST(SUM(cnt) AS BIGINT)) < 4.5e9 THEN floor((CAST(MAX(cnt) AS DOUBLE) * COUNT(*)
             / CAST(SUM(cnt) AS BIGINT)) * 1e6 + 0.5) / 1e6 ELSE (CAST(MAX(cnt) AS DOUBLE) * COUNT(*)
             / CAST(SUM(cnt) AS BIGINT)) END              AS skew_ratio,
       CAST(quantile_cont(cnt, 0.5)  AS DOUBLE)          AS p50_cnt,
       CAST(quantile_cont(cnt, 0.99) AS DOUBLE)          AS p99_cnt
FROM per_key
""",
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for lineitem.l_partkey: row/key counts,
    the hottest key's count, skew ratio (max over mean key size — 1.0
    is perfectly uniform), and the p50/p99 of the key-size
    distribution. This is the diagnostic you run BEFORE a fact-fact
    join to decide between plain shuffle, AQE skew splitting, and
    salting (operators/skew.py).

    Per-key counts are one map-side-combined shuffle; the profile agg
    runs on the |keys|-sized frame. Percentiles of exact integer
    counts interpolate identically in both engines (q_percentiles
    precedent); the one float division is rounded to 6 dp."""
    li = load(spark, sf_dir, "lineitem", columns=["l_partkey"])
    per_key = li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    return per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        floor_quantize(
            F.max("cnt").cast("double") * F.count("*") / F.sum("cnt").cast("long"), 6).alias("skew_ratio"),
        F.percentile("cnt", F.lit(0.5)).cast("double").alias("p50_cnt"),
        F.percentile("cnt", F.lit(0.99)).cast("double").alias("p99_cnt"),
    )


EQUIDEPTH_BUCKETS = 10


@query(
    "q_equidepth_histogram",
    oracle=f"""
WITH bucketed AS (
  SELECT o_totalprice,
         NTILE({EQUIDEPTH_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey)
           AS bucket
  FROM orders
)
SELECT bucket, COUNT(*) AS n,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM bucketed
GROUP BY bucket
""",
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order totals — the
    optimizer-statistics twin of q_histogram's equi-width buckets:
    every bucket holds ~n/10 rows and the (lo, hi] bounds expose the
    distribution's shape. NTILE with an o_orderkey tie-break buckets
    identically in both engines; bounds are exact 2-decimal doubles.

    The global NTILE sort is the fixture-scale implementation; the
    documented 100 TB variant derives bucket cutoffs from
    approx_percentile (sketch merge, no global sort) and assigns
    buckets map-side — same output contract, approximate depths."""
    od = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    w = Window.orderBy("o_totalprice", "o_orderkey")
    bucketed = od.select(
        "o_totalprice", F.ntile(EQUIDEPTH_BUCKETS).over(w).cast("long").alias("bucket")
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


# ---------------------------------------------------------------------------
# G29b — the no-global-sort equi-depth swap, executable (G40b precedent)
# ---------------------------------------------------------------------------

_EQD_CUTS_SQL = ",\n         ".join(
    f"MIN(CASE WHEN cm >= ({j} * n + {EQUIDEPTH_BUCKETS - 1}) // {EQUIDEPTH_BUCKETS} "
    f"THEN cell END) AS c{j}"
    for j in range(1, EQUIDEPTH_BUCKETS)
)
_EQD_ABOVE_SQL = "\n             + ".join(
    f"(CAST(FLOOR(o_totalprice) AS BIGINT) > c{j})::INT"
    for j in range(1, EQUIDEPTH_BUCKETS)
)


@query(
    "q_equidepth_histogram_approx",
    oracle=f"""
WITH h AS (
  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS cell, COUNT(*) AS c
  FROM orders GROUP BY cell
),
cum AS (
  SELECT cell,
         SUM(c) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS cm,
         SUM(c) OVER () AS n
  FROM h
),
cuts AS (
  SELECT {_EQD_CUTS_SQL}
  FROM cum
),
bucketed AS (
  SELECT o_totalprice,
         1 + ({_EQD_ABOVE_SQL}) AS bucket
  FROM orders, cuts
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM bucketed GROUP BY bucket
""",
)
def q_equidepth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_equidepth_histogram's documented 100 TB swap, executable: the
    global NTILE total order (one reducer sees every row) is replaced
    by bucket CUTOFFS from a fixed-grid value histogram — whole-dollar
    cells, one map-side floor + a grouped count whose state is bounded
    by the money domain, not n — a cumulative pass over the COMPACT
    histogram, then map-side bucket-by-comparison against the
    broadcast 9-cell cutoff row (bucket 1 = lowest values, ascending
    like NTILE). Depth error ≤ the mass of one grid cell (pytest:
    within 5% of exact n/10, buckets contiguous, bounds nested).

    Like q_revenue_deciles_approx (the G40b precedent) and unlike a GK
    approx_percentile rendition, the grid pipeline is
    integer-deterministic end to end, so the DuckDB oracle verifies
    bucket populations and (lo, hi] bounds value-for-value."""
    od = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    cell = F.floor("o_totalprice").cast("long")
    hist = od.groupBy(cell.alias("cell")).agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "cell",
        F.sum("c").over(wc).alias("cm"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    b = EQUIDEPTH_BUCKETS
    cuts = cum.agg(
        *[
            F.min(
                F.when(F.col("cm") >= F.expr(f"({j} * n + {b - 1}) div {b}"), F.col("cell"))
            ).alias(f"c{j}")
            for j in range(1, b)
        ]
    )
    above = sum((F.col("cell") > F.col(f"c{j}")).cast("int") for j in range(1, b))
    bucketed = od.select("o_totalprice", cell.alias("cell")).crossJoin(
        F.broadcast(cuts)
    ).select("o_totalprice", (F.lit(1) + above).cast("long").alias("bucket"))
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
