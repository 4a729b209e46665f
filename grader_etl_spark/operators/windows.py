"""Window-function operators and top-k (SURVEY.md §2.6 W1–W3, O1).

All windows partition before they sort, so at scale the shuffle is on
the partition key and each partition sorts locally — no global sort.
Top-k is orderBy().limit(k): Catalyst plans TakeOrderedAndProject,
which keeps k rows per partition and merges on the driver — never a
full sort of the table.

Determinism discipline: every ORDER BY ends with a unique tie-break
column (event_id / c_custkey / o_orderkey) so row_number/lag/limit
results are reproducible and oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize

# ---------------------------------------------------------------------------
# W1 — ranking windows
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
SELECT c_custkey,
       c_nationkey,
       ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS rn,
       RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS drnk
FROM customer
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number/rank/dense_rank per nation by balance — all three
    share one window spec, so one shuffle + one sort serves all."""
    # DESC NULLS LAST pinned (Spark desc default; DuckDB desc is NULLS FIRST)
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc_nulls_last(), "c_custkey")
    return load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]).select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


# ---------------------------------------------------------------------------
# W2 — analytic windows (lag / lead)
# ---------------------------------------------------------------------------


@query(
    "q_window_lag",
    oracle="""
SELECT event_id,
       user_id,
       LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
""",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-user event sequence neighbors (session-analysis shape)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]).select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# ---------------------------------------------------------------------------
# W3 — framed aggregate window (rolling sum)
# ---------------------------------------------------------------------------


@query(
    "q_window_rolling",
    oracle="""
SELECT event_id,
       user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_value_7
FROM events
""",
)
def q_window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: 7-row rolling sum per user (the reference's 7-day window
    spirit, main.py:25, as a frame). Decimal accumulation keeps the
    running sum exact and oracle-stable."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]).select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("rolling_value_7"),
    )


# ---------------------------------------------------------------------------
# O1 — sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: top-10 orders by price — TakeOrderedAndProject, not a full
    sort: each task keeps its local top-10, driver merges."""
    return (
        load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q_window_range_frame",
    oracle="""
SELECT event_id, user_id,
       count(*) OVER w24 AS n_events_24h,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w24 AS DOUBLE) AS sum_value_24h
FROM events
WINDOW w24 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: RANGE (value-based) frame — each event's trailing-24-hour
    per-user count and sum, where the frame boundary is event TIME,
    not row position (rows: q_window_rolling). Both engines order by
    the integer microsecond epoch so frame membership is exact (an
    interval-typed frame over float seconds could disagree at
    boundary microseconds). Same one-shuffle profile as any per-user
    window; the range frame is evaluated with a sliding two-pointer
    over each partition slice, not a per-row rescan."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    return load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]).select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_events_24h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_value_24h"),
    )


# ---------------------------------------------------------------------------
# q_topk_two_phase — hierarchical per-group top-k (O5)
# ---------------------------------------------------------------------------

TOPK_K = 5
TOPK_SALTS = 32


@query(
    "q_topk_two_phase",
    oracle=f"""
SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= {TOPK_K}
""",
)
def q_topk_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-{TOPK_K} via HIERARCHICAL (two-phase) selection —
    the executable form of the hot-group swap documented on
    q_topn_with_other, oracled against the plain one-window
    semantics (the J13/V4 discipline: scale machinery, exact
    contract).

    Why not one window: ROW_NUMBER over (group) shuffles EVERY row to
    its group's partition and sorts there — with few groups (here 5
    priorities) that is 5 reducers sorting n/5 rows each at any
    corpus size. Phase 1 instead ranks within (group, salt) where
    salt = hash(key) mod {TOPK_SALTS}: the shuffle spreads each group
    over {TOPK_SALTS} reducers, each sorting ~n/(groups·salts) rows,
    and keeps only k — a lossless prune, since a global top-k row is
    by definition top-k within its salt bucket. Phase 2 ranks the
    ≤ groups × salts × k survivors — broadcast-sized forever. Both
    phases are exact integer/decimal comparisons with the o_orderkey
    tie-break, so the result equals the naive window bit-for-bit.

    Reference parity: none (no ORDER BY in the reference,
    /root/reference/main.py:278-289); standard relational layer
    *(ext)* per SURVEY §2.6."""
    from grader_etl_spark.functions.hashing import md5_32

    od = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"])
    salted = od.withColumn(
        "salt", md5_32(F.concat(F.lit("salt:"), F.col("o_orderkey"))) % TOPK_SALTS
    )
    w1 = Window.partitionBy("o_orderpriority", "salt").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    survivors = (
        salted.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= TOPK_K)
        .drop("rk1", "salt")
    )
    w2 = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= TOPK_K)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# q_window_navigation — navigation/distribution window breadth (W14)
# ---------------------------------------------------------------------------


@query(
    "q_window_navigation",
    oracle="""
SELECT event_id,
       user_id,
       first_value(event_id) OVER w            AS first_event,
       last_value(event_id)  OVER wful         AS last_event,
       nth_value(event_id, 2) OVER wful        AS second_event,
       CASE WHEN abs(percent_rank() OVER w) < 4.5e9 THEN floor((percent_rank() OVER w) * 1e6 + 0.5) / 1e6 ELSE (percent_rank() OVER w) END         AS pct_rank,
       CASE WHEN abs(cume_dist() OVER w) < 4.5e9 THEN floor((cume_dist() OVER w) * 1e6 + 0.5) / 1e6 ELSE (cume_dist() OVER w) END            AS cume
FROM events
WINDOW w    AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
       wful AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W14: navigation + distribution window breadth in ONE pass —
    first/last/nth event per user plus each event's percent_rank and
    cume_dist within its user's timeline. All seven outputs share a
    single user_id shuffle and per-partition sort (one Window exec
    chain); last/nth need the full-partition ROWS frame (SQL's
    default frame stops at CURRENT ROW — the classic last_value
    trap, made explicit here). Ordering is (integer epoch, event_id)
    so ranks are total and engine-identical; the two distribution
    functions are single divisions of identical integers, rounded
    6 dp."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts"])
    order = [F.unix_micros("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wful = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wful).alias("last_event"),
        F.nth_value("event_id", 2).over(wful).alias("second_event"),
        floor_quantize(F.percent_rank().over(w), 6).alias("pct_rank"),
        floor_quantize(F.cume_dist().over(w), 6).alias("cume"),
    )
