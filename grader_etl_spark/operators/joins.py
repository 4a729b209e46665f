"""Join operators (SURVEY.md §2.6 J1–J5).

The reference has no joins (evidence: SURVEY.md §2.6); these are the
standard relational layer, all built-in Spark. Scale notes per shape:

- equi-joins shuffle both sides on the key — at 100 TB the win is
  broadcasting every dimension that fits (region/nation/customer dims
  here) so the fact table never shuffles; AQE demotes a broadcast that
  turns out too big and splits skewed partitions.
- semi/anti joins ship only the key column of the probe side.
- the range join uses a tiny literal band table → broadcast
  nested-loop, the right plan when one side is O(10) rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from grader_etl_spark.io import load
from grader_etl_spark.registry import query

# ---------------------------------------------------------------------------
# J1 — inner equi-join
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_orderstatus
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join orders⋈customer; planner picks
    broadcast-hash here (customer is small) or sort-merge at scale."""
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_orderstatus"
    )


# ---------------------------------------------------------------------------
# J2 — outer join (left), preserving customers with no orders
# ---------------------------------------------------------------------------


@query(
    "q_join_outer",
    oracle="""
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join + grouped count; COUNT(col) skips the
    null-extended rows, so zero-order customers show n_orders = 0."""
    cust = load(spark, sf_dir, "customer", columns=["c_custkey"])
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# J3 — broadcast dimension joins (star-schema revenue rollup)
# ---------------------------------------------------------------------------


@query(
    "q_join_broadcast",
    oracle="""
SELECT r.r_name,
       COUNT(*)                                                  AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders o
JOIN customer c ON o.o_custkey   = c.c_custkey
JOIN nation   n ON c.c_nationkey = n.n_nationkey
JOIN region   r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: star join with every dimension broadcast — the fact table
    (orders) streams through three map-side hash joins with zero
    shuffles before the final 5-group aggregate."""
    orders = load(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = load(spark, sf_dir, "region", columns=["r_regionkey", "r_name"])
    return (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — semi / anti joins
# ---------------------------------------------------------------------------


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4a: left-semi join — customers having ≥1 order; only the key
    column of orders crosses the wire, no row multiplication."""
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = load(spark, sf_dir, "orders", columns=["o_custkey"])
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4b: left-anti join — customers with no orders; the same shape
    powers the cross-batch idempotent insert (operators/dedup.py)."""
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = load(spark, sf_dir, "orders", columns=["o_custkey"])
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


# ---------------------------------------------------------------------------
# J5 — range (theta) join against a literal band table
# ---------------------------------------------------------------------------

_BANDS = [
    (0.0, 500.0, "budget"),
    (500.0, 1000.0, "mid"),
    (1000.0, 1500.0, "premium"),
    (1500.0, 1e9, "luxury"),
]

_BANDS_SQL = ", ".join(f"({lo}, {hi}, '{name}')" for lo, hi, name in _BANDS)


@query(
    "q_join_range",
    oracle=f"""
SELECT p.p_partkey, b.band
FROM part p
JOIN (VALUES {_BANDS_SQL}) AS b(lo, hi, band)
  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: non-equi join on half-open price bands. The band side is
    O(1) rows → broadcast nested-loop join, the correct physical plan
    (each fact row tests 4 predicates map-side; nothing shuffles)."""
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    bands = spark.createDataFrame(_BANDS, "lo double, hi double, band string")
    cond = (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi)
    return part.join(broadcast(bands), cond, "inner").select("p_partkey", "band")


@query(
    "q_join_cross",
    oracle="""
SELECT r_name, c_mktsegment
FROM region
CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (the one join type J1-J8 skip):
    region × distinct market segments — the dimension-grid shape used
    to densify sparse reports (q_gap_fill builds the same grid with
    sequence+explode). Both sides reduce to a handful of rows BEFORE
    the product, so the planner picks BroadcastNestedLoopJoin and the
    blowup is |regions|·|segments|, never fact-sized. Cartesian joins
    on fact tables stay forbidden at scale — every other operator in
    the registry that could pair rows (near-dup, fuzzy, PMI) blocks
    first."""
    region = load(spark, sf_dir, "region", columns=["r_name"])
    segs = load(spark, sf_dir, "customer", columns=["c_mktsegment"]).distinct()
    return region.crossJoin(segs)


# ---------------------------------------------------------------------------
# J10 — interval-overlap join (bucketized, never a cross product)
# ---------------------------------------------------------------------------

_OVERLAP_GAP = "30 minutes"
_BUCKET_S = 3600  # 1-hour overlap buckets


@query(
    "q_interval_overlap",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
sess AS (
  SELECT user_id, MIN(ts) AS st, MAX(ts) + INTERVAL 30 MINUTE AS en
  FROM numbered GROUP BY user_id, sid
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(COUNT(*) AS BIGINT) AS n_overlaps
FROM sess a JOIN sess b
  ON a.user_id < b.user_id AND a.st < b.en AND b.st < a.en
GROUP BY 1, 2
""",
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join: pairs of different users whose activity
    sessions overlap in time, with the overlapping-session-pair count
    per user pair — the concurrency/collusion-screen shape (two
    interval tables, predicate `a.st < b.en AND b.st < a.en`).

    The naive plan is the oracle's quadratic theta-join — a cross
    product at scale. Here each session explodes into the 1-hour
    buckets it touches (bounded by session length / bucket width) and
    candidates come from an EQUI-join on the bucket id: two intervals
    can only overlap if they share a bucket, so pruning is lossless.
    The exact predicate then filters, and a distinct on the session
    pair collapses multi-bucket hits before the per-user-pair count.
    Shuffle volume is (interval × touched-buckets) rows — linear in
    total interval hours, never |sessions|². Same bucketization idiom
    as the sliding window's Expand; bucket width trades index size
    against candidate selectivity (tune to median interval length)."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts"])
    sess = (
        ev.groupBy(F.session_window("ts", _OVERLAP_GAP).alias("s"), "user_id")
        .agg(F.lit(1).alias("_one"))
        .select(
            "user_id",
            F.col("s.start").alias("st"),
            F.col("s.end").alias("en"),
        )
    )
    b = sess.withColumn(
        "hb",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("st") / _BUCKET_S),
                F.floor((F.unix_timestamp("en") - 1) / _BUCKET_S),
            )
        ),
        # both self-join sides read this frame: materialize the
        # sessionize+explode ONCE instead of twice
    ).persist()
    a, bb = b.alias("a"), b.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.st") < F.col("b.en"))
            & (F.col("b.st") < F.col("a.en")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.st").alias("st_a"),
            F.col("b.st").alias("st_b"),
        )
        .distinct()
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_overlaps")
    )


# ---------------------------------------------------------------------------
# J11 — null-safe equi-join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------


@query(
    "q_join_null_safe",
    oracle="""
WITH keyed AS (
  SELECT event_id,
         CASE WHEN event_type = 'view' THEN NULL ELSE event_type END AS k,
         value
  FROM events
),
dim AS (
  SELECT * FROM (VALUES
    ('click',    'engaged'),
    ('purchase', 'converting'),
    (NULL,       'anonymous')
  ) AS t(k, segment)
)
SELECT d.segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM keyed e JOIN dim d ON e.k IS NOT DISTINCT FROM d.k
GROUP BY d.segment
""",
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics every
    dimension lookup with an explicit 'unknown' bucket needs (a plain
    equi-join silently drops the null-keyed rows; an outer join keeps
    them but cannot route them to a chosen dim row). Physically
    ``eqNullSafe`` still plans as a hash join (null hashes like any
    key), so the broadcast-dim pattern carries over unchanged —
    exactly the property a 100 TB fact scan needs when a fraction of
    its keys are legitimately null."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    keyed = ev.select(
        "event_id",
        F.when(F.col("event_type") == "view", F.lit(None)).otherwise(F.col("event_type")).alias("k"),
        "value",
    )
    dim = ev.sparkSession.createDataFrame(
        [("click", "engaged"), ("purchase", "converting"), (None, "anonymous")],
        "k string, segment string",
    )
    return (
        keyed.join(broadcast(dim), keyed.k.eqNullSafe(dim.k))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q_wide_denorm — star-schema flattening for ML feature export (J12)
# ---------------------------------------------------------------------------


@query(
    "q_wide_denorm",
    oracle="""
SELECT o_orderkey,
       o_custkey,
       CAST(o_totalprice AS DOUBLE)                   AS order_value,
       o_orderpriority,
       CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT)  AS order_year,
       CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS order_month,
       c_mktsegment,
       CAST(c_acctbal AS DOUBLE)                      AS customer_balance,
       n_name                                         AS customer_nation,
       r_name                                         AS customer_region
FROM orders
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
""",
)
def q_wide_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema DENORMALIZATION: flatten the orders fact with its
    customer→nation→region dimension chain into one wide frame — the
    feature-store/training-table export every ML pipeline runs before
    a model ever sees the data (features must arrive as one row, not
    a join the trainer performs).

    Plan shape: the fact table streams through ONE scan; every
    dimension rides a broadcast hash join (pinned in
    tests/test_plans.py), so the flattening is map-side — zero fact
    shuffle at any scale, output written straight to the partitioned/
    sharded layouts in plans/. Date parts are derived in the same
    projection (feature engineering belongs in the export, not the
    trainer). Reference parity: the reference denormalizes implicitly
    by storing one flat table (/root/reference/main.py:180-191); this
    is that shape produced relationally."""
    orders = load(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority", "o_orderdate"],
    )
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"])
    nat = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_regionkey", "n_name"])
    reg = load(spark, sf_dir, "region", columns=["r_regionkey", "r_name"])
    d = F.to_date("o_orderdate")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("order_value"),
            "o_orderpriority",
            F.year(d).cast("long").alias("order_year"),
            F.month(d).cast("long").alias("order_month"),
            "c_mktsegment",
            F.col("c_acctbal").cast("double").alias("customer_balance"),
            F.col("n_name").alias("customer_nation"),
            F.col("r_name").alias("customer_region"),
        )
    )
