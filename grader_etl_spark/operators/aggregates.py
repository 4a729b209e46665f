"""Aggregation operators (SURVEY.md §2.5 A1–A6, §2.6 G1–G2).

The reference's entire query surface is one global conditional-count
aggregation executed by PostgreSQL (/root/reference/main.py:278-289).
Here it becomes a single ``df.agg(...)`` — Catalyst plans it as a
partial (map-side) + final HashAggregate pair, so at 100 TB each
executor pre-aggregates its partitions and only 7 numbers per task
cross the wire. The grouped/rollup variants generalize it.

Numeric-parity policy (vs the DuckDB oracle): counts are exact;
money/quantity columns are exact 2-decimal values stored as doubles,
so casting them to DECIMAL(18,2) *per row* is lossless and makes the
sums order-independent and bit-equal across engines; final ratios are
computed in double from already-equal inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.constants import CHECK_TYPE, REPORT_DATE, RUN_TYPE, SUCCESS_TYPE
from grader_etl_spark.io import fan_out, load, scatter_cap
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize

# ---------------------------------------------------------------------------
# q_daily_report — the reference's one query (main.py:278-289), Spark-first.
# ---------------------------------------------------------------------------

_DAILY_REPORT_ORACLE = f"""
SELECT
  CAST(DATE '{REPORT_DATE}' AS VARCHAR)                        AS report_date,
  COUNT(*)                                                     AS total_attempts,
  COUNT(CASE WHEN event_type = '{SUCCESS_TYPE}' THEN 1 END)    AS successful_attempts,
  CASE WHEN COUNT(*) = 0 THEN 0.0
       ELSE CASE WHEN abs(CAST(COUNT(CASE WHEN event_type = '{SUCCESS_TYPE}' THEN 1 END) AS DOUBLE)
                  * 100 / CAST(COUNT(*) AS DOUBLE)) < 4.5e9 THEN floor((CAST(COUNT(CASE WHEN event_type = '{SUCCESS_TYPE}' THEN 1 END) AS DOUBLE)
                  * 100 / CAST(COUNT(*) AS DOUBLE)) * 1e2 + 0.5) / 1e2 ELSE (CAST(COUNT(CASE WHEN event_type = '{SUCCESS_TYPE}' THEN 1 END) AS DOUBLE)
                  * 100 / CAST(COUNT(*) AS DOUBLE)) END
  END                                                          AS success_percentage,
  COUNT(DISTINCT user_id)                                      AS unique_users,
  COUNT(CASE WHEN event_type = '{RUN_TYPE}' THEN 1 END)        AS run_attempts,
  COUNT(CASE WHEN event_type = '{CHECK_TYPE}' THEN 1 END)      AS check_attempts
FROM events
WHERE CAST(ts AS DATE) = DATE '{REPORT_DATE}'
"""


def daily_report(events: DataFrame, report_date: str = REPORT_DATE) -> DataFrame:
    """The 7-metric daily report (A1–A6 + F3 + P5/P6) over any events df.

    Spark rendition of /root/reference/main.py:278-289 with the
    zero-row guard of main.py:293-315 folded into the plan (the
    reference guards caller-side; we return the all-zero row from the
    engine so an empty day can never produce null/NaN).
    """
    success = F.count(F.when(F.col("event_type") == SUCCESS_TYPE, 1))
    total = F.count(F.lit(1))
    return (
        events.filter(F.to_date("ts") == F.lit(report_date).cast("date"))
        .agg(
            total.alias("total_attempts"),
            success.alias("successful_attempts"),
            F.when(total == 0, F.lit(0.0))
            .otherwise(floor_quantize(success.cast("double") * 100 / total.cast("double"), 2))
            .alias("success_percentage"),
            F.countDistinct("user_id").alias("unique_users"),
            F.count(F.when(F.col("event_type") == RUN_TYPE, 1)).alias("run_attempts"),
            F.count(F.when(F.col("event_type") == CHECK_TYPE, 1)).alias("check_attempts"),
        )
        .select(F.lit(report_date).alias("report_date"), "*")
    )


@query("q_daily_report", oracle=_DAILY_REPORT_ORACLE)
def q_daily_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A6: global conditional-count aggregate with date filter."""
    return daily_report(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# q_distinct_users — A4 generalized to a grouped exact distinct count.
# ---------------------------------------------------------------------------


@query(
    "q_distinct_users",
    oracle="""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
       COUNT(DISTINCT user_id)                AS unique_users
FROM events
GROUP BY 1
""",
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: exact COUNT(DISTINCT) per day (main.py:284, generalized).

    Exact distinct needs a shuffle on (day, user_id); at 100 TB the
    documented scale variant is approx_count_distinct (HLL, no second
    shuffle) — kept exact here because the reference is exact.
    """
    return (
        load(spark, sf_dir, "events", columns=["ts", "user_id"])
        .groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("event_date"))
        .agg(F.countDistinct("user_id").alias("unique_users"))
    )


# ---------------------------------------------------------------------------
# q_conditional_counts — A2/A5: CASE-WHEN counts as a manual pivot.
# ---------------------------------------------------------------------------


@query(
    "q_conditional_counts",
    oracle=f"""
SELECT
  COUNT(CASE WHEN event_type = '{RUN_TYPE}' THEN 1 END)   AS run_attempts,
  COUNT(CASE WHEN event_type = '{CHECK_TYPE}' THEN 1 END) AS check_attempts,
  COUNT(CASE WHEN event_type = '{SUCCESS_TYPE}' THEN 1 END) AS successful_attempts
FROM events
""",
)
def q_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A5: conditional counts over enum predicates (main.py:283,285-286)."""
    ev = load(spark, sf_dir, "events", columns=["event_type"])
    return ev.agg(
        F.count(F.when(F.col("event_type") == RUN_TYPE, 1)).alias("run_attempts"),
        F.count(F.when(F.col("event_type") == CHECK_TYPE, 1)).alias("check_attempts"),
        F.count(F.when(F.col("event_type") == SUCCESS_TYPE, 1)).alias("successful_attempts"),
    )


# ---------------------------------------------------------------------------
# q_pivot_attempt_type — A5 done idiomatically with pivot().
# ---------------------------------------------------------------------------


@query(
    "q_pivot_attempt_type",
    oracle=f"""
SELECT
  COUNT(CASE WHEN event_type = '{RUN_TYPE}' THEN 1 END)   AS "{RUN_TYPE}",
  COUNT(CASE WHEN event_type = '{CHECK_TYPE}' THEN 1 END) AS "{CHECK_TYPE}"
FROM events
""",
)
def q_pivot_attempt_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 as a pivot: the reference hand-writes a 2-value pivot with two
    CASE columns (main.py:285-286); ``pivot`` with explicit values keeps
    the plan a single pass (no distinct-values pre-query)."""
    ev = load(spark, sf_dir, "events", columns=["event_type"])
    return (
        ev.groupBy()
        .pivot("event_type", [RUN_TYPE, CHECK_TYPE])
        .count()
        .na.fill(0)  # empty-input parity with the oracle's COUNT()=0
    )


# ---------------------------------------------------------------------------
# q_group_agg — G1: the grouped generalization of A1-A5.
# ---------------------------------------------------------------------------


@query(
    "q_group_agg",
    oracle="""
SELECT event_type,
       COUNT(*)                                                AS n_events,
       COUNT(DISTINCT user_id)                                 AS unique_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)       AS total_value,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(*) AS DOUBLE)                              AS avg_value
FROM events
GROUP BY event_type
""",
)
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: groupBy().agg() — partial+final hash aggregation.

    The decimal cast makes SUM order-independent (exact), so the value
    hash matches the oracle no matter how partitions combine.
    """
    ev = load(spark, sf_dir, "events", columns=["event_type", "user_id", "value"])
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("unique_users"),
        dec_sum.alias("total_value"),
        (dec_sum / F.count(F.lit(1))).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# q_rollup — G2: rollup / grouping sets.
# ---------------------------------------------------------------------------


@query(
    "q_rollup",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       COUNT(*)                                              AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
-- HAVING: Spark's grouping-set aggregates emit NO groups from zero
-- rows, while ANSI emits the empty grand-total group; count(*)>0 is
-- a no-op on non-empty input and pins the Spark semantics
HAVING COUNT(*) > 0
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: hierarchical subtotal aggregation via rollup().

    Catalyst expands the rollup into grouping sets inside one Expand +
    aggregate — a single shuffle, not one job per level.
    """
    # fan_out: the rollup's Expand (3× rows) + exact-decimal partials
    # otherwise run on the one-row-group scan's 1-3 tasks (q_corr_matrix
    # discipline); no-op on a many-split table.
    li = fan_out(
        load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"]),
        max_bytes=scatter_cap(),
    )
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# q_cube — G2 continued: cube over two independent dimensions.
# ---------------------------------------------------------------------------


@query(
    "q_cube",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*)                                                  AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)  AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
-- HAVING: Spark's grouping-set aggregates emit NO groups from zero
-- rows, while ANSI emits the empty grand-total group; count(*)>0 is
-- a no-op on non-empty input and pins the Spark semantics
HAVING COUNT(*) > 0
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: cube — all 4 grouping sets of (status, priority) in one
    Expand + single-shuffle aggregate (vs 4 separate jobs)."""
    od = load(spark, sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return od.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# q_approx_distinct — A4's documented 100 TB scale variant.
# ---------------------------------------------------------------------------


@query(
    "q_approx_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_unique_users,
       TRUE                    AS approx_within_10pct
FROM events
GROUP BY 1
""",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the scale path for A4 —
    one pass, no per-key shuffle state, mergeable sketches. The
    PRODUCTION aggregate is the sketch alone; here the exact twin
    rides along so the driver's value compare is a real check — the
    oracle verifies the exact column and the in-band boolean (engines'
    HLL implementations differ, so the raw estimate itself can't be
    cross-checked). tests/test_approx.py additionally bounds the raw
    sketch error."""
    ev = load(spark, sf_dir, "events", columns=["event_type", "user_id"])
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_unique_users"),
            F.approx_count_distinct("user_id").alias("__approx"),
        )
        .select(
            "event_type",
            "exact_unique_users",
            (
                F.abs(F.col("__approx") - F.col("exact_unique_users"))
                <= F.lit(0.10) * F.col("exact_unique_users")
            ).alias("approx_within_10pct"),
        )
    )


# ---------------------------------------------------------------------------
# q_pricing_summary — the bench headline: TPC-H Q1-shaped scan+agg.
# ---------------------------------------------------------------------------


@query(
    "q_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))
           * CAST(1 + CAST(l_tax AS DECIMAL(3,2)) AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
       / COUNT(*) AS DOUBLE)                                     AS avg_qty,
  COUNT(*)                                                       AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2024-11-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary scan+agg (TPC-H Q1 shape) — the throughput
    headline for bench.py: one wide scan, pushed-down date filter,
    map-side partial aggregation into a handful of groups.

    Per-row products are computed in exact decimal so the sums are
    order-independent — and the whole expression stays inside
    whole-stage codegen (no UDFs).

    Width discipline: price at (18,2) and the (1±x) factors pinned
    NARROW at (3,2) keep the triple product at (26,6)/(24,6) — exact
    in both engines up to ~1e16 prices (the adversarial-magnitude
    fuzz regime). The factors must NOT widen: with (18,2) factors the
    product's formal width is 56 — past the 38-digit cap — and each
    engine silently applies its own precision-loss rule (measured as
    a 6e-5 sum_charge split at the 100× probe scale). The original
    (12,2) price overflowed at 1e10+ prices (ANSI raise on Spark 4,
    cast error on DuckDB — magnitude campaign, seed 5401).

    The oracle's final decimal→DOUBLE casts round-trip through
    VARCHAR: DuckDB's native decimal→double cast is not correctly
    rounded (measured one ulp off at ~5e11 with scale 6; its
    string→double parse IS correctly rounded, like Spark's
    BigDecimal path), and the query's contract is "the nearest
    double to the exact decimal sum" at every scale.
    """
    # NOT scattered: this query is in the pinned constant-shuffle
    # contract class (tests/test_shuffle_contract.py) — its exchange
    # must carry O(groups); a local scatter would trade that for
    # O(rows) whenever the partition guard fires.
    li = load(
        spark, sf_dir, "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(3,2)")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2024-11-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc).cast("decimal(3,2)")).cast("double").alias("sum_disc_price"),
            F.sum(
                price
                * (F.lit(1) - disc).cast("decimal(3,2)")
                * (F.lit(1) + tax).cast("decimal(3,2)")
            ).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
-- HAVING: Spark's grouping-set aggregates emit NO groups from zero
-- rows, while ANSI emits the empty grand-total group; count(*)>0 is
-- a no-op on non-empty input and pins the Spark semantics
HAVING COUNT(*) > 0
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 completed: explicit GROUPING SETS (an arbitrary subset
    lattice, here pair + status + grand total — what rollup/cube can't
    pick freely) with grouping_id disambiguating real NULLs from
    subtotal NULLs. Spark plans this as ONE scan + Expand (each row
    emitted once per set) + a single hash agg — sets don't multiply
    scans."""
    o = load(spark, sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "q_argmax",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rl,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id ASC)  AS rf
  FROM events
)
SELECT user_id,
       MAX(CASE WHEN rl = 1 THEN event_type END) AS last_type,
       MAX(CASE WHEN rl = 1 THEN value END)      AS last_value,
       MAX(CASE WHEN rf = 1 THEN event_type END) AS first_type,
       MAX(event_id)                             AS last_event_id
FROM seq
GROUP BY user_id
""",
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (max_by/min_by): per user, the
    attributes of the highest/lowest-sequence event WITHOUT a
    row_number window or self-join — one hash aggregate carrying
    (key, ordering value) pairs, partial-merged map-side. The
    ordering key is the unique event_id so the winner is total-order
    deterministic on both engines. The oracle spells the same
    semantics with a row_number window instead of DuckDB's arg_max:
    arg_max SKIPS rows whose attribute is NULL, while max_by returns
    the winning row's actual attribute, NULL included — the honest
    reading of "the last event's value" (nulls fuzz shape)."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_type"),
        F.max_by("value", "event_id").alias("last_value"),
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max("event_id").alias("last_event_id"),
    )


@query(
    "q_mode",
    oracle="""
WITH counted AS (
  SELECT user_id, event_type, COUNT(*) AS mode_cnt
  FROM events
  GROUP BY user_id, event_type
), ranked AS (
  SELECT user_id, event_type, mode_cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY mode_cnt DESC, event_type NULLS FIRST) AS rn
  FROM counted
)
SELECT user_id, event_type AS mode_event_type, mode_cnt
FROM ranked WHERE rn = 1
""",
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each user's most frequent event
    type (ties broken alphabetically — Spark's built-in mode() makes
    no tie promise, so the engine computes mode as count + top-1,
    which IS deterministic and what the oracle replays). Complements
    q_argmax: max_by picks the attribute of an extreme MEASURE; mode
    picks the most FREQUENT value.

    Shape: partial-agg to (user, type) counts first — the row_number
    window then runs on the reduced frame and rides the same user_id
    partitioning, so the mode costs one map-combined shuffle plus a
    per-user top-1 over ≤5 rows."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_type"])
    counted = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("mode_cnt"))
    # tiebreak NULLS FIRST pinned (Spark asc default; DuckDB is NULLS LAST)
    w = Window.partitionBy("user_id").orderBy(F.desc("mode_cnt"), F.col("event_type").asc_nulls_first())
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), "mode_cnt")
    )


@query(
    "q_pivot_multi",
    oracle="""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END)     AS view_n,
       CAST(SUM(CASE WHEN event_type = 'view'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)     AS view_v,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END)    AS click_n,
       CAST(SUM(CASE WHEN event_type = 'click'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)     AS click_v,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_n,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)     AS purchase_v
FROM events
GROUP BY 1
""",
)
def q_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivot value (A5 extended):
    daily event counts AND decimal-exact value sums per event type in
    one pass. Spark's pivot with a pinned value list compiles to one
    hash aggregate whose state is |dates| × (3 types × 2 aggs) — no
    extra shuffle over the plain groupBy, and the pinned list keeps
    the plan static (no driver-side distinct pre-query). Sums ride
    DECIMAL then surface as DOUBLE (registry value discipline).
    Counts are coalesced to 0: a day with no events of some type is
    a NULL pivot cell in Spark but a 0 in the oracle's COUNT(CASE),
    and real corpora have such days (fuzz: test_fuzz_sweep)."""
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d"))
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        )
    )
    zn = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)  # noqa: E731
    return piv.select(
        "d",
        zn("view_n"), F.col("view_v"),
        zn("click_n"), F.col("click_v"),
        zn("purchase_n"), F.col("purchase_v"),
    )
