"""Event-lifecycle / user-journey operators over the ``events`` table
— the ETL patterns a warehouse team runs daily on an event stream like
the reference's `statistics` table (main.py:192-201): dimension
history construction (SCD2), CDC latest-wins application, sequential
funnel conversion, and cohort retention. All pure DataFrame plans,
all DuckDB-oracle-checked.

Scale notes per operator are in the docstrings; the common theme is
one shuffle per logical re-keying (user, then group), partial
aggregation before every exchange, and windows only over per-user
partitions (never a global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize


@query(
    "q_scd2_timeline",
    oracle="""
SELECT user_id,
       event_type AS state,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
FROM events
""",
)
def q_scd2_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history construction: each user's event sequence
    becomes validity intervals — valid_from = the event's own
    timestamp, valid_to = the next event's (lead), open-ended for the
    latest row. This is how a mutable dimension becomes a queryable
    history table. One shuffle (by user_id); the lead window sorts
    only within each user's partition slice, and event_id breaks
    timestamp ties deterministically."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_cdc_apply",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type AS last_op_type, value AS last_value, ts AS updated_at
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
""",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins apply: collapse a change stream to final state
    per key — the batch form of Delta's MERGE matched-update path and
    the generalization of the reference's first-writer-wins insert
    (main.py:202, inverted to last-writer-wins as CDC requires).
    'error' events act as deletes: a key whose LATEST change is a
    delete leaves the final state entirely. One shuffle; row_number
    (not orderBy+dropDuplicates, whose survivor is partition-order
    nondeterministic) picks the winner with a total (ts, event_id)
    order."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "event_type", "value", "ts"])
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("updated_at"),
        )
    )


@query(
    "q_funnel",
    oracle="""
WITH ev AS (
  SELECT * FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-03'
),
seqd AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM ev
),
v AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN seq END) AS view_seq
      FROM seqd GROUP BY user_id),
c AS (SELECT s.user_id,
             min(CASE WHEN s.event_type = 'click' AND s.seq > v.view_seq THEN s.seq END) AS click_seq
      FROM seqd s JOIN v ON s.user_id = v.user_id
      GROUP BY s.user_id),
p AS (SELECT s.user_id,
             min(CASE WHEN s.event_type = 'purchase' AND s.seq > c.click_seq THEN s.seq END) AS buy_seq
      FROM seqd s JOIN c ON s.user_id = c.user_id
      GROUP BY s.user_id)
SELECT count(*)            AS n_users,
       count(v.view_seq)   AS n_viewed,
       count(c.click_seq)  AS n_clicked,
       count(p.buy_seq)    AS n_purchased
FROM v JOIN c ON v.user_id = c.user_id
       JOIN p ON v.user_id = p.user_id
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel conversion (view → later click → later
    purchase), ORDER-SENSITIVE: a click only counts after the user's
    first view, a purchase only after that qualifying click. The Spark
    plan is ONE shuffle: per user, collect the (ts, event_id, type)
    sequence sorted, then a higher-order ``aggregate`` fold walks it
    advancing a stage counter — the state-machine semantics SQL needs
    three chained aggregates to express (the oracle's seq/min-CASE
    cascade is exactly that decorrelation). At 100 TB the fold
    variant shuffles each event exactly once and keeps no window
    state; per-user sequences are the only memory bound (here the
    funnel is scoped to a 2-day slice — which also keeps the fixture's
    conversion rates non-degenerate)."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"]).filter(
        F.to_date("ts") < F.lit("2024-01-03").cast("date")
    )
    seq = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    # Fold state: stage reached so far (0 none, 1 viewed, 2 clicked, 3 purchased).
    stage = F.aggregate(
        seq,
        F.lit(0),
        lambda acc, e: F.when((acc == 0) & (e["event_type"] == "view"), 1)
        .when((acc == 1) & (e["event_type"] == "click"), 2)
        .when((acc == 2) & (e["event_type"] == "purchase"), 3)
        .otherwise(acc),
    )
    per_user = ev.groupBy("user_id").agg(stage.alias("stage"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("stage") >= 1, 1)).alias("n_viewed"),
        F.count(F.when(F.col("stage") >= 2, 1)).alias("n_clicked"),
        F.count(F.when(F.col("stage") >= 3, 1)).alias("n_purchased"),
    )


@query(
    "q_cohort_retention",
    oracle="""
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
)
SELECT strftime(cohort_date, '%Y-%m-%d') AS cohort_date,
       datediff('day', cohort_date, CAST(ts AS DATE)) AS day_offset,
       count(DISTINCT e.user_id) AS active_users
FROM events e JOIN f ON e.user_id = f.user_id
WHERE datediff('day', cohort_date, CAST(ts AS DATE)) BETWEEN 0 AND 7
GROUP BY cohort_date, day_offset
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen date, activity
    counted per day offset 0..7 — the standard retention triangle.
    Two shuffles (per-user min for the cohort, then the cohort×offset
    agg); the cohort frame is user_id + one date, so the join back to
    events hashes a narrow build side. countDistinct is exact to match
    the oracle; approx_count_distinct is the documented 100 TB
    variant (see q_approx_distinct)."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts"])
    cohort = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_date"))
    off = F.datediff(F.to_date("ts"), F.col("cohort_date"))
    return (
        ev.join(cohort, "user_id")
        .filter(off.between(0, 7))
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            off.cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "q_point_in_time",
    oracle="""
WITH tl AS (
  SELECT user_id, event_type AS state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM events
)
SELECT user_id, state, valid_from
FROM tl
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
""",
)
def q_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read over the SCD2 history: each
    user's active state AS OF a pinned instant — the query every
    feature-store backfill runs to avoid label leakage. One window to
    build intervals, one filter; with the history stored partitioned
    by valid_from date, the filter prunes to partitions at/before the
    as-of instant."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    at = F.lit("2024-01-15 00:00:00").cast("timestamp")
    tl = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    return tl.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
    ).select("user_id", "state", "valid_from")


@query(
    "q_string_agg",
    oracle="""
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen,
       count(DISTINCT event_type) AS n_types
FROM events
GROUP BY user_id
""",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation with a DETERMINISTIC rendering:
    collect_set → array_sort → concat_ws (≡ DuckDB string_agg DISTINCT
    ... ORDER BY). An unsorted listagg is partition-order
    nondeterministic — the sort is what makes the aggregate
    reproducible across cluster sizes, which matters more at 1000
    executors than the O(k log k) per-group cost."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_type"])
    types = F.array_sort(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        # guard: a user with ZERO non-null types aggregates to NULL
        # (string_agg-of-nothing), not concat_ws's '' (nulls shape)
        F.when(F.size(types) > 0, F.concat_ws(",", types)).alias("types_seen"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "q_max_concurrency",
    oracle="""
WITH iv AS (
  SELECT user_id, min(ts) AS t_start, max(ts) AS t_end
  FROM events GROUP BY user_id
),
pts AS (
  SELECT t_start AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT t_end, -1 FROM iv
),
sweep AS (
  SELECT t, delta,
         SUM(delta) OVER (ORDER BY t, delta DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM pts
)
SELECT CAST(max(live) AS BIGINT) AS max_concurrent FROM sweep
""",
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum number of simultaneously-active users (activity
    interval = [first event, last event]) via a SWEEP LINE: unpivot
    each interval to a +1/-1 point, running-sum in time order, take
    the max. This replaces the quadratic interval self-join — the
    standard trap — with O(n log n); ends sort after coincident starts
    (delta DESC) so touching intervals count as concurrent on both
    engines. The per-user interval agg shuffles once; the sweep's
    global order runs over ONE point per interval endpoint (2 rows per
    user, not per event). At 100 TB the sweep shards by coarse time
    bucket with per-bucket carry-in offsets (a second tiny pass);
    the fixture-scale plan keeps the single ordered partition."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts"])
    iv = ev.groupBy("user_id").agg(F.min("ts").alias("t_start"), F.max("ts").alias("t_end"))
    pts = iv.select(F.col("t_start").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select(F.col("t_end").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy(F.col("t"), F.col("delta").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return pts.select(F.sum("delta").over(w).alias("live")).agg(
        F.max("live").alias("max_concurrent")
    )


@query(
    "q_sessionize",
    oracle="""
WITH gaps AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_seq
FROM gaps
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session assignment (gap > 30 min starts a new
    session): lag to flag session starts, running sum to number them —
    the island-labeling transform underneath q_session_window's
    aggregate (which only returns per-session rollups; pipelines
    usually need the session id ON each event to join features back).
    Both windows share one (user_id) partitioning — Catalyst plans a
    single sort+shuffle, the two window functions run in one pass."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # Interval comparison (not epoch casts): valid for TIMESTAMP and
    # TIMESTAMP_NTZ alike — Spark 4 forbids a direct NTZ->bigint cast.
    is_start = F.when(
        prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (
        ev.withColumn("is_start", is_start)
        .withColumn(
            "session_seq",
            F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .select("event_id", "user_id", "session_seq")
    )


@query(
    "q_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
trans AS (
  SELECT event_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
       CASE WHEN abs(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY event_type)) < 4.5e9 THEN floor((CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY event_type)) * 1e6 + 0.5) / 1e6 ELSE (CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY event_type)) END AS p
FROM trans
""",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    per-user lead() pairs adjacent events (one shuffle on user, the
    same sort every sequence op shares), counts partial-agg map-side,
    and row-normalization is a window sum over the |states|² matrix —
    which is tiny at any corpus size, so the normalize step is free.
    The per-user ordering ties break on event_id, making the pairing
    deterministic under any partitioning."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("event_type")
    return trans.select(
        "event_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        floor_quantize(F.col("n").cast("double") / F.sum("n").over(wn), 6).alias("p"),
    )


@query(
    "q_attribution_last_touch",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN event_type <> 'purchase' THEN event_id END AS touch_id,
         CASE WHEN event_type <> 'purchase' THEN event_type END AS touch_type
  FROM events
),
credited AS (
  SELECT user_id, event_id, event_type,
         last_value(touch_type IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS channel
  FROM seq
)
SELECT channel, COUNT(*) AS conversions
FROM credited
WHERE event_type = 'purchase' AND channel IS NOT NULL
GROUP BY channel
""",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to
    the user's most recent preceding non-purchase event (the
    marketing-channel question). The carry-forward is
    last(ignorenulls) over an UNBOUNDED..1-PRECEDING frame — the same
    engine-side idiom as q_join_asof's as-of carry and q_gap_fill's
    forward fill, so determinism comes from the (ts, event_id) total
    order.

    One shuffle by user_id serves the window; purchases then reduce
    map-side to a |channels|-sized count. Purchases with no prior
    touch (first event) are unattributed and excluded, matching the
    oracle's IS NOT NULL."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_id", "event_type", "ts"])
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    credited = ev.select(
        "event_type",
        F.last(touch, ignorenulls=True).over(w).alias("channel"),
    )
    return (
        credited.filter((F.col("event_type") == "purchase") & F.col("channel").isNotNull())
        .groupBy("channel")
        .agg(F.count("*").alias("conversions"))
    )


# ---------------------------------------------------------------------------
# q_top_paths — most common initial event paths (ordered-sequence mining)
# ---------------------------------------------------------------------------

PATH_LEN = 5
PATH_TOP_K = 20


@query(
    "q_top_paths",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ordered WHERE rn <= {PATH_LEN}
  GROUP BY user_id
),
counted AS (
  SELECT path, COUNT(*) AS n_users,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rk
  FROM paths GROUP BY path
)
SELECT path, n_users, CAST(rk AS BIGINT) AS rank
FROM counted WHERE rk <= {PATH_TOP_K}
""",
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common initial journeys: each user's first {PATH_LEN}
    events (event-time order, event_id tie-break) joined into a '>'
    path string, counted and ranked — the sequence-mining readout that
    sits beside the Markov matrix (B9 gives edge probabilities; this
    gives the actual head paths product teams look at).

    One user-key shuffle: the rank window and the path assembly share
    it (row_number → filter ≤ {PATH_LEN} → sorted collect per user),
    then the count/rank run over the path table, which is at most
    |event_types|^{PATH_LEN} rows and in practice tiny. Paths are
    assembled with array_sort on (rn, type) structs — deterministic
    under any partitioning."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_n = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PATH_LEN)
        .select("user_id", "rn", "event_type")
    )
    paths = (
        first_n.groupBy("user_id")
        .agg(
            # count guard: a user whose head events are ALL NULL-typed
            # has no path (string_agg-of-nothing = NULL, not ''—nulls
            # shape); concat_ws skips interior NULLs like string_agg
            F.when(
                F.count("event_type") > 0,
                F.concat_ws(
                    ">",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                        lambda s: s.getField("event_type"),
                    ),
                ),
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    wr = Window.orderBy(F.col("n_users").desc(), "path")
    return (
        counted.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= PATH_TOP_K)
        .select("path", "n_users", "rank")
    )


# ---------------------------------------------------------------------------
# B14 — longest daily-activity streak (gaps and islands)
# ---------------------------------------------------------------------------


@query(
    "q_longest_streak",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
grp AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS g
  FROM days
),
streaks AS (
  SELECT user_id, COUNT(*) AS len, MIN(d) AS streak_start
  FROM grp GROUP BY user_id, g
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       strftime(min_by(streak_start, lpad(CAST(10000 - len AS VARCHAR), 5, '0') ||
                                     strftime(streak_start, '%Y-%m-%d')),
                '%Y-%m-%d') AS streak_start
FROM streaks
GROUP BY user_id
""",
)
def q_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands classic: distinct (user, day), then day minus
    per-user row_number is CONSTANT within a consecutive run, so one
    groupBy on that anchor yields streaks with zero self-joins. Ties
    on length resolve to the EARLIEST streak via an order-encoding
    min_by key (descending length, ascending date — the same
    sortable-string idiom as the OHLC tie-break, since min_by takes
    one scalar key on both engines). Two shuffles total (user-key
    window + streak agg), both key-bounded."""
    days = (
        load(spark, sf_dir, "events", columns=["user_id", "ts"])
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("g", F.date_sub("d", F.row_number().over(w)))
    streaks = grp.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("streak_start")
    )
    key = F.concat(
        F.lpad((F.lit(10000) - F.col("len")).cast("string"), 5, "0"),
        F.date_format("streak_start", "yyyy-MM-dd"),
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.date_format(F.min_by("streak_start", key), "yyyy-MM-dd").alias("streak_start"),
    )


# ---------------------------------------------------------------------------
# B15 — funnel latency percentiles (time-to-convert)
# ---------------------------------------------------------------------------


@query(
    "q_funnel_latency",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
lat AS (
  SELECT CAST(FLOOR(epoch(t_click)) AS BIGINT)
           - CAST(FLOOR(epoch(t_view)) AS BIGINT)     AS view_to_click,
         CAST(FLOOR(epoch(t_purchase)) AS BIGINT)
           - CAST(FLOOR(epoch(t_click)) AS BIGINT)    AS click_to_purchase
  FROM firsts
),
longform AS (
  SELECT 'view_to_click' AS stage, view_to_click AS s FROM lat WHERE view_to_click >= 0
  UNION ALL
  SELECT 'click_to_purchase', click_to_purchase FROM lat WHERE click_to_purchase >= 0
),
ranked AS (
  SELECT stage, s,
         ROW_NUMBER() OVER (PARTITION BY stage ORDER BY s) AS rn,
         COUNT(*) OVER (PARTITION BY stage) AS n
  FROM longform
)
SELECT stage,
       CAST(MAX(n) AS BIGINT) AS n_users,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.50 * n) AS BIGINT)) THEN s END) AS p50_s,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.90 * n) AS BIGINT)) THEN s END) AS p90_s
FROM ranked GROUP BY stage
""",
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert between funnel stages: first view→click and
    click→purchase latencies per user, summarized as discrete p50/p90
    — the 'HOW LONG does the funnel take' companion to q_funnel's
    'how many make it'. Negative latencies (stage reached out of
    order) are excluded, matching q_funnel's ordered semantics. One
    user-key aggregate builds the first-touch timestamps (conditional
    MIN — no per-stage scans); the discrete percentiles then ride
    the ranked-window form (value at rank ceil(p·n) — the
    q_percentile_disc idiom), so there is no collect_list state and
    the plan survives arbitrarily many users per stage.
    percentile_disc picks actual data values, so cross-engine
    equality is exact integers, no interpolation floats."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    v2c = F.unix_timestamp("t_click") - F.unix_timestamp("t_view")
    c2p = F.unix_timestamp("t_purchase") - F.unix_timestamp("t_click")
    # ONE explode instead of a self-union: a union of two selects over
    # `firsts` would plan the events scan + user aggregate twice.
    longform = firsts.select(
        F.explode(
            F.array(
                F.struct(F.lit("view_to_click").alias("stage"), v2c.alias("s")),
                F.struct(F.lit("click_to_purchase").alias("stage"), c2p.alias("s")),
            )
        ).alias("e")
    ).select("e.stage", "e.s").filter(F.col("s") >= 0)
    bystage = Window.partitionBy("stage")
    ranked = longform.select(
        "stage",
        "s",
        F.row_number().over(bystage.orderBy("s")).alias("rn"),
        F.count(F.lit(1)).over(bystage).alias("n"),
    )

    def at(p: float):
        return F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")))

    return ranked.groupBy("stage").agg(
        F.max("n").alias("n_users"),
        F.max(F.when(F.col("rn") == at(0.50), F.col("s"))).alias("p50_s"),
        F.max(F.when(F.col("rn") == at(0.90), F.col("s"))).alias("p90_s"),
    )


# ---------------------------------------------------------------------------
# B16 — windowed funnel (time-bounded stage conversion)
# ---------------------------------------------------------------------------

FUNNEL_WINDOW = "1 hour"


@query(
    "q_window_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 1 HOUR
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 1 HOUR
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_1h,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_1h
""",
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-BOUNDED funnel (the windowFunnel analog): each stage must
    follow the previous within {FUNNEL_WINDOW} — B3's ordered funnel
    says users eventually converted; this says they converted while
    the intent was live, which is what conversion-rate dashboards
    actually mean. Stage anchors are first-qualifying-event times
    (min after the previous anchor, inside the window), computed as a
    cascade of key-only aggregate joins — each stage's frame is one
    row per surviving user, so the two event re-scans join against
    ever-shrinking broadcast-sized anchor sets, never event×event."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts", "event_type"])
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr(f"INTERVAL {FUNNEL_WINDOW}"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr(f"INTERVAL {FUNNEL_WINDOW}"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_1h")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_1h")))
    )


# ---------------------------------------------------------------------------
# B17 — cohort revenue (LTV) curve
# ---------------------------------------------------------------------------


@query(
    "q_cohort_revenue",
    oracle="""
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
),
rev AS (
  SELECT f.cohort_date,
         datediff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset,
         SUM(CAST(e.value AS DECIMAL(18,2))) AS revenue
  FROM events e JOIN f ON e.user_id = f.user_id
  WHERE datediff('day', f.cohort_date, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
  GROUP BY 1, 2
)
SELECT strftime(cohort_date, '%Y-%m-%d') AS cohort_date,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(SUM(revenue) OVER (
         PARTITION BY cohort_date ORDER BY day_offset
         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
FROM rev
""",
)
def q_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort revenue (LTV) curve: per first-seen cohort, revenue at
    each day offset 0..7 plus the running cumulative — the payback
    readout next to q_cohort_retention's user counts (retention says
    they came back; this says what coming back was worth). Same two
    shuffles as retention; the cumulative window runs over the
    cohort×offset grid (calendar-bounded, free at any event scale),
    and sums stay DECIMAL through BOTH the aggregate and the running
    window so the cumulative is order-independent before its final
    double cast."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts", "value"])
    cohort = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_date"))
    off = F.datediff(F.to_date("ts"), F.col("cohort_date"))
    rev = (
        ev.join(cohort, "user_id")
        .withColumn("day_offset", off)
        .filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_date", "day_offset")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("revenue"))
    )
    w = (
        Window.partitionBy("cohort_date")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rev.select(
        F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
        F.col("day_offset").cast("long").alias("day_offset"),
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(w).cast("double").alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# B20 — normalized retention curve (day-N retention rates)
# ---------------------------------------------------------------------------


@query(
    "q_retention_curve",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
),
sizes AS (SELECT cohort_date, COUNT(*) AS cohort_size FROM f GROUP BY cohort_date),
act AS (
  SELECT DISTINCT f.cohort_date,
         datediff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset,
         e.user_id
  FROM events e JOIN f ON e.user_id = f.user_id
  WHERE datediff('day', f.cohort_date, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
),
rates AS (
  SELECT a.cohort_date, a.day_offset,
         CAST(COUNT(*) AS DOUBLE) / s.cohort_size AS rate
  FROM act a JOIN sizes s ON s.cohort_date = a.cohort_date
  GROUP BY a.cohort_date, a.day_offset, s.cohort_size
)
SELECT CAST(day_offset AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT)   AS n_cohorts,
       CASE WHEN abs(AVG(rate)) < 4.5e9 THEN floor((AVG(rate)) * 1e6 + 0.5) / 1e6 ELSE (AVG(rate)) END        AS avg_retention
FROM rates GROUP BY day_offset
""",
)
def q_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized retention curve: per cohort, the fraction of its
    users active at each day offset, then averaged ACROSS cohorts per
    offset — the single D0..D7 curve product reviews quote, versus
    B4's raw retention triangle (counts, not comparable across
    cohort sizes). Cohort-size normalization happens before the
    cross-cohort average so big cohorts don't dominate (the unweighted
    mean-of-rates convention). All frames after the (day, user, cohort)
    distinct are cohort×offset-sized; the rate average is one rounded
    double at the very end."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts"])
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_date"))
    sizes = f.groupBy("cohort_date").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (
        ev.join(f, "user_id")
        .select(
            "cohort_date",
            F.datediff(F.to_date("ts"), F.col("cohort_date")).alias("day_offset"),
            "user_id",
        )
        .filter(F.col("day_offset").between(0, 7))
        .distinct()
    )
    rates = (
        act.groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).alias("active"))
        .join(F.broadcast(sizes), "cohort_date")
        .select(
            "day_offset",
            (F.col("active").cast("double") / F.col("cohort_size")).alias("rate"),
        )
    )
    return rates.groupBy(F.col("day_offset").cast("long").alias("day_offset")).agg(
        F.count(F.lit(1)).alias("n_cohorts"),
        floor_quantize(F.avg("rate"), 6).alias("avg_retention"),
    )


# ---------------------------------------------------------------------------
# q_attribution_linear — multi-touch attribution with exact integer credit
# ---------------------------------------------------------------------------

ATTR_WINDOW_DAYS = 7


@query(
    "q_attribution_linear",
    oracle=f"""
WITH purchases AS (
  SELECT user_id, event_id AS p_id, ts AS p_ts,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
touches AS (
  SELECT user_id, event_id AS t_id, ts AS t_ts, event_type AS channel
  FROM events WHERE event_type <> 'purchase'
),
pairs AS (
  SELECT p.p_id, p.cents, t.channel
  FROM purchases p JOIN touches t ON t.user_id = p.user_id
  WHERE (t.t_ts < p.p_ts OR (t.t_ts = p.p_ts AND t.t_id < p.p_id))
    AND t.t_ts >= p.p_ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
),
per_purchase AS (
  SELECT p_id, cents, channel, count(*) AS k,
         sum(count(*)) OVER (PARTITION BY p_id) AS n
  FROM pairs GROUP BY p_id, cents, channel
)
SELECT channel,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
       CAST(sum((cents * 1000000 * k) // n) AS BIGINT) AS credit_microcents
FROM per_purchase GROUP BY channel
""",
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR (multi-touch) attribution: every purchase splits its
    revenue equally across ALL of the user's touch events in the
    {ATTR_WINDOW_DAYS}-day window before it — the fairness-motivated
    complement of q_attribution_last_touch, which hands full credit
    to one event. Credit is computed in INTEGER MICRO-CENTS with
    floor division (cents·10⁶·k // n), so the per-channel totals are
    exact integers no summation order or decimal-division rule can
    perturb — the same discipline as q_benford's integer cents
    (truncation loses < 1 micro-cent per purchase-channel, stated
    rather than hidden).

    Scale shape: the purchase↔touch pairing is an equi-join on
    user_id with a time-range residual — per-user work is bounded by
    activity inside the window (the q_join_range/q_point_in_time
    class, never event×event global); per-purchase shares reduce to
    (purchase, channel) rows before the final |channels|-sized
    aggregate. The (ts, event_id) tiebreak matches the last-touch
    total order."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_id", "event_type", "ts", "value"])
    purchases = ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull()).select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    before = (F.col("t_ts") < F.col("p_ts")) | (
        (F.col("t_ts") == F.col("p_ts")) & (F.col("t_id") < F.col("p_id"))
    )
    in_window = F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAY")
    pairs = purchases.join(touches, "user_id").filter(before & in_window)
    per_purchase = pairs.groupBy("p_id", "cents", "channel").agg(F.count(F.lit(1)).alias("k"))
    shared = per_purchase.withColumn(
        "n", F.sum("k").over(Window.partitionBy("p_id"))
    ).selectExpr("p_id", "channel", "(cents * 1000000 * k) div n AS credit")
    return shared.groupBy("channel").agg(
        F.count_distinct("p_id").cast("long").alias("n_purchases"),
        F.sum("credit").cast("long").alias("credit_microcents"),
    )


# ---------------------------------------------------------------------------
# q_user_entropy — behavioral diversity profile (B25)
# ---------------------------------------------------------------------------


@query(
    "q_user_entropy",
    oracle="""
WITH per AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
tot AS (SELECT user_id, SUM(c) AS n FROM per GROUP BY user_id),
ent AS (
  SELECT per.user_id,
         CAST(MAX(n) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CASE WHEN abs(-SUM((CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n))) < 4.5e9 THEN floor((-SUM((CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n))) * 1e4 + 0.5) / 1e4 ELSE (-SUM((CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n))) END AS entropy
  FROM per JOIN tot USING (user_id)
  GROUP BY per.user_id
)
SELECT * FROM ent
""",
)
def q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral Shannon entropy over the event-type
    distribution — the diversity/engagement-breadth profile: 0 =
    single-action users (bots, crawlers, broken clients), ln(5) ≈ 1.61
    = uniform usage of every action. The behavioral twin of L32's
    char-entropy gibberish detector, and the standard bot-screen
    feature next to B18's depth histogram.

    Plan: one (user, type) partial-agg — the only corpus-sized
    shuffle, carrying counts — then per-user totals and the entropy
    sum over the ≤|users|×|types| frame sharing the same user_id
    partitioning. Counts exact integers; each term is p·ln(p) on
    identical doubles, summed per user (≤5 terms — no order
    sensitivity at this fan-in) and rounded 4 dp."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_type"])
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id")
    # Materialize the per-user total BEFORE the aggregate (a window
    # inside an aggregate function is illegal); both share the
    # user_id partitioning, so this adds no shuffle.
    per = per.select("user_id", "c", F.sum("c").over(w).alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return per.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        floor_quantize(-F.sum(p * F.log(p)), 4).alias("entropy"),
    )
