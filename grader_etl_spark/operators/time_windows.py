"""Event-time window operators in BATCH form (SURVEY.md §2.8 ext) —
the batch twins of streaming/jobs.py's sliding/session windows, so the
same semantics are oracle-checkable (the streaming renditions are
pytest-covered; DuckDB can't run a stream).

Scale notes: ``window()`` / ``session_window()`` are built-in
generators + hash aggregates — the sliding window fans each row out to
length/slide windows *map-side* (an Expand, not a join), and the
session window is a per-key sort + merge inside one shuffle. Both keep
whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.hashing import MD5_32_SQL, md5_32
from grader_etl_spark.functions.quantize import floor_quantize, fq_sql

SESSION_GAP = "30 minutes"


@query(
    "q_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts)                       AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE  AS session_end,
       COUNT(*)                      AS n_events
FROM sessions
GROUP BY user_id, sid
""",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: events < 30 min apart per user merge
    into one session; window end = last event + gap (Spark's
    session_window semantics, which the oracle reproduces with the
    lag/cumsum island trick)."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts"])
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q_sliding_window",
    oracle="""
WITH expanded AS (
  SELECT unnest(generate_series(
           CAST(CAST(ts AS DATE) - 6 AS TIMESTAMP),
           CAST(CAST(ts AS DATE) AS TIMESTAMP),
           INTERVAL 1 DAY)) AS window_start
  FROM events
)
SELECT window_start,
       window_start + INTERVAL 7 DAY AS window_end,
       COUNT(*)                      AS n_events
FROM expanded
GROUP BY window_start
""",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day window sliding by 1 day — the reference's re-fetch window
    (main.py:25,104-105) as an analytical operator: each event counts
    toward the 7 windows covering it (epoch-aligned day boundaries on
    both engines)."""
    ev = load(spark, sf_dir, "events", columns=["ts"])
    return (
        ev.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


@query(
    "q_gap_fill",
    oracle="""
WITH users AS (SELECT DISTINCT user_id FROM events),
cal AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CASE WHEN abs(sum(value)) < 4.5e9 THEN floor((sum(value)) * 1e4 + 0.5) / 1e4 ELSE (sum(value)) END AS v
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       strftime(g.day, '%Y-%m-%d') AS day,
       (v IS NOT NULL) AS observed,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM (SELECT user_id, day FROM users CROSS JOIN cal) g
LEFT JOIN daily USING (user_id, day)
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with forward fill: densify each user's daily
    value series onto the full month grid, then carry the last
    observation forward (last(ignorenulls) over an expanding frame) —
    the standard time-series regularization before feature windows.
    The grid is distinct-users × generated calendar (a dimension
    crossed with sequence+explode, map-side expansion, no UDF); the
    fill is one per-user window sort that shares the shuffle the daily
    aggregate already forced. Day rows per key are bounded by the
    calendar length, so partitions stay balanced at any corpus size."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts", "value"])
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(floor_quantize(F.sum("value"), 4).alias("v"))
    )
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    grid = ev.select("user_id").distinct().crossJoin(cal)
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("v").isNotNull().alias("observed"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
    )


EWMA_ALPHA = 0.2


@query(
    "q_ewma",
    oracle="""
WITH RECURSIVE daily AS (
  -- v from an EXACT decimal sum (double summation is order-dependent
  -- and split one row at ~1e9 magnitudes — magnitude seed 5401);
  -- 2-dp inputs make the decimal sum exact, the VARCHAR->double parse
  -- correctly rounded, and CASE WHEN abs(...) < 4.5e9 THEN floor((...) * 1e4 + 0.5) / 1e4 ELSE (...) END a numeric no-op kept for shape.
  SELECT user_id, CAST(ts AS DATE) AS day,
         CASE WHEN abs(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)) < 4.5e9 THEN floor((CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)) * 1e4 + 0.5) / 1e4 ELSE (CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)) END AS v
  FROM events GROUP BY 1, 2
),
ordered AS (
  SELECT user_id, day, v,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM daily
),
ew AS (
  -- (ewma, prev) pair: a NULL observation emits NULL but CARRIES the
  -- state past the gap (missing-data contract; the nulls fuzz shape
  -- caught the poisoned-forever rendition)
  SELECT user_id, day, v, rn, v AS ewma, v AS prev FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.day, o.v, o.rn,
         CASE WHEN o.v IS NULL THEN NULL
              WHEN e.prev IS NULL THEN o.v
              ELSE 0.2 * o.v + 0.8 * e.prev END,
         CASE WHEN o.v IS NULL THEN e.prev
              WHEN e.prev IS NULL THEN o.v
              ELSE 0.2 * o.v + 0.8 * e.prev END
  FROM ew e JOIN ordered o ON o.user_id = e.user_id AND o.rn = e.rn + 1
)
-- final quantization uses the shared floor spelling: the engines'
-- native ROUND half-boundary semantics differ on identical doubles
-- (flipped 1 row at ~1e9 magnitudes, magnitude seed 5401)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day, v,
       CASE WHEN abs(ewma) < 4.5e9 THEN floor(ewma * 1e6 + 0.5) / 1e6 ELSE ewma END AS ewma
FROM ew
""",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's daily
    value — the order-dependent recursion (ewma = α·x + (1-α)·prev)
    that plain windows can't express. Done WITHOUT Python: per user,
    collect the day-sorted series and run one sequential F.aggregate
    fold whose accumulator carries (prev, emitted-array), then explode
    the result — the fold is JVM-side, one shuffle on the user key,
    and each group's state is just the series (calendar-bounded, so
    worker-sized). The oracle replays the identical recursion as a
    recursive CTE; both engines execute the same IEEE op sequence, so
    6-dp rounding is belt-and-suspenders."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts", "value"])
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        floor_quantize(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 4).alias("v")
    )
    series = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("s")
    )
    out_t = "array<struct<day:date,v:double,ewma:double>>"
    init = F.struct(
        F.lit(None).cast("double").alias("prev"), F.array().cast(out_t).alias("out")
    )

    def step(acc, x):
        # Missing-observation contract (nulls fuzz shape): a NULL v
        # emits a NULL ewma for its day but CARRIES prev past the gap
        # — the recursion neither poisons the rest of the series nor
        # silently restarts it.
        v, prev = x.getField("v"), acc.getField("prev")
        new = F.when(prev.isNull(), v).otherwise(
            F.lit(EWMA_ALPHA) * v + F.lit(1 - EWMA_ALPHA) * prev
        )
        emitted = F.struct(
            x.getField("day").alias("day"),
            v.alias("v"),
            F.when(v.isNull(), F.lit(None).cast("double")).otherwise(new).alias("ewma"),
        )
        return F.struct(
            F.when(v.isNull(), prev).otherwise(new).alias("prev"),
            F.concat(acc.getField("out"), F.array(emitted)).alias("out"),
        )

    folded = series.select(
        "user_id", F.explode(F.aggregate("s", init, step).getField("out")).alias("e")
    )
    ew = F.col("e.ewma")
    q6 = F.floor(ew * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return folded.select(
        "user_id",
        F.date_format(F.col("e.day"), "yyyy-MM-dd").alias("day"),
        F.col("e.v").alias("v"),
        F.when(F.abs(ew) < F.lit(4.5e9), q6).otherwise(ew).alias("ewma"),
    )


@query(
    "q_active_users",
    oracle="""
WITH ev AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM ev),
dau AS (SELECT d, COUNT(DISTINCT user_id) AS dau FROM ev GROUP BY d),
wau AS (
  SELECT days.d, COUNT(DISTINCT ev.user_id) AS wau
  FROM days JOIN ev ON ev.d > days.d - 7 AND ev.d <= days.d
  GROUP BY days.d
)
SELECT CAST(dau.d AS VARCHAR) AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       CASE WHEN abs(CAST(dau.dau AS DOUBLE) / wau.wau) < 4.5e9 THEN floor((CAST(dau.dau AS DOUBLE) / wau.wau) * 1e6 + 0.5) / 1e6 ELSE (CAST(dau.dau AS DOUBLE) / wau.wau) END AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
""",
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per active day — the
    engagement staple. Exact window distincts WITHOUT a per-day
    range self-join over raw events: events first collapse to the
    distinct (day, user) grid (one shuffle, map-side partial), then
    each grid row explodes into the ≤7 trailing report days it
    supports, and one groupBy(day) counts distinct users. The explode
    factor is a constant 7 on the already-collapsed grid — at 100 TB
    the grid is |days| × |active users|, orders smaller than the event
    stream. At larger windows (MAU) the same shape holds with factor
    30, or the HLL sketch variant (q_approx_distinct) drops the
    explode entirely."""
    ev = (
        load(spark, sf_dir, "events", columns=["ts", "user_id"])
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    days = ev.select("d").distinct()
    dau = ev.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    # Trailing-window membership via a bounded explode: (day d, user)
    # supports report days d .. d+6 — intersected with real days.
    supported = ev.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("rd"),
        "user_id",
    ).join(days.select(F.col("d").alias("rd")), "rd")
    wau = supported.groupBy("rd").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, dau.d == wau.rd)
        .select(
            F.col("d").cast("string").alias("day"),
            "dau",
            "wau",
            floor_quantize(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# q_ohlc_daily — open/high/low/close bars (argmin/argmax by event time)
# ---------------------------------------------------------------------------


@query(
    "q_ohlc_daily",
    oracle="""
WITH keyed AS (
  SELECT CAST(ts AS DATE) AS day, value,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
         lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
  FROM events
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CASE WHEN abs(min_by(value, k)) < 4.5e9 THEN floor((min_by(value, k)) * 1e4 + 0.5) / 1e4 ELSE (min_by(value, k)) END AS open,
       CASE WHEN abs(max(value)) < 4.5e9 THEN floor((max(value)) * 1e4 + 0.5) / 1e4 ELSE (max(value)) END       AS high,
       CASE WHEN abs(min(value)) < 4.5e9 THEN floor((min(value)) * 1e4 + 0.5) / 1e4 ELSE (min(value)) END       AS low,
       CASE WHEN abs(max_by(value, k)) < 4.5e9 THEN floor((max_by(value, k)) * 1e4 + 0.5) / 1e4 ELSE (max_by(value, k)) END AS close,
       CAST(COUNT(*) AS BIGINT)   AS volume
FROM keyed GROUP BY day
""",
)
def q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars over the event value series — the canonical
    downsampling shape for any metric/tick stream. open/close are
    argmin/argmax over a composite (ts, event_id) key — built-in
    min_by/max_by, so the whole bar is ONE mergeable aggregate state
    per day (map-side partial, no window sort, no per-day
    materialization). The tie-break key is encoded as a zero-padded
    string because the oracle's min_by needs a scalar orderable key —
    both engines compare the identical bytes, so bars are
    deterministic even with equal-timestamp events."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "ts", "value"])
    k = F.concat_ws(
        "-",
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    # open/close = first/last OBSERVED price: a NULL-value tick is no
    # observation. DuckDB's min_by/max_by skip NULL values natively;
    # Spark's return the winning row's NULL — nulling the ORDER key
    # for NULL values makes Spark skip them identically (nulls shape).
    k = F.when(F.col("value").isNotNull(), k)
    return (
        ev.select(F.to_date("ts").alias("day"), "value", k.alias("k"))
        .groupBy("day")
        .agg(
            floor_quantize(F.min_by("value", "k"), 4).alias("open"),
            floor_quantize(F.max("value"), 4).alias("high"),
            floor_quantize(F.min("value"), 4).alias("low"),
            floor_quantize(F.max_by("value", "k"), 4).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(F.col("day").cast("string").alias("day"), "open", "high", "low", "close", "volume")
    )


# ---------------------------------------------------------------------------
# q_twap — time-weighted average value per user (interval weighting)
# ---------------------------------------------------------------------------


@query(
    "q_twap",
    oracle="""
WITH ordered AS (
  SELECT user_id, value,
         epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t_next
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       -- EXACT decimal weighted sums (double partial sums are
       -- order-dependent and flipped a 6-dp digit at 1e6-scaled
       -- values — magnitude seed 7411); (19,x) operands force int128
       -- multiplication, VARCHAR routes the decimal->double casts,
       -- and the guarded floor spelling quantizes. Double/0 is NULL
       -- on both engines (try_divide twin).
       CASE WHEN abs(CAST(CAST(SUM(CAST(value AS DECIMAL(19,2)) * CAST(t_next - t AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(SUM(CAST(t_next - t AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)) < 4.5e9
            THEN floor(CAST(CAST(SUM(CAST(value AS DECIMAL(19,2)) * CAST(t_next - t AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(SUM(CAST(t_next - t AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6
            ELSE CAST(CAST(SUM(CAST(value AS DECIMAL(19,2)) * CAST(t_next - t AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(SUM(CAST(t_next - t AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)
       END AS twap
FROM ordered WHERE t_next IS NOT NULL
GROUP BY user_id
""",
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value series: each
    observation holds until the next one, so its weight is the
    interval length (plain avg() over-weights bursts — the reason
    TWAP/TWAvg exists in every metrics store). One per-user window
    (lead over event time, event_id tie-break) sharing a single
    shuffle with the final aggregate; the last observation of each
    user has no holding interval and is excluded on both engines.
    Weighted sums accumulate in EXACT decimal (value is 2-dp, the
    holding interval is integer µs, so value·Δt is exact at (37,2)) —
    double partial sums are association-order-dependent and flipped a
    6-dp digit at 1e6-scaled magnitudes (magnitude seed 7411); the
    single ratio then quantizes with the guarded floor spelling on
    both engines. try_divide:
    a user whose observations ALL share one timestamp has zero total
    holding time — DuckDB's x/0 is NULL, so the Spark side must yield
    NULL too instead of ANSI-throwing (fuzz: test_fuzz_timeseries)."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    t = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(t, "event_id")
    withnext = ev.select(
        "user_id", "value", t.alias("t"), F.lead(t).over(w).alias("t_next")
    ).filter(F.col("t_next").isNotNull())
    dtd = (F.col("t_next") - F.col("t")).cast("decimal(18,0)")
    num = F.sum(F.col("value").cast("decimal(18,2)") * dtd).cast("double")
    den = F.sum(dtd).cast("double")
    r = F.try_divide(num, den)
    q6 = F.floor(r * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return withnext.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.when(F.abs(r) < F.lit(4.5e9), q6).otherwise(r).alias("twap"),
    )


# ---------------------------------------------------------------------------
# q_active_users_hll — the sketch-merge DAU/WAU variant (B12's scale path)
# ---------------------------------------------------------------------------

# Classic HyperLogLog (Flajolet et al. 2007) over the cross-engine
# md5_32 hash (functions/hashing.py): P index bits select one of
# M_REG registers, the remaining W_BITS bits' leading-zero count + 1
# is the register's rank. Everything below the final estimate is
# INTEGER (register maxima; the indicator sum Σ2^-M_j is carried as
# the exact integer Σ2^(32-M_j) + V·2^32 over the common denominator
# 2^32), so — unlike the engine-specific DataSketches binaries this
# replaced — DuckDB replays the sketch bit-for-bit and the ESTIMATE
# itself is value-oracled, not just accuracy-bounded. Standard error
# 1.04/√512 ≈ 4.6% in the raw regime; the linear-counting branch
# (E ≤ 2.5m with empty registers) is far tighter at fixture
# cardinalities. Accuracy vs the exact q_active_users remains
# pytest-bounded in tests/test_audit_ops.py.
_HLL_P = 9
_HLL_M = 1 << _HLL_P  # 512 registers
_HLL_W = 32 - _HLL_P  # 23 rank bits
_HLL_WPOW = 1 << _HLL_W  # 2^23
# alpha_m · m² · 2^32 — one double literal shared verbatim by both
# engines, so the raw estimate is a single identical IEEE division.
_HLL_ALPHA_NUM = repr(0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * float(1 << 32))
_HLL_LC_CUT = repr(2.5 * _HLL_M)


def _hll_estimate(v: F.Column, z: F.Column) -> F.Column:
    """HLL estimate from V (empty-register count) and the exact
    integer indicator numerator Z = Σ2^(32-M_j) + V·2^32. One
    division, one optional ln — both single IEEE ops on identical
    operands cross-engine (the LN precedent is q_user_entropy)."""
    e_raw = F.lit(float(_HLL_ALPHA_NUM)) / z.cast("double")
    lc = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double"))
    return F.when((v > 0) & (e_raw <= F.lit(float(_HLL_LC_CUT))), lc).otherwise(e_raw)


_HLL_EST_SQL = (
    f"CASE WHEN {{v}} > 0 AND {_HLL_ALPHA_NUM} / CAST({{z}} AS DOUBLE) <= {_HLL_LC_CUT} "
    f"THEN {_HLL_M}.0 * LN({_HLL_M}.0 / {{v}}) "
    f"ELSE {_HLL_ALPHA_NUM} / CAST({{z}} AS DOUBLE) END"
)
_HLL_Z_SQL = (
    f"SUM(CAST(1 AS BIGINT) << (32 - m)) + ({_HLL_M} - COUNT(*)) * 4294967296"
)


@query(
    "q_active_users_hll",
    oracle=f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS d,
         {MD5_32_SQL.format(expr="CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE user_id IS NOT NULL
),
reg AS (
  SELECT d, CAST(h // {_HLL_WPOW} AS INT) AS idx,
         MAX(CASE WHEN h % {_HLL_WPOW} = 0 THEN {_HLL_W + 1}
                  ELSE {_HLL_W + 1} - length(bin(h % {_HLL_WPOW})) END) AS m
  FROM ev GROUP BY d, idx
),
days AS (SELECT DISTINCT d FROM reg),
dau AS (
  SELECT d, {_HLL_Z_SQL} AS z, {_HLL_M} - COUNT(*) AS v FROM reg GROUP BY d
),
wreg AS (
  SELECT days.d AS d, reg.idx, MAX(reg.m) AS m
  FROM days JOIN reg ON reg.d > days.d - 7 AND reg.d <= days.d
  GROUP BY days.d, reg.idx
),
wau AS (
  SELECT d, {_HLL_Z_SQL} AS z, {_HLL_M} - COUNT(*) AS v FROM wreg GROUP BY d
),
est AS (
  SELECT dau.d,
         {_HLL_EST_SQL.format(v="dau.v", z="dau.z")} AS de,
         {_HLL_EST_SQL.format(v="wau.v", z="wau.z")} AS we
  FROM dau JOIN wau ON dau.d = wau.d
)
SELECT CAST(d AS VARCHAR) AS day,
       {fq_sql("de", 4)} AS dau,
       {fq_sql("we", 4)} AS wau,
       {fq_sql("de / we", 6)} AS stickiness
FROM est
""",
)
def q_active_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/stickiness via MERGEABLE register-HLL sketches — the
    100 TB path q_active_users' docstring promises: one pass collapses
    events to per-(day, register) maxima (map-side partial max; ≤512
    rows per day regardless of user cardinality), and the trailing-
    7-day WAU is a register-wise MAX over ≤7 sketch rows — no factor-7
    row explode over users, no giant distinct. The per-day register
    table is exactly what a production pipeline would PERSIST and
    maintain incrementally: yesterday's registers never recompute,
    today's batch merges via MAX, and any window (7/28/90-day) is a
    register union over the stored rows. Unlike hll_sketch_agg's
    DataSketches binaries (the drop-in Spark-native alternative), the
    md5_32 register pipeline is integer-deterministic cross-engine, so
    the DuckDB oracle verifies the ESTIMATES value-for-value. The
    trailing window joins on real days only, so gaps in the date line
    shrink the union correctly instead of grabbing 7 arbitrary rows."""
    ev = load(spark, sf_dir, "events", columns=["ts", "user_id"]).filter(
        F.col("user_id").isNotNull()
    )
    h = md5_32(F.col("user_id").cast("string"))
    slots = ev.select(F.to_date("ts").alias("d"), h.alias("h")).select(
        "d",
        F.expr(f"CAST(h div {_HLL_WPOW} AS INT)").alias("idx"),
        (F.col("h") % F.lit(_HLL_WPOW)).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin("w"))
    )
    reg = slots.select("d", "idx", rho.cast("int").alias("m")).groupBy("d", "idx").agg(
        F.max("m").alias("m")
    )
    term = F.expr("shiftleft(CAST(1 AS BIGINT), 32 - m)")
    zv = [
        (F.sum(term) + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(1 << 32)).alias("z"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v"),
    ]
    dau = reg.groupBy("d").agg(*zv)
    days = reg.select("d").distinct().select(F.col("d").alias("rd"))
    # Trailing-window membership via the bounded explode (the
    # q_active_users idiom, here on the ≤512-rows-per-day REGISTER
    # table): register row (d, idx) supports report days d..d+6,
    # intersected with real days by an equi-join — no nested-loop
    # range join in the plan.
    wreg = (
        reg.select(
            F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("rd"),
            "idx",
            "m",
        )
        .join(days, "rd")
        .groupBy("rd", "idx")
        .agg(F.max("m").alias("m"))
    )
    wau = wreg.groupBy("rd").agg(*zv)
    de = _hll_estimate(F.col("dv"), F.col("dz"))
    we = _hll_estimate(F.col("wv"), F.col("wz"))
    return (
        dau.select(F.col("d"), F.col("z").alias("dz"), F.col("v").alias("dv"))
        .join(
            wau.select(F.col("rd").alias("d"), F.col("z").alias("wz"), F.col("v").alias("wv")),
            "d",
        )
        .select(
            F.col("d").cast("string").alias("day"),
            floor_quantize(de, 4).alias("dau"),
            floor_quantize(we, 4).alias("wau"),
            floor_quantize(de / we, 6).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# W12 — event-time disorder profile (watermark planning input)
# ---------------------------------------------------------------------------


@query(
    "q_disorder_profile",
    oracle="""
WITH seq AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
         MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS seen_max,
         CASE WHEN LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY event_id) > CAST(FLOOR(epoch(ts)) AS BIGINT)
              THEN 1 ELSE 0 END AS inverted
  FROM events
),
delays AS (SELECT seen_max - t AS delay, inverted FROM seq),
ranked AS (
  SELECT delay, ROW_NUMBER() OVER (ORDER BY delay) AS rn,
         COUNT(*) OVER () AS n
  FROM delays
)
SELECT CAST(MAX(n) AS BIGINT)                          AS n_events,
       CASE WHEN abs((SELECT AVG(CAST(inverted AS DOUBLE)) FROM delays)) < 4.5e9 THEN floor(((SELECT AVG(CAST(inverted AS DOUBLE)) FROM delays)) * 1e6 + 0.5) / 1e6 ELSE ((SELECT AVG(CAST(inverted AS DOUBLE)) FROM delays)) END AS out_of_order_ratio,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.50 * n) AS BIGINT)) THEN delay END) AS p50_delay_s,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.95 * n) AS BIGINT)) THEN delay END) AS p95_delay_s,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.99 * n) AS BIGINT)) THEN delay END) AS p99_delay_s,
       CAST(MAX(delay) AS BIGINT)                      AS max_delay_s
FROM ranked
""",
)
def q_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder profile — THE input to choosing a watermark
    delay: per user-keyed stream (event_id = ingest order), each
    event's lateness is (running max event time so far) − (its event
    time); the report gives the out-of-order fraction and discrete
    p50/p95/p99/max lateness. A watermark at p99 bounds state while
    dropping ≤1% of late rows — measured, not guessed (the streaming
    jobs' 7-day delay came from exactly this readout's shape). The
    running max and lag share one user-key window sort; percentiles
    ride the ranked ceil(p·n) idiom over the delay column (a global
    rank window over event-count rows — at extreme scale the
    documented swap is approx_percentile on delay, one pass, no
    sort)."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts"])
    t = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        t.alias("t"),
        F.max(t).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("seen_max"),
        (F.lag(t).over(w) > t).cast("int").alias("inverted"),
    ).select(
        (F.col("seen_max") - F.col("t")).alias("delay"),
        F.coalesce("inverted", F.lit(0)).alias("inverted"),
    )
    wr = Window.orderBy("delay")
    ranked = seq.select(
        "delay",
        "inverted",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )

    def at(p: float):
        return F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")))

    return ranked.agg(
        F.max("n").cast("long").alias("n_events"),
        floor_quantize(F.avg(F.col("inverted").cast("double")), 6).alias("out_of_order_ratio"),
        F.max(F.when(F.col("rn") == at(0.50), F.col("delay"))).alias("p50_delay_s"),
        F.max(F.when(F.col("rn") == at(0.95), F.col("delay"))).alias("p95_delay_s"),
        F.max(F.when(F.col("rn") == at(0.99), F.col("delay"))).alias("p99_delay_s"),
        F.max("delay").cast("long").alias("max_delay_s"),
    )


# ---------------------------------------------------------------------------
# q_holt_trend — Holt's linear (double exponential) smoothing
# ---------------------------------------------------------------------------


@query(
    "q_holt_trend",
    oracle="""
WITH RECURSIVE daily AS (
  -- EXACT decimal day sum (double summation is order-dependent — the
  -- q_ewma magnitude discipline), then the guarded 4-dp quantize
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN abs(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)) < 4.5e9 THEN floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)) * 1e4 + 0.5) / 1e4 ELSE (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)) END AS v
  FROM events GROUP BY 1
),
ordered AS (
  SELECT day, v, row_number() OVER (ORDER BY day) AS rn FROM daily
),
holt AS (
  -- (l, b) emitted per row + (cl, cb) CARRIED state: a NULL day total
  -- emits NULL level/trend but carries the state past the gap — the
  -- q_ewma missing-data contract (the dup-heavy+nulls composed fuzz
  -- caught the poisoned-forever oracle vs restart-on-null Spark split)
  SELECT day, v, rn,
         CAST(v AS DOUBLE) AS l,
         CASE WHEN v IS NULL THEN CAST(NULL AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS b,
         CAST(v AS DOUBLE) AS cl,
         CASE WHEN v IS NULL THEN CAST(NULL AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS cb
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.day, o.v, o.rn,
         CASE WHEN o.v IS NULL THEN NULL
              WHEN h.cl IS NULL THEN o.v
              ELSE 0.5 * o.v + 0.5 * (h.cl + h.cb) END,
         CASE WHEN o.v IS NULL THEN NULL
              WHEN h.cl IS NULL THEN 0.0
              ELSE 0.5 * ((0.5 * o.v + 0.5 * (h.cl + h.cb)) - h.cl) + 0.5 * h.cb END,
         CASE WHEN o.v IS NULL THEN h.cl
              WHEN h.cl IS NULL THEN o.v
              ELSE 0.5 * o.v + 0.5 * (h.cl + h.cb) END,
         CASE WHEN o.v IS NULL THEN h.cb
              WHEN h.cl IS NULL THEN 0.0
              ELSE 0.5 * ((0.5 * o.v + 0.5 * (h.cl + h.cb)) - h.cl) + 0.5 * h.cb END
  FROM holt h JOIN ordered o ON o.rn = h.rn + 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, v,
       -- guarded floor-quantize (floor_quantize spelling): native ROUND
       -- disagrees at 6-dp half boundaries, and above 4.5e9 the raw
       -- floor path hits Spark's BIGINT floor while DuckDB floors in
       -- double — the guard passes those magnitudes through untouched
       CASE WHEN abs(l) < 4.5e9 THEN floor(l * 1e6 + 0.5) / 1e6 ELSE l END AS level,
       CASE WHEN abs(b) < 4.5e9 THEN floor(b * 1e6 + 0.5) / 1e6 ELSE b END AS trend,
       CASE WHEN abs(l + b) < 4.5e9 THEN floor((l + b) * 1e6 + 0.5) / 1e6 ELSE (l + b) END AS forecast_next
FROM holt
""",
)
def q_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's LINEAR smoothing (level + trend, α = β = 1/2) over the
    global daily-revenue series — the trend-aware upgrade of q_ewma
    and the adaptive alternative to q_forecast_revenue's one-shot OLS:
    the one-step forecast (level + trend) tracks drift instead of
    assuming a fixed slope. Two coupled order-dependent recursions,
    which windows can't express — so, as with EWMA, the day-sorted
    series folds through ONE JVM-side F.aggregate whose accumulator
    carries (level, trend, emitted-array); no Python anywhere.

    Scale shape: the corpus collapses to |days| rows in one
    partial-aggregating pass BEFORE any ordering (the
    q_forecast_revenue discipline); the fold's state is the bounded
    calendar series. The oracle replays the identical recursion as a
    recursive CTE with the same literal halves and op order, so the
    smoothed path is IEEE-identical cross-engine; display rounding is
    the guarded floor-quantize on both sides (native ROUNDs disagree
    at half boundaries — q_stats_agg discipline).

    Missing-data contract (q_ewma precedent, pinned by the
    dup-heavy+nulls composed fuzz): a day whose total is NULL (every
    value that day NULL) emits NULL level/trend/forecast but CARRIES
    the (l, b) state past the gap — before this, Spark restarted the
    recursion at the gap while the oracle's CTE stayed NULL forever."""
    ev = load(spark, sf_dir, "events", columns=["ts", "value"])
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        floor_quantize(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 4
        ).alias("v")
    )
    series = daily.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("s")
    )
    out_t = "array<struct<day:date,v:double,l:double,b:double>>"
    init = F.struct(
        F.lit(None).cast("double").alias("l"),
        F.lit(None).cast("double").alias("b"),
        F.array().cast(out_t).alias("out"),
    )

    def step(acc, x):
        v = x.getField("v")
        vnull = v.isNull()
        first = acc.getField("l").isNull()
        l_step = F.when(first, v).otherwise(
            F.lit(0.5) * v + F.lit(0.5) * (acc.getField("l") + acc.getField("b"))
        )
        b_step = F.when(first, F.lit(0.0)).otherwise(
            F.lit(0.5) * (l_step - acc.getField("l")) + F.lit(0.5) * acc.getField("b")
        )
        null_d = F.lit(None).cast("double")
        emitted = F.struct(
            x.getField("day").alias("day"),
            v.alias("v"),
            F.when(vnull, null_d).otherwise(l_step).alias("l"),
            F.when(vnull, null_d).otherwise(b_step).alias("b"),
        )
        return F.struct(
            # carry state across NULL observations instead of restarting
            F.when(vnull, acc.getField("l")).otherwise(l_step).alias("l"),
            F.when(vnull, acc.getField("b")).otherwise(b_step).alias("b"),
            F.concat(acc.getField("out"), F.array(emitted)).alias("out"),
        )

    folded = series.select(F.explode(F.aggregate("s", init, step).getField("out")).alias("e"))

    return folded.select(
        F.date_format(F.col("e.day"), "yyyy-MM-dd").alias("day"),
        F.col("e.v").alias("v"),
        floor_quantize(F.col("e.l"), 6).alias("level"),
        floor_quantize(F.col("e.b"), 6).alias("trend"),
        floor_quantize(F.col("e.l") + F.col("e.b"), 6).alias("forecast_next"),
    )
