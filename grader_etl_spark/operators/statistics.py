"""Statistical aggregates and distribution window functions — §2
breadth: the moments/correlation layer every analytics engine carries,
plus the rank-distribution windows (ntile / percent_rank / cume_dist).

All built-in JVM expressions (one hash-aggregate or one window sort);
floating results are rounded to 6 dp on both engines because variance
accumulation order differs legitimately across partitionings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize


@query(
    "q_stats_agg",
    oracle="""
WITH m AS (
  -- decimal->double through VARCHAR: DuckDB's native cast is not
  -- correctly rounded (one ulp off at ~1e12); the string path is,
  -- matching Spark's BigDecimal->double (the q_pricing_summary fix)
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s1,
         -- (19,2) operands: DuckDB multiplies (18,2)x(18,2) in the
         -- inputs' int64 physical type and overflows at ~1e10 values
         -- (magnitude seed 5401); one more digit forces int128.
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2))
                * CAST(l_extendedprice AS DECIMAL(19,2))) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS t1,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,2))
                * CAST(l_quantity AS DECIMAL(19,2))) AS VARCHAR) AS DOUBLE) AS t2,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,2))
                * CAST(l_extendedprice AS DECIMAL(19,2))) AS VARCHAR) AS DOUBLE) AS tp
  FROM lineitem GROUP BY l_returnflag
)
-- Quantization guard: floor(x*1e6 + 0.5) is only meaningful while
-- x*1e6 stays inside the 2^52 integer-exact range; past ~4.5e9 the
-- 6-dp grid does not exist in double anyway, and Spark's floor
-- (which returns BIGINT) would saturate at 2^63 while DuckDB's stays
-- double (magnitude seed 5401: variance ~9e20 read as Long.MAX/1e6
-- on Spark). Above the guard both engines emit the RAW double, which
-- is identical because the inputs are.
SELECT l_returnflag,
       CASE WHEN n > 1 THEN
         CASE WHEN abs(sqrt(greatest((s2 - s1*s1/n) / (n-1), 0))) < 4.5e9
              THEN floor(sqrt(greatest((s2 - s1*s1/n) / (n-1), 0)) * 1e6 + 0.5) / 1e6
              ELSE sqrt(greatest((s2 - s1*s1/n) / (n-1), 0)) END
       END                                                              AS price_stddev,
       CASE WHEN abs((s2 - s1*s1/n) / (n-1)) < 4.5e9
            THEN floor((s2 - s1*s1/n) / (n-1) * 1e6 + 0.5) / 1e6
            ELSE (s2 - s1*s1/n) / (n-1) END                             AS price_var,
       floor((n*tp - t1*s1) / sqrt(greatest((n*t2 - t1*t1) * (n*s2 - s1*s1), 0))
             * 1e6 + 0.5) / 1e6                                         AS qty_price_corr,
       CASE WHEN abs((tp - t1*s1/n) / (n-1)) < 4.5e9
            THEN floor((tp - t1*s1/n) / (n-1) * 1e6 + 0.5) / 1e6
            ELSE (tp - t1*s1/n) / (n-1) END                             AS qty_price_covar,
       CASE WHEN abs(s1/n) < 4.5e9
            THEN floor(s1/n * 1e6 + 0.5) / 1e6
            ELSE s1/n END                                               AS price_mean
FROM m
""",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment/correlation aggregates per group — single-pass partial
    aggregation, one shuffle of tiny states. The moments are derived
    from EXACT decimal sums (n, Σx, Σx², Σy², Σxy over DECIMAL(18,2)
    inputs) and only then combined in identically-ordered double
    arithmetic on both engines, so every output is bit-identical
    cross-engine. The earlier Welford-state spelling
    (var_samp/corr built-ins) depended on merge order: at ~1e9
    variance magnitudes the engines' raw values differ near 1e-6 and
    a ROUND(…,6) can flip a last digit (caught by the fuzz sweep —
    the fixtures had been passing on luck). The final quantization is
    floor(x·1e6 + 0.5)/1e6 SPELLED OUT on both sides, not the
    engines' ROUND: Spark's round half-ups the double's SHORTEST
    DECIMAL REPR (BigDecimal.valueOf) while DuckDB rounds the exact
    binary value, so a result landing on a 6-dp half boundary flips
    between them even when the unrounded doubles are bit-identical
    (extended fuzz campaign, seeds 1511/1709). floor/mult/add are
    IEEE-determined on identical inputs, hence engine-independent at
    any magnitude. Zero-variance and n=1 groups yield NULL through
    try_divide, matching SQL x/0."""
    # NOT scattered: pinned constant-shuffle contract class
    # (tests/test_shuffle_contract.py) — the exchange must stay
    # O(groups).
    li = load(
        spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    q = F.col("l_quantity").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(p).cast("double").alias("s1"),
        F.sum(p * p).cast("double").alias("s2"),
        F.sum(q).cast("double").alias("t1"),
        F.sum(q * q).cast("double").alias("t2"),
        F.sum(q * p).cast("double").alias("tp"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    t1, t2, tp = F.col("t1"), F.col("t2"), F.col("tp")
    var = F.try_divide(s2 - s1 * s1 / n, n - 1)

    def round6(c):
        # floor(x·1e6 + 0.5)/1e6, GUARDED: past |x| ~4.5e9 the 6-dp
        # grid is not representable in double and Spark's BIGINT floor
        # would saturate at 2^63 (magnitude seed 5401) — emit raw x,
        # identical on both engines. Correlation needs no guard (|r|≤1).
        q = F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
        return F.when(F.abs(c) < F.lit(4.5e9), q).otherwise(c)

    corr6 = F.floor(
        F.try_divide(
            n * tp - t1 * s1,
            F.sqrt(F.greatest((n * t2 - t1 * t1) * (n * s2 - s1 * s1), F.lit(0.0))),
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ) / F.lit(1e6)
    return m.select(
        "l_returnflag",
        F.when(n > 1, round6(F.sqrt(F.greatest(var, F.lit(0.0))))).alias(
            "price_stddev"
        ),
        round6(var).alias("price_var"),
        corr6.alias("qty_price_corr"),
        round6(F.try_divide(tp - t1 * s1 / n, n - 1)).alias("qty_price_covar"),
        round6(s1 / n).alias("price_mean"),
    )


@query(
    "q_window_distribution",
    oracle="""
SELECT c_custkey,
       c_nationkey,
       NTILE(4)       OVER w                    AS quartile,
       CASE WHEN abs(PERCENT_RANK() OVER w) < 4.5e9 THEN floor((PERCENT_RANK() OVER w) * 1e6 + 0.5) / 1e6 ELSE (PERCENT_RANK() OVER w) END          AS pct_rank,
       CASE WHEN abs(CUME_DIST()    OVER w) < 4.5e9 THEN floor((CUME_DIST()    OVER w) * 1e6 + 0.5) / 1e6 ELSE (CUME_DIST()    OVER w) END          AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal NULLS FIRST, c_custkey)
""",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (W1 extended): quartile bucket, percentile
    rank, cumulative distribution per nation — one shuffle + one local
    sort serves all three (shared window spec)."""
    # NULLS FIRST pinned explicitly (Spark default, DuckDB NULLS LAST)
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").asc_nulls_first(), "c_custkey")
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        floor_quantize(F.percent_rank().over(w), 6).alias("pct_rank"),
        floor_quantize(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_scalar_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name)                                   AS name_upper,
       lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
       regexp_replace(p_type, '[aeiou]', '_', 'g')     AS type_devoweled,
       length(p_brand)                                 AS brand_len,
       CAST(round(p_retailprice / 100, 0) AS BIGINT)   AS price_bucket,
       CAST(CAST(p_retailprice AS DECIMAL(12,2)) % 10 AS DOUBLE) AS price_mod
FROM part
""",
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth in one projection (string case/pad/
    regex/length, numeric round/modulo) — all whole-stage-codegen'd;
    the point is API surface, the plan is a bare scan+project."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.length("p_brand").cast("long").alias("brand_len"),
        F.round(F.col("p_retailprice") / 100, 0).cast("long").alias("price_bucket"),
        (F.col("p_retailprice").cast("decimal(12,2)") % 10).cast("double").alias("price_mod"),
    )


@query(
    "q_profile_columns",
    oracle="""
SELECT 'l_quantity' AS column_name,
       count(*) AS n_rows, count(l_quantity) AS n_nonnull,
       count(DISTINCT l_quantity) AS n_distinct,
       CAST(min(l_quantity) AS DOUBLE) AS min_val,
       CAST(max(l_quantity) AS DOUBLE) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(l_extendedprice),
       count(DISTINCT l_extendedprice),
       CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(l_discount),
       count(DISTINCT l_discount),
       CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE)
FROM lineitem
""",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary (row/null/distinct counts, min/max) for
    three measure columns in ONE scan: a single aggregate computes
    every per-column metric, then stack() unpivots to one row per
    column — vs the oracle's three-scan UNION ALL. At 100 TB profiling
    must not multiply scans by column count; this shape is linear in
    columns within one pass (exact distincts shuffle per-column
    states; the documented scale variant swaps in
    approx_count_distinct)."""
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    li = load(spark, sf_dir, "lineitem", columns=cols)
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.min(c).cast("double").alias(f"{c}__min_val"),
            F.max(c).cast("double").alias(f"{c}__max_val"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n_rows, {c}__n_nonnull, {c}__n_distinct, {c}__min_val, {c}__max_val"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_rows, n_nonnull, n_distinct, min_val, max_val)"
        )
    )


@query(
    "q_null_handling",
    oracle="""
SELECT event_id,
       nullif(event_type, 'error')                         AS et_or_null,
       coalesce(nullif(event_type, 'error'), 'unknown')    AS et_filled,
       coalesce(value, -1.0)                               AS val_filled,
       (value IS NOT NULL)                                 AS has_val,
       CAST(CASE WHEN value IS NULL THEN 0 ELSE 1 END AS BIGINT) AS val_flag
FROM events
""",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar breadth: nullif / coalesce / IS NOT NULL /
    CASE-on-null in one codegen'd projection (the SQL-semantics layer
    under the reference's hand-rolled None checks, main.py:142-163)."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    et_or_null = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        et_or_null.alias("et_or_null"),
        F.coalesce(et_or_null, F.lit("unknown")).alias("et_filled"),
        F.coalesce(F.col("value"), F.lit(-1.0)).alias("val_filled"),
        F.col("value").isNotNull().alias("has_val"),
        F.when(F.col("value").isNull(), 0).otherwise(1).cast("long").alias("val_flag"),
    )


@query(
    "q_datetime_funcs",
    oracle="""
SELECT o_orderkey,
       EXTRACT(year  FROM CAST(o_orderdate AS DATE))            AS order_year,
       EXTRACT(month FROM CAST(o_orderdate AS DATE))            AS order_month,
       EXTRACT(dow   FROM CAST(o_orderdate AS DATE))            AS order_dow,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP)    AS due_date,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
FROM orders
""",
)
def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function breadth (P5-P8 extended): extract, truncate,
    interval arithmetic, day difference — pure column algebra.
    DOW convention pinned to DuckDB's (Sunday=0): Spark's dayofweek is
    1-based Sunday=1, so subtract 1."""
    od = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    d = F.to_date("o_orderdate")
    return od.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        (F.dayofweek(d) - 1).cast("long").alias("order_dow"),
        F.trunc(d, "month").cast("timestamp").alias("month_start"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch_start"),
    )


@query(
    "q_zscore_outliers",
    oracle="""
WITH stats AS (
  SELECT event_type,
         avg(value) AS mu,
         stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       CASE WHEN abs((value - mu) / sigma) < 4.5e9 THEN floor(((value - mu) / sigma) * 1e4 + 0.5) / 1e4 ELSE ((value - mu) / sigma) END AS z
FROM events e JOIN stats USING (event_type)
WHERE abs(CASE WHEN abs((value - mu) / sigma) < 4.5e9 THEN floor(((value - mu) / sigma) * 1e4 + 0.5) / 1e4 ELSE ((value - mu) / sigma) END) > 2.5
""",
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection: group moments via one
    aggregate, broadcast back (the group-stats frame is
    |groups|-sized), flag |z| > 2.5. The filter compares the ROUNDED
    z on both engines so a last-ulp difference in the float moment
    sums can never flip a boundary row between Spark and the oracle.
    This normalize-against-group-statistics join-back is the template
    for standardization feature pipelines at scale: one shuffle for
    the moments, zero for the apply (broadcast)."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = floor_quantize((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )


@query(
    "q_histogram",
    oracle="""
SELECT (CAST(round(l_extendedprice * 100) AS BIGINT) // 500000) AS bucket,
       (CAST(round(l_extendedprice * 100) AS BIGINT) // 500000) * 5000 AS bucket_lo,
       count(*) AS n
FROM lineitem
GROUP BY 1, 2
""",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram ($5000 buckets of extended price).
    Bucketing runs on integer CENTS (round to cents, then integer
    division) so bucket membership is exact on both engines — a
    double divide-then-floor could disagree at bucket boundaries.
    Map-side partial count per bucket means the shuffle carries
    |buckets| rows per task regardless of input size."""
    li = load(spark, sf_dir, "lineitem", columns=["l_extendedprice"])
    bucket = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 500000")
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bucket", (F.col("bucket") * 5000).alias("bucket_lo"), "n")
    )


@query(
    "q_mad_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
),
dev AS (
  SELECT event_id, e.event_type, value, med, abs(value - med) AS ad
  FROM events e JOIN med USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type)
SELECT event_id, d.event_type, value,
       CASE WHEN abs(0.6745 * (value - d.med) / m.mad) < 4.5e9 THEN floor((0.6745 * (value - d.med) / m.mad) * 1e6 + 0.5) / 1e6 ELSE (0.6745 * (value - d.med) / m.mad) END AS robust_z
FROM dev d JOIN mad m USING (event_type)
WHERE abs(CASE WHEN abs(0.6745 * (value - d.med) / m.mad) < 4.5e9 THEN floor((0.6745 * (value - d.med) / m.mad) * 1e6 + 0.5) / 1e6 ELSE (0.6745 * (value - d.med) / m.mad) END) > 2.0
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    heavy-tail-safe twin of q_zscore_outliers (one wild value moves a
    mean/stddev gate, not a median/MAD gate). Two percentile
    aggregates (median, then median of absolute deviations), each a
    tiny per-group state broadcast back to the row stream; the flag
    compares the ROUNDED modified z-score (0.6745·dev/MAD,
    Iglewicz-Hoaglin) so a last-ulp interpolation difference can't
    flip a boundary row between engines. Scale 6, not 4: on a
    small-integer corpus the score 0.6745·k/2 has EXACTLY four
    decimal digits ending in …25, i.e. it sits exactly on the
    scale-4 half boundary — where Spark (HALF_UP on the binary
    expansion) and DuckDB (whose double round multiplies by an
    inexact pow(10,s)) legitimately disagree by one last-place
    digit. At scale 6 those values are ≥ half a last-place digit
    away from every boundary, so both engines round identically
    (found by tests/test_fuzz_timeseries.py; continuous fixture
    values never hit the knife edge)."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("ad", F.lit(0.5)).alias("mad"))
    # try_divide: a degenerate group (MAD 0 — constant or single
    # value) has no robust z; NULL filters out below, same as the
    # oracle's /0 NULL (ANSI throws otherwise)
    rz = floor_quantize(
        F.try_divide(F.lit(0.6745) * (F.col("value") - F.col("med")), F.col("mad")), 6
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select("event_id", "event_type", "value", rz.alias("robust_z"))
        .filter(F.abs(F.col("robust_z")) > 2.0)
    )


@query(
    "q_winsorize",
    oracle="""
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       CASE WHEN abs(least(greatest(value, lo), hi)) < 4.5e9 THEN floor((least(greatest(value, lo), hi)) * 1e4 + 0.5) / 1e4 ELSE (least(greatest(value, lo), hi)) END AS value_winsorized,
       (value < lo OR value > hi)               AS clipped
FROM events e JOIN bounds USING (event_type)
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip values to the [p5, p95] band —
    the standard outlier-robust feature transform before training.
    One percentile aggregate per group (both fractions share one
    sketch-buffer pass), broadcast back, then a pure map-side clip;
    output rounded to 4 dp so a last-ulp quantile-interpolation
    difference can't leak into boundary rows."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    ps = F.percentile("value", F.array(F.lit(0.05), F.lit(0.95)))
    bounds = (
        ev.groupBy("event_type")
        .agg(ps.alias("ps"))
        .select("event_type", F.element_at("ps", 1).alias("lo"), F.element_at("ps", 2).alias("hi"))
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            floor_quantize(clipped, 4).alias("value_winsorized"),
            ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias("clipped"),
        )
    )


@query(
    "q_gini_nations",
    oracle="""
WITH cents AS (
  SELECT c_nationkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey) AS i
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CASE WHEN abs(CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
             / CAST(count(*) * sum(x) AS DOUBLE)) < 4.5e9 THEN floor((CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
             / CAST(count(*) * sum(x) AS DOUBLE)) * 1e6 + 0.5) / 1e6 ELSE (CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
             / CAST(count(*) * sum(x) AS DOUBLE)) END AS gini
FROM cents
GROUP BY c_nationkey
""",
)
def q_gini_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per customer nation — the
    inequality/concentration profile of spend. Computed from the
    rank-weighted form G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) on integer
    CENTS, so every aggregate is exact 64-bit arithmetic and only the
    final division is floating — bit-identical across engines (ties
    don't matter: permuting equal x leaves Σi·x unchanged). One
    fact-side shuffle for the per-nation rank sort; the aggregates
    ride the same partitioning."""
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    x = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    w = Window.partitionBy("c_nationkey").orderBy("x", "o_orderkey")
    cents = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_nationkey", "o_orderkey", x.alias("x"))
        .withColumn("i", F.row_number().over(w))
    )
    n = F.count(F.lit(1))
    return cents.groupBy("c_nationkey").agg(
        n.cast("long").alias("n_orders"),
        floor_quantize(
            (2 * F.sum(F.col("i") * F.col("x")) - (n + 1) * F.sum("x")).cast("double")
            / (n * F.sum("x")).cast("double"), 6).alias("gini"),
    )


@query(
    "q_market_concentration",
    oracle="""
WITH rev AS (
  SELECT s_nationkey,
         l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_nationkey, l_suppkey
)
SELECT s_nationkey,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       -- squares at (19,4): (38,8)^2 needs scale 16 and overflows the
       -- 38-digit cap at ~1e12 revenues (magnitude seed 5401); (19,4)
       -- squares land at (38,8), exact to ~1e15 per-supplier revenue.
       -- decimal->double through VARCHAR (correctly-rounded parse).
       floor(CAST(CAST(sum(CAST(r AS DECIMAL(19,4)) * CAST(r AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE)
             / (CAST(CAST(sum(r) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(r) AS VARCHAR) AS DOUBLE))
             * 1e6 + 0.5) / 1e6 AS hhi
FROM rev
GROUP BY s_nationkey
""",
)
def q_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue within each
    nation: HHI = Σr²/(Σr)² — 1/n for perfect competition, 1.0 for
    monopoly. Revenue sums stay DECIMAL end-to-end (exact,
    order-independent); the squares run at DECIMAL(19,4) — wide
    enough for int128 arithmetic and a (38,8) exact square up to
    ~1e15 per-supplier revenue, narrow enough that neither engine
    hits the 38-digit cap (the earlier (38,8) spelling overflowed
    DuckDB and silently lost scale on Spark at ~1e12 revenues —
    magnitude campaign, seed 5401) — so nothing rounds until the
    single final division, quantized floor(x·1e6+0.5)/1e6 on both
    engines. Two
    aggregates sharing one shuffle key hierarchy: per-(nation,
    supplier) partial sums, then the nation rollup."""
    li = load(spark, sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])
    supp = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("r")
        )
    )
    r19 = F.col("r").cast("decimal(19,4)")
    hhi = F.sum(r19 * r19).cast("double") / (
        F.sum("r").cast("double") * F.sum("r").cast("double")
    )
    return rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        (F.floor(hhi * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("hhi"),
    )


@query(
    "q_trend_slope",
    oracle="""
WITH daily AS (
  SELECT c_nationkey,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS yc
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
m AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(CAST(x AS BIGINT) * x) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(yc) AS VARCHAR) AS DOUBLE) / 100 AS sy,
         CAST(CAST(SUM(x * yc) AS VARCHAR) AS DOUBLE) / 100 AS sxy,
         CAST(CAST(SUM(CAST(yc AS HUGEINT) * yc) AS VARCHAR) AS DOUBLE) / 10000 AS syy
  FROM daily GROUP BY c_nationkey
)
SELECT c_nationkey,
       floor((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0) * 1e6 + 0.5) / 1e6 AS slope,
       floor((sy - (n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0) * sx) / n * 1e6 + 0.5) / 1e6
         AS intercept,
       floor((n*sxy - sx*sy) * (n*sxy - sx*sy)
             / nullif((n*sxx - sx*sx) * (n*syy - sy*sy), 0) * 1e6 + 0.5) / 1e6 AS r2
FROM m
""",
)
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend: OLS slope/intercept/R² as a
    single-pass mergeable aggregate (n, Σx, Σy, Σxy, Σx², Σy²), no
    matrix math, no second scan. The sufficient statistics are EXACT
    integers — x is a day ordinal, y is daily revenue in CENTS
    (bigint; the Σy² term goes through DECIMAL(37,0) / HUGEINT) — and
    only the final normal-equation algebra runs in double, written
    with the identical op order on both sides, so slope/intercept/R²
    are bit-identical cross-engine before the floor(x·1e6+0.5)/1e6
    quantization. The earlier regr_slope/regr_intercept/regr_r2
    spelling carried merge-order-dependent DOUBLE states whose ulp
    wobble flipped a 6-dp digit on a fuzz corpus (extended campaign,
    seed 3001) — same class and fix as q_stats_agg. Zero-x-variance
    groups yield NULL via nullif/try_divide, matching regr_slope.
    The grouped daily agg and the regression share one shuffle key
    hierarchy."""
    orders = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    daily = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_nationkey",
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("x"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("yc")
        )
    )
    m = daily.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x").cast("long") * F.col("x")).cast("double").alias("sxx"),
        (F.sum("yc").cast("double") / 100).alias("sy"),
        (
            # Accumulate Σ(x·yc) in decimal like syy: x·yc reaches ~1e15-1e16
            # per row at adversarial magnitudes, so a long SUM has only ~3×
            # headroom before silent wraparound (ANSI off) while the oracle
            # sums in HUGEINT. decimal(18,0)·decimal(18,0) products sum in
            # decimal(38,0) — exact, like the oracle.
            F.sum(F.col("x").cast("decimal(18,0)") * F.col("yc").cast("decimal(18,0)"))
            .cast("double")
            / 100
        ).alias("sxy"),
        (
            F.sum(F.col("yc").cast("decimal(18,0)") * F.col("yc").cast("decimal(18,0)"))
            .cast("double")
            / 10000
        ).alias("syy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy, syy = F.col("sy"), F.col("sxy"), F.col("syy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy

    def round6(c):  # floor(x·1e6 + 0.5)/1e6 — engine-independent (q_stats_agg)
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    slope_raw = cov / F.nullif(varx, F.lit(0.0))
    return m.select(
        "c_nationkey",
        round6(slope_raw).alias("slope"),
        round6((sy - slope_raw * sx) / n).alias("intercept"),
        round6(cov * cov / F.nullif(varx * vary, F.lit(0.0))).alias("r2"),
    )


@query(
    "q_autocorr_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
  FROM daily
),
pairs AS (SELECT * FROM lagged WHERE prev_n IS NOT NULL),
m AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS k,
         sum(n) AS sx, sum(prev_n) AS sy,
         sum(n * prev_n) AS sxy, sum(n * n) AS sxx, sum(prev_n * prev_n) AS syy
  FROM pairs GROUP BY event_type
)
SELECT l.event_type,
       CASE WHEN abs((k * sxy - sx * sy)
              / sqrt((k * sxx - sx * sx) * (k * syy - sy * sy))) < 4.5e9
            THEN floor(((k * sxy - sx * sy)
              / sqrt((k * sxx - sx * sx) * (k * syy - sy * sy))) * 1e6 + 0.5) / 1e6
            ELSE ((k * sxy - sx * sy)
              / sqrt((k * sxx - sx * sx) * (k * syy - sy * sy))) END AS autocorr_lag1
FROM (SELECT DISTINCT event_type FROM lagged) l LEFT JOIN m ON l.event_type IS NOT DISTINCT FROM m.event_type
""",
)
def q_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily volume — the
    burstiness/seasonality probe. Window lag + one grouped moment
    aggregate compose directly: the per-type day sort serves the lag,
    the five Pearson moment sums merge map-side, and the final
    formula is one identical IEEE expression tree per group on exact
    integer-count sums. Spelled as EXPLICIT moments + try_divide (the
    q_trend_slope discipline) rather than the built-in corr: under
    Spark 4's default ANSI mode `corr` of a zero-variance series
    raises DIVIDE_BY_ZERO inside the aggregate — unguardable from the
    projection — while DuckDB's corr yields NULL (found by the
    nulls×magnitude interaction probe). Rounded 6 dp."""
    ev = load(spark, sf_dir, "events", columns=["event_type", "ts"])
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("prev_n", F.lag("n").over(w))
    pairs = lagged.filter(F.col("prev_n").isNotNull())
    x, y = F.col("n"), F.col("prev_n")
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    r = F.try_divide(
        k * sxy - sx * sy, F.sqrt((k * sxx - sx * sx) * (k * syy - sy * sy))
    )
    # eqNullSafe: a NULL event_type group must still find its moments
    # (plain key-joins drop NULL keys; oracle: IS NOT DISTINCT FROM)
    types = lagged.select("event_type").distinct()
    return types.alias("t").join(
        m.alias("m"),
        F.col("t.event_type").eqNullSafe(F.col("m.event_type")),
        "left",
    ).select(F.col("t.event_type").alias("event_type"), floor_quantize(r, 6).alias("autocorr_lag1"))


@query(
    "q_chisq_lang_source",
    oracle="""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS o FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT lang, source, o,
         sum(o) OVER (PARTITION BY lang)   AS rt,
         sum(o) OVER (PARTITION BY source) AS ct,
         sum(o) OVER ()                    AS n
  FROM cells
)
SELECT CASE WHEN abs(sum((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n))) < 4.5e9 THEN floor((sum((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n))) * 1e4 + 0.5) / 1e4 ELSE (sum((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n))) END AS chi2,
       CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
       CAST(sum(o) AS BIGINT) AS n_docs
FROM tot
""",
)
def q_chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the lang × source
    contingency table — the drift/balance check a corpus-mixing
    pipeline runs per snapshot (is language independent of source?).
    One count aggregate builds the cells; row/column/grand totals are
    unbounded-frame window sums over the TINY cell table (|langs| ×
    |sources| rows, so the windows cost nothing at any corpus scale);
    expected counts come from exact integer-derived doubles.

    Cells absent from the data (o = 0) contribute rt·ct/n to the
    statistic; the fixture grid is fully populated, and the operator
    documents (rather than densifies) that edge — production use
    cross-joins the margins first when sparsity matters."""
    docs = load(spark, sf_dir, "documents", columns=["lang", "source"])
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("double").alias("o"))
    rt = F.sum("o").over(Window.partitionBy("lang"))
    ct = F.sum("o").over(Window.partitionBy("source"))
    n = F.sum("o").over(Window.partitionBy())
    tot = cells.select("lang", "source", "o", rt.alias("rt"), ct.alias("ct"), n.alias("n"))
    e = F.col("rt") * F.col("ct") / F.col("n")
    return tot.agg(
        floor_quantize(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4).alias("chi2"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).cast("long").alias("dof"),
        F.sum("o").cast("long").alias("n_docs"),
    )


@query(
    "q_theil_index",
    oracle="""
WITH shift AS (
  -- positivity shift derived from the DATA, not the fixture envelope:
  -- x = acctbal - min(acctbal) + 1000 stays strictly positive at any
  -- balance magnitude (a flat +1000 went negative once balances were
  -- fuzzed to ~-9e8 and ln(x) blew up — magnitude seed 5401). The min
  -- is an exact DECIMAL scalar, so x is identical IEEE cross-engine.
  -- subtraction stays in DECIMAL (exact), ONE correctly-rounded cast
  -- to double at the end, VARCHAR-routed so both engines parse the
  -- same digits (DuckDB's native decimal->double cast diverged from
  -- Spark's BigDecimal.doubleValue by 1 ulp in the magnitude fuzz).
  SELECT CAST(CAST(1000.0 - least(MIN(CAST(c_acctbal AS DECIMAL(18,2))), 0) AS VARCHAR) AS DOUBLE) AS s0
  FROM customer
),
base AS (
  SELECT c_nationkey, CAST(c_acctbal + s0 AS DOUBLE) AS x
  FROM customer CROSS JOIN shift
),
mu AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS m,
         COUNT(*) AS n
  FROM base GROUP BY c_nationkey
)
SELECT c_nationkey, n,
       CASE WHEN abs(t) < 4.5e9 THEN floor(t * 1e4 + 0.5) / 1e4 ELSE t END AS theil_t
FROM (
  SELECT b.c_nationkey,
         MAX(n) AS n,
         SUM((x / m) * ln(x / m)) / MAX(n) AS t
  FROM base b JOIN mu USING (c_nationkey)
  GROUP BY b.c_nationkey
)
""",
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index per nation over (shifted-positive)
    account balances — the decomposable inequality measure next to
    q_gini_nations' rank-based one: T = mean((x/μ)·ln(x/μ)), with
    x shifted positive by the global-min balance (data-derived, so
    the domain requirement ln(x>0) holds at any magnitude).

    The group mean μ comes from a DECIMAL sum over exact 2-decimal
    inputs (order-independent numerator), broadcast back onto the
    rows; each row's term is then identical IEEE in both engines and
    only the final per-group mean is rounded (4 dp absorbs
    summation-order ulps — the q_unigram_logprob precedent). Two
    shuffles: the moments agg and the join-back agg, both keyed by
    nation."""
    cust = load(spark, sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    # s0 = 1000 − min(bal): computed ENTIRELY in decimal (both operands
    # exact) with one correctly-rounded double cast at the end, so it is
    # bit-identical to the oracle's. A double-typed 1000.0 literal here
    # would demote the subtraction to fl(1000 − fl(min)) — 1 ulp off the
    # oracle's exact decimal at ~1e9 balances, poisoning every x.
    shift = cust.agg(
        (
            F.lit("1000.00").cast("decimal(18,2)")
            - F.least(F.min(F.col("c_acctbal").cast("decimal(18,2)")), F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("s0")
    )
    base = cust.crossJoin(F.broadcast(shift)).select(
        "c_nationkey", (F.col("c_acctbal") + F.col("s0")).cast("double").alias("x")
    )
    mu = base.groupBy("c_nationkey").agg(
        (F.sum(F.col("x").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("m"),
        F.count("*").alias("n"),
    )
    t = (
        F.sum((F.col("x") / F.col("m")) * F.log(F.col("x") / F.col("m"))) / F.max("n")
    ).alias("t")
    agg = (
        base.join(F.broadcast(mu), "c_nationkey")
        .groupBy("c_nationkey")
        .agg(F.max("n").alias("n"), t)
    )
    # Guarded floor-quantize (shared spelling, q_stats_agg precedent)
    # instead of native ROUND: half-boundary semantics are
    # engine-divergent; floor(x·1e4 + 0.5) is the same function in both.
    q4 = F.floor(F.col("t") * 1e4 + F.lit(0.5)) / 1e4
    return agg.select(
        "c_nationkey",
        "n",
        F.when(F.abs(F.col("t")) < F.lit(4.5e9), q4).otherwise(F.col("t")).alias("theil_t"),
    )


@query(
    "q_math_funcs",
    oracle="""
SELECT p_partkey,
       ABS(p_retailprice - 1000.0)                         AS abs_diff,
       CEIL(p_retailprice)                                 AS price_ceil,
       FLOOR(p_retailprice)                                AS price_floor,
       CAST(SIGN(p_retailprice - 1000.0) AS DOUBLE)        AS price_sign,
       CASE WHEN abs(SQRT(p_retailprice)) < 4.5e9 THEN floor((SQRT(p_retailprice)) * 1e6 + 0.5) / 1e6 ELSE (SQRT(p_retailprice)) END                       AS price_sqrt,
       CASE WHEN abs(LN(p_retailprice)) < 4.5e9 THEN floor((LN(p_retailprice)) * 1e6 + 0.5) / 1e6 ELSE (LN(p_retailprice)) END                         AS price_ln,
       CASE WHEN abs(EXP(CAST(p_size AS DOUBLE) / 25.0)) < 4.5e9 THEN floor((EXP(CAST(p_size AS DOUBLE) / 25.0)) * 1e6 + 0.5) / 1e6 ELSE (EXP(CAST(p_size AS DOUBLE) / 25.0)) END        AS size_exp,
       CASE WHEN abs(POWER(p_retailprice, 0.5) * POWER(p_size, 2)) < 4.5e9 THEN floor((POWER(p_retailprice, 0.5) * POWER(p_size, 2)) * 1e4 + 0.5) / 1e4 ELSE (POWER(p_retailprice, 0.5) * POWER(p_size, 2)) END AS poly,
       CAST(p_size % 7 AS BIGINT)                          AS size_mod,
       CASE WHEN abs(LOG10(p_retailprice)) < 4.5e9 THEN floor((LOG10(p_retailprice)) * 1e6 + 0.5) / 1e6 ELSE (LOG10(p_retailprice)) END                      AS price_log10,
       CASE WHEN abs(SIN(p_retailprice / 100.0)
             + COS(p_retailprice / 100.0)) < 4.5e9 THEN floor((SIN(p_retailprice / 100.0)
             + COS(p_retailprice / 100.0)) * 1e6 + 0.5) / 1e6 ELSE (SIN(p_retailprice / 100.0)
             + COS(p_retailprice / 100.0)) END              AS trig
FROM part
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function breadth (the numeric half of P11): abs / ceil /
    floor / sign / sqrt / ln / exp / power / modulo / log10 / trig in
    ONE codegen'd projection — zero shuffles, every function a JVM
    intrinsic over libm, transcendentals rounded 6 dp (ulp policy).
    CEIL/FLOOR return BIGINT in DuckDB-compatible form on both
    sides."""
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_size"])
    price = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.abs(price - 1000.0).alias("abs_diff"),
        F.ceil(price).cast("double").alias("price_ceil"),
        F.floor(price).cast("double").alias("price_floor"),
        F.signum(price - 1000.0).alias("price_sign"),
        floor_quantize(F.sqrt(price), 6).alias("price_sqrt"),
        floor_quantize(F.log(price), 6).alias("price_ln"),
        floor_quantize(F.exp(F.col("p_size").cast("double") / 25.0), 6).alias("size_exp"),
        floor_quantize(F.pow(price, 0.5) * F.pow(F.col("p_size"), 2), 4).alias("poly"),
        (F.col("p_size") % 7).cast("long").alias("size_mod"),
        floor_quantize(F.log10(price), 6).alias("price_log10"),
        floor_quantize(F.sin(price / 100.0) + F.cos(price / 100.0), 6).alias("trig"),
    )


@query(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
       split_part(p_type, ' ', 1)                    AS type_head,
       split_part(p_type, ' ', 3)                    AS type_tail,
       reverse(p_brand)                              AS brand_rev,
       repeat(p_brand, 2)                            AS brand_twice,
       translate(p_name, 'aeiou', '.....')           AS name_devoweled,
       CAST(strpos(p_name, 'o') AS BIGINT)           AS first_o,
       left(p_name, 5)                               AS name_head,
       right(p_name, 3)                              AS name_tail,
       replace(p_brand, '#', '-')                    AS brand_dashed,
       CAST(contains(p_type, 'BRASS') AS BOOLEAN)    AS is_brass
FROM part
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth beyond P11's case/pad/regex layer:
    split_part / reverse / repeat / translate / position / left /
    right / replace / contains in ONE codegen'd projection — zero
    shuffles, all JVM intrinsics, byte-identical semantics between
    engines (strpos and instr are both 1-based with 0 for absent)."""
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"])
    return part.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(3)).alias("type_tail"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.translate(F.col("p_name"), "aeiou", ".....").alias("name_devoweled"),
        F.instr(F.col("p_name"), "o").cast("long").alias("first_o"),
        F.substring(F.col("p_name"), 1, 5).alias("name_head"),
        F.substring(F.col("p_name"), -3, 3).alias("name_tail"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dashed"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
    )


PCTL_DISC_FRACS = (0.25, 0.50, 0.75, 0.95)


@query(
    "q_percentile_disc",
    oracle=f"""
WITH ranked AS (
  SELECT l_returnflag, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag, p, l_quantity AS qty_at_p
FROM ranked
CROSS JOIN (VALUES {", ".join(f"({p})" for p in PCTL_DISC_FRACS)}) ps(p)
WHERE rn = GREATEST(1, CAST(CEIL(p * n) AS BIGINT))
""",
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (G5's missing half): the value AT rank
    ceil(p·n) — an actual data value, never interpolated, which is
    what SLA/latency reporting wants. Row-number by value + one
    per-group count window share a single shuffle; each requested
    fraction is a filter against the same ranked frame (ties collapse
    to identical values, so tie order can't change the answer).
    ceil(p·n) is the same IEEE double product in both engines."""
    li = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    byflag = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(byflag.orderBy("l_quantity")).alias("rn"),
        F.count(F.lit(1)).over(byflag).alias("n"),
    )
    ps = F.explode(F.array(*[F.lit(float(p)) for p in PCTL_DISC_FRACS])).alias("p")
    return (
        ranked.select("l_returnflag", "l_quantity", "rn", "n", ps)
        .filter(
            F.col("rn")
            == F.greatest(F.lit(1).cast("long"), F.ceil(F.col("p") * F.col("n")))
        )
        .select("l_returnflag", "p", F.col("l_quantity").alias("qty_at_p"))
    )


# ---------------------------------------------------------------------------
# P20 — ANSI-safe try_* arithmetic (Spark 4 ANSI mode discipline)
# ---------------------------------------------------------------------------


@query(
    "q_try_arithmetic",
    oracle="""
SELECT user_id,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchases,
       CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)    AS clicks,
       CASE WHEN COUNT(CASE WHEN event_type = 'click' THEN 1 END) = 0 THEN NULL
            ELSE CASE WHEN abs(CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
                       / COUNT(CASE WHEN event_type = 'click' THEN 1 END)) < 4.5e9 THEN floor((CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
                       / COUNT(CASE WHEN event_type = 'click' THEN 1 END)) * 1e6 + 0.5) / 1e6 ELSE (CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
                       / COUNT(CASE WHEN event_type = 'click' THEN 1 END)) END
       END AS conv_rate
FROM events
GROUP BY user_id
""",
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe ratio metrics via ``try_divide``: Spark 4 runs
    with ANSI SQL semantics by default, where x/0 THROWS instead of
    returning null — one user with zero clicks would kill a whole
    100 TB conversion-rate job at the last stage. try_divide yields
    NULL for that row and lets the rest commit; the oracle spells the
    same contract as an explicit zero guard. This is the discipline
    rule every ratio in this engine follows (guard or try_*), made
    explicit as its own operator."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_type"])
    purchases = F.count(F.when(F.col("event_type") == "purchase", 1))
    clicks = F.count(F.when(F.col("event_type") == "click", 1))
    return ev.groupBy("user_id").agg(
        purchases.alias("purchases"),
        clicks.alias("clicks"),
        floor_quantize(
            F.try_divide(purchases.cast("double"), clicks.cast("double")), 6).alias("conv_rate"),
    )


# ---------------------------------------------------------------------------
# G38 — log-scale histogram (heavy-tail profiling)
# ---------------------------------------------------------------------------


@query(
    "q_log_histogram",
    oracle="""
WITH b AS (
  SELECT CASE WHEN o_totalprice < 1 THEN -1
              ELSE CAST(FLOOR(LOG10(CAST(o_totalprice AS DOUBLE))) AS BIGINT)
         END AS decade
  FROM orders
)
SELECT decade,
       CAST(POWER(10, decade) AS DOUBLE)     AS bin_lo,
       CAST(POWER(10, decade + 1) AS DOUBLE) AS bin_hi,
       CAST(COUNT(*) AS BIGINT)              AS n_orders
FROM b GROUP BY decade
""",
)
def q_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₁₀-bucketed histogram of order totals — the right binning
    for heavy-tailed metrics (document lengths, payment amounts,
    degree distributions), where G13's fixed-width bins put 99% of
    mass in one bucket. Bucket = floor(log10(x)) computes map-side
    into ≤ ~12 buckets, so the shuffle carries a handful of partial
    counts no matter the row count. Boundary discipline: log10 of an
    exact power of 10 is bit-identical in both engines (same libm
    contract for exact powers), and fixture prices are cents-valued
    doubles well away from decade edges; sub-1 values collapse to a
    single -1 bucket rather than unbounded negative decades."""
    od = load(spark, sf_dir, "orders", columns=["o_totalprice"])
    decade = F.when(F.col("o_totalprice") < 1, F.lit(-1)).otherwise(
        F.floor(F.log10(F.col("o_totalprice").cast("double")))
    )
    return (
        od.select(decade.cast("long").alias("decade"))
        .groupBy("decade")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "decade",
            F.pow(F.lit(10.0), F.col("decade")).alias("bin_lo"),
            F.pow(F.lit(10.0), F.col("decade") + 1).alias("bin_hi"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# q_cramers_v — dependence EFFECT SIZE next to G23's test statistic (G54)
# ---------------------------------------------------------------------------


@query(
    "q_cramers_v",
    oracle="""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS o FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT lang, source, o,
         sum(o) OVER (PARTITION BY lang)   AS rt,
         sum(o) OVER (PARTITION BY source) AS ct,
         sum(o) OVER ()                    AS n
  FROM cells
),
stat AS (
  SELECT sum((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n)) AS chi2,
         CAST(count(DISTINCT lang) AS BIGINT)   AS r,
         CAST(count(DISTINCT source) AS BIGINT) AS c,
         sum(o) AS n
  FROM tot GROUP BY ()
)
SELECT CASE WHEN abs(chi2) < 4.5e9 THEN floor((chi2) * 1e4 + 0.5) / 1e4 ELSE (chi2) END                                   AS chi2,
       CASE WHEN abs(sqrt(chi2 / (n * (least(r, c) - 1)))) < 4.5e9 THEN floor((sqrt(chi2 / (n * (least(r, c) - 1)))) * 1e4 + 0.5) / 1e4 ELSE (sqrt(chi2 / (n * (least(r, c) - 1)))) END   AS cramers_v,
       r AS n_rows, c AS n_cols, CAST(n AS BIGINT)      AS n_docs
FROM stat
""",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for lang × source — the EFFECT SIZE companion to
    G23's chi-square: the test statistic grows with n (any real
    dependence becomes 'significant' at corpus scale), while
    V = sqrt(chi2 / (n·(min(r,c)−1))) ∈ [0,1] answers the question a
    mixture owner actually has — HOW MUCH does source determine
    language. Same plan as G23 (one cell aggregate + margin windows
    over the |langs|×|sources| frame, free at any scale); sqrt is
    IEEE-exact and the two outputs round 4 dp."""
    docs = load(spark, sf_dir, "documents", columns=["lang", "source"])
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("double").alias("o"))
    rt = F.sum("o").over(Window.partitionBy("lang"))
    ct = F.sum("o").over(Window.partitionBy("source"))
    n = F.sum("o").over(Window.partitionBy())
    tot = cells.select("lang", "source", "o", rt.alias("rt"), ct.alias("ct"), n.alias("n"))
    e = F.col("rt") * F.col("ct") / F.col("n")
    stat = tot.agg(
        F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
        F.countDistinct("lang").cast("long").alias("r"),
        F.countDistinct("source").cast("long").alias("c"),
        F.sum("o").alias("n"),
    )
    return stat.select(
        floor_quantize("chi2", 4).alias("chi2"),
        # try_divide: a 1x1 contingency table has min(r,c)-1 = 0 —
        # V undefined (NULL both engines; ANSI /0 throws otherwise)
        floor_quantize(
            F.sqrt(F.try_divide(F.col("chi2"), F.col("n") * (F.least("r", "c") - 1))), 4).alias("cramers_v"),
        F.col("r").alias("n_rows"),
        F.col("c").alias("n_cols"),
        F.col("n").cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# q_runs_test — Wald–Wolfowitz randomness probe on the daily series (G55)
# ---------------------------------------------------------------------------


@query(
    "q_runs_test",
    oracle="""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem GROUP BY 1
),
med AS (
  SELECT MIN(rev) AS m FROM (
    SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, d) AS rk, COUNT(*) OVER () AS n
    FROM daily
  ) WHERE 2 * rk >= n + 1
),
signs AS (
  SELECT d, CASE WHEN rev > m THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med WHERE rev <> m
),
runs AS (
  SELECT s, CASE WHEN LAG(s) OVER (ORDER BY d) IS DISTINCT FROM s THEN 1 ELSE 0 END AS brk
  FROM signs
)
SELECT CAST(SUM(brk) AS BIGINT)                          AS n_runs,
       CAST(SUM(s) AS BIGINT)                            AS n_above,
       CAST(COUNT(*) - SUM(s) AS BIGINT)                 AS n_below,
       CASE WHEN abs((SUM(brk) - (2.0 * SUM(s) * (COUNT(*) - SUM(s)) / COUNT(*) + 1))
             / sqrt((2.0 * SUM(s) * (COUNT(*) - SUM(s))
                     * (2.0 * SUM(s) * (COUNT(*) - SUM(s)) - COUNT(*)))
                    / (CAST(COUNT(*) AS DOUBLE) * COUNT(*) * (COUNT(*) - 1)))) < 4.5e9 THEN floor(((SUM(brk) - (2.0 * SUM(s) * (COUNT(*) - SUM(s)) / COUNT(*) + 1))
             / sqrt((2.0 * SUM(s) * (COUNT(*) - SUM(s))
                     * (2.0 * SUM(s) * (COUNT(*) - SUM(s)) - COUNT(*)))
                    / (CAST(COUNT(*) AS DOUBLE) * COUNT(*) * (COUNT(*) - 1)))) * 1e4 + 0.5) / 1e4 ELSE ((SUM(brk) - (2.0 * SUM(s) * (COUNT(*) - SUM(s)) / COUNT(*) + 1))
             / sqrt((2.0 * SUM(s) * (COUNT(*) - SUM(s))
                     * (2.0 * SUM(s) * (COUNT(*) - SUM(s)) - COUNT(*)))
                    / (CAST(COUNT(*) AS DOUBLE) * COUNT(*) * (COUNT(*) - 1)))) END AS z
FROM runs
""",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily revenue series: is the
    above/below-median sign sequence random, or does it cluster
    (momentum/regime behavior the i.i.d. assumptions behind G28's
    A/B test and G50's bootstrap would violate)? The fact table
    collapses to |days| DECIMAL-exact rows first; the discrete median
    is the G35 ranked idiom (value at rank ⌈n/2⌉, never interpolated,
    median-equal days excluded per the classical test); run counting
    is one lag window over the day-ordered sign sequence — |days|
    rows, so the window is free. All counts integer; the z statistic
    is computed from those integers in identical op order both
    engines, rounded 4 dp."""
    li = load(spark, sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"))
    )
    wr = Window.orderBy("rev", "d")
    ranked = daily.select(
        "d", "rev", F.row_number().over(wr).alias("rk"), F.count(F.lit(1)).over(Window.partitionBy()).alias("n")
    )
    med = ranked.filter(2 * F.col("rk") >= F.col("n") + 1).agg(F.min("rev").alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("rev") != F.col("m"))
        .select("d", F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    wd = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(~F.lag("s").over(wd).eqNullSafe(F.col("s")), 1).otherwise(0).alias("brk"),
    )
    na = F.sum("s").cast("double")
    nb = (F.count(F.lit(1)) - F.sum("s")).cast("double")
    nn = F.count(F.lit(1)).cast("double")
    mu = 2.0 * na * nb / nn + 1
    var = (2.0 * na * nb * (2.0 * na * nb - nn)) / (nn * nn * (nn - 1))
    return runs.agg(
        F.sum("brk").cast("long").alias("n_runs"),
        F.sum("s").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n_below"),
        floor_quantize((F.sum("brk") - mu) / F.sqrt(var), 4).alias("z"),
    )


# ---------------------------------------------------------------------------
# q_theil_sen — robust trend slope beside G21's OLS (G56)
# ---------------------------------------------------------------------------


@query(
    "q_theil_sen",
    oracle="""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1998-01-01' AND DATE '1998-03-31'
  GROUP BY 1
),
slopes AS (
  SELECT CASE WHEN abs((b.rev - a.rev) / (datediff('day', a.d, b.d))) < 4.5e9 THEN floor(((b.rev - a.rev) / (datediff('day', a.d, b.d))) * 1e6 + 0.5) / 1e6 ELSE ((b.rev - a.rev) / (datediff('day', a.d, b.d))) END AS slope,
         a.d AS d1, b.d AS d2
  FROM daily a JOIN daily b ON a.d < b.d
),
ranked AS (
  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, d1, d2) AS rk, COUNT(*) OVER () AS n
  FROM slopes
)
SELECT MIN(CASE WHEN 2 * rk >= n + 1 THEN slope END)     AS median_slope,
       CAST(MAX(n) AS BIGINT)                            AS n_pairs
FROM ranked
""",
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator over the daily revenue
    series: the median of all pairwise day-to-day slopes — immune to
    the outlier days that drag G21's OLS slope (29% breakdown point
    vs OLS's zero).

    Pairwise is affordable BECAUSE of the collapse order: the fact
    table reduces to |days| DECIMAL-exact rows first (3 months ⇒ ≤90
    rows ⇒ ≤4005 pairs — constant at any fact scale; an unbounded
    calendar would cap the window or bucket it first, and the
    docstring is the contract that says so). The pair self-join is a
    theta-join on the TINY frame; the discrete median is the G35
    ranked idiom over slopes pre-rounded 6 dp (ranking the rounded
    value keeps the order — and thus the pick — engine-identical)."""
    li = load(spark, sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"]).filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("rev"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.d") < F.col("b.d")).select(
        floor_quantize(
            (F.col("b.rev") - F.col("a.rev")) / F.datediff(F.col("b.d"), F.col("a.d")), 6).alias("slope"),
        F.col("a.d").alias("d1"),
        F.col("b.d").alias("d2"),
    )
    wr = Window.orderBy("slope", "d1", "d2")
    ranked = slopes.select(
        "slope",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.min(F.when(2 * F.col("rk") >= F.col("n") + 1, F.col("slope"))).alias("median_slope"),
        F.max("n").cast("long").alias("n_pairs"),
    )
