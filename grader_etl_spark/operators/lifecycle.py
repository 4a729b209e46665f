"""Lifecycle & distributional-dependence analytics: Kaplan-Meier
survival over the customer order history, weighted quantiles, a
Pearson correlation matrix, and categorical mutual information.

These extend the reference's reporting layer (main.py:278-289 computes
one daily aggregate) with the survival/dependence questions a grading
pipeline's analysts ask next: how long do customers stay active, what
price does the median *unit* ship at, which numeric columns co-move,
and how much does knowing a document's source tell you about its
language.

Scale notes (100 TB discipline):
- Kaplan-Meier reduces to one per-customer aggregate (key-partitioned
  shuffle), then the life table is |distinct lifetimes| rows — tiny —
  so the global-ordered cumulative windows run on an already-reduced
  frame, never on the fact table.
- Weighted quantiles use per-group window cumsums (partition-local
  sorts AQE can split), integer-rescaled threshold tests (4*cum >= tot
  etc.) so no engine divides, and exact BIGINT weights.
- The correlation matrix is ONE pass over lineitem: all six corr
  states accumulate in a single mergeable aggregate, unpivoted after.
- Mutual information aggregates to |lang|x|source| cells before any
  window math; marginals ride window sums over the cell frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import fan_out, load, scatter_cap
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize

# Censoring rule for the survival curve: customers whose LAST order is
# within this many days of the pinned as-of date are still active
# (right-censored); everyone else churned at their last order.
# Pinned just past the fixtures' order-date range (P6 determinism —
# never current_date in an oracle-checked query).
KM_ASOF = "2001-09-01"
KM_CHURN_DAYS = 180


@query(
    "q_kaplan_meier",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey,
         date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                          MAX(CAST(o_orderdate AS DATE))) AS t_days,
         (date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                    DATE '{KM_ASOF}') > {KM_CHURN_DAYS}) AS churned
  FROM orders GROUP BY 1
), tbl AS (
  SELECT t_days,
         CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d_events,
         CAST(SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT) AS c_censored
  FROM cust GROUP BY 1
), risk AS (
  SELECT *,
         CAST(SUM(d_events + c_censored)
           OVER (ORDER BY t_days DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_risk
  FROM tbl
)
SELECT t_days, n_risk, d_events, c_censored,
       CASE WHEN MAX(CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t_days ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
            THEN 0.0
            ELSE CASE WHEN abs(EXP(SUM(CASE WHEN d_events < n_risk
                                    THEN LN(1.0 - CAST(d_events AS DOUBLE) / n_risk)
                                    ELSE 0.0 END)
                       OVER (ORDER BY t_days ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) < 4.5e9 THEN floor((EXP(SUM(CASE WHEN d_events < n_risk
                                    THEN LN(1.0 - CAST(d_events AS DOUBLE) / n_risk)
                                    ELSE 0.0 END)
                       OVER (ORDER BY t_days ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) * 1e6 + 0.5) / 1e6 ELSE (EXP(SUM(CASE WHEN d_events < n_risk
                                    THEN LN(1.0 - CAST(d_events AS DOUBLE) / n_risk)
                                    ELSE 0.0 END)
                       OVER (ORDER BY t_days ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) END
       END AS survival
FROM risk
""",
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of customer tenure.

    Tenure t = days between a customer's first and last order; the
    customer is an EVENT (churn) at t if their last order predates the
    pinned as-of date by more than KM_CHURN_DAYS, else right-censored.
    Life table per distinct t: d (events), c (censored), n_risk
    (customers with tenure >= t, via a descending cumulative sum), and
    S(t) = prod over event times <= t of (1 - d/n) computed as
    exp(cumsum(ln ...)) so the running product is a window sum.

    Shape: one groupBy(o_custkey) partial-agg over orders is the only
    fact-scale shuffle; the life table is |distinct tenures| rows
    (bounded by the date-range span in days, ~2.4k max), so the two
    single-partition ordered windows run on a frame that fits in one
    task at ANY input scale. Censored rows contribute ln(1)=0 to the
    product, matching the standard estimator."""
    od = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    cust = od.groupBy("o_custkey").agg(
        F.datediff(F.max(F.to_date("o_orderdate")), F.min(F.to_date("o_orderdate")))
        .cast("long")
        .alias("t_days"),
        (
            F.datediff(F.lit(KM_ASOF).cast("date"), F.max(F.to_date("o_orderdate")))
            > KM_CHURN_DAYS
        ).alias("churned"),
    )
    tbl = cust.groupBy("t_days").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d_events"),
        F.sum(F.when(F.col("churned"), 0).otherwise(1)).alias("c_censored"),
    )
    w_desc = (
        Window.orderBy(F.desc("t_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = tbl.withColumn("n_risk", F.sum(F.col("d_events") + F.col("c_censored")).over(w_desc))
    w_asc = (
        Window.orderBy(F.asc("t_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # When d == n at some event time the curve is exactly 0 from there
    # on. That MUST be an explicit absorbing flag: ln(0) is where the
    # engines diverge (Spark F.log(0) -> NULL, silently dropped from
    # the sum; DuckDB LN(0) -> -inf), so the log-sum only ever sees
    # d < n factors.
    zeroed = F.max(F.when(F.col("d_events") >= F.col("n_risk"), 1).otherwise(0)).over(w_asc)
    log_surv = F.sum(
        F.when(
            F.col("d_events") < F.col("n_risk"),
            F.log(F.lit(1.0) - F.col("d_events").cast("double") / F.col("n_risk")),
        ).otherwise(F.lit(0.0))
    ).over(w_asc)
    return risk.select(
        "t_days",
        "n_risk",
        "d_events",
        "c_censored",
        F.when(zeroed == 1, F.lit(0.0))
        .otherwise(floor_quantize(F.exp(log_surv), 6))
        .alias("survival"),
    )


@query(
    "q_weighted_quantiles",
    oracle="""
WITH cw AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag) AS tot
  FROM lineitem
)
SELECT l_returnflag,
       MIN(CASE WHEN 4 * cum >= tot     THEN l_extendedprice END) AS p25_w,
       MIN(CASE WHEN 2 * cum >= tot     THEN l_extendedprice END) AS p50_w,
       MIN(CASE WHEN 4 * cum >= 3 * tot THEN l_extendedprice END) AS p75_w,
       CAST(MAX(tot) AS BIGINT) AS total_qty
FROM cw
GROUP BY 1
""",
)
def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quantiles per return flag: the price at
    which 25/50/75% of shipped UNITS (not line rows) clear. The
    weighted p-quantile is the smallest price whose cumulative unit
    weight reaches p of the group total — threshold tests are
    integer-rescaled (4*cum >= tot, 2*cum >= tot, 4*cum >= 3*tot) on
    exact BIGINT weights, so no division and no float compare; the
    reported quantiles are actual data values, bit-equal across
    engines.

    Shape: one per-flag window cumsum (partition-local sort with a
    deterministic (price, orderkey, linenumber) order) + the group
    total as a frame-less window over the same partitioning — one
    shuffle, two window passes, then a 3-row-per-group conditional-min
    aggregate that partials map-side. At 100 TB the documented escape
    for a single hot group is the two-phase variant: per-salt cumsums
    merged by prefix offset (same plan shape as the stratified-sample
    two-phase top-k, sampling.py)."""
    li = load(
        spark,
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"],
    )
    part = Window.partitionBy("l_returnflag")
    cum_w = part.orderBy("l_extendedprice", "l_orderkey", "l_linenumber").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qty = F.col("l_quantity").cast("bigint")
    cw = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(qty).over(cum_w).alias("cum"),
        F.sum(qty).over(part).alias("tot"),
    )
    price = F.col("l_extendedprice")
    return cw.groupBy("l_returnflag").agg(
        F.min(F.when(4 * F.col("cum") >= F.col("tot"), price)).alias("p25_w"),
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), price)).alias("p50_w"),
        F.min(F.when(4 * F.col("cum") >= 3 * F.col("tot"), price)).alias("p75_w"),
        F.max("tot").alias("total_qty"),
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_SORTED = sorted(_CORR_COLS)
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_SORTED) for b in _CORR_SORTED[i + 1 :]
]

# Oracle assembled from the same pair list the Spark side iterates, so
# both engines evaluate ONE IEEE double expression tree per pair over
# moment sums that are EXACT (decimal accumulation; the source doubles
# are 2-dp values by construction, so the DECIMAL(19,4) scan cast is
# lossless on both engines).
_CORR_M_SQL = ",\n         ".join(
    [f"CAST(sum({c}) AS DOUBLE) AS s_{c}" for c in _CORR_SORTED]
    + [f"CAST(sum({c} * {c}) AS DOUBLE) AS ss_{c}" for c in _CORR_SORTED]
    + [f"CAST(sum({a} * {b}) AS DOUBLE) AS sp_{a}_{b}" for a, b in _CORR_PAIRS]
)
_CORR_ROWS_SQL = "\n  UNION ALL\n".join(
    f"  SELECT '{a}' AS var_x, '{b}' AS var_y,\n"
    f"         CASE WHEN (k * ss_{a} - s_{a} * s_{a})"
    f" * (k * ss_{b} - s_{b} * s_{b}) > 0\n"
    f"              THEN (k * sp_{a}_{b} - s_{a} * s_{b})\n"
    f"                   / sqrt((k * ss_{a} - s_{a} * s_{a})"
    f" * (k * ss_{b} - s_{b} * s_{b}))\n"
    f"              ELSE NULL END AS c, n FROM m"
    for a, b in _CORR_PAIRS
)


@query(
    "q_corr_matrix",
    oracle=f"""
WITH src AS (
  SELECT {", ".join(f"CAST({c} AS DECIMAL(19,4)) AS {c}" for c in _CORR_SORTED)}
  FROM lineitem
), m AS (
  SELECT CAST(count(*) AS DOUBLE) AS k, COUNT(*) AS n,
         {_CORR_M_SQL}
  FROM src
)
SELECT var_x, var_y,
       CASE WHEN abs(c) < 4.5e9 THEN floor(c * 1e6 + 0.5) / 1e6 ELSE c END
         AS corr,
       n
FROM (
{_CORR_ROWS_SQL}
) t
""",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's four
    numeric measures, long form (var_x < var_y lexicographically, 6
    rows). All fifteen moment states accumulate in ONE aggregate pass
    over the fact table — a single scan, map-side partials merging to
    one row — then the 1-row frame is unpivoted driver-free with
    stack().

    Spelled as EXPLICIT moment sums in DECIMAL(19,4) (the measures are
    2-dp values stored as double, so the scan cast and every sum are
    exact — no accumulation-order sensitivity at any merge fan-in),
    combined by ONE identical IEEE double tree per pair on both
    engines (q_autocorr_daily discipline; the earlier covar_pop /
    stddev_pop spelling took a different FP path than DuckDB's Welford
    corr). Zero-variance guard is the same CASE predicate both sides.
    Rounded to 6 dp."""
    # fan_out BEFORE the decimal casts: the fixture is one parquet row
    # group (unsplittable), so the 15 BigDecimal multiply+sum partials
    # otherwise run on the scan's 1-3 tasks while every other core
    # idles (measured 2.0→1.2 s at sf0.1); the exchange ships 8-byte
    # doubles, the casts run on the scattered side. Guarded no-op on a
    # many-split table at scale. Sums are exact decimal, so the result
    # is partition-count-invariant.
    li = fan_out(
        load(spark, sf_dir, "lineitem", columns=list(_CORR_COLS)), max_bytes=scatter_cap()
    ).select(
        *[F.col(c).cast("decimal(19,4)").alias(c) for c in _CORR_SORTED]
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("k"), F.count("*").alias("n")]
    for c in _CORR_SORTED:
        aggs.append(F.sum(F.col(c)).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).cast("double").alias(f"ss_{c}"))
    for a, b in _CORR_PAIRS:
        aggs.append(F.sum(F.col(a) * F.col(b)).cast("double").alias(f"sp_{a}_{b}"))
    one = li.agg(*aggs)

    def r_expr(a: str, b: str):
        k = F.col("k")
        sa, sb = F.col(f"s_{a}"), F.col(f"s_{b}")
        saa, sbb, sab = F.col(f"ss_{a}"), F.col(f"ss_{b}"), F.col(f"sp_{a}_{b}")
        denprod = (k * saa - sa * sa) * (k * sbb - sb * sb)
        return floor_quantize(
            F.when(denprod > F.lit(0.0), (k * sab - sa * sb) / F.sqrt(denprod)), 6
        )

    one = one.select(
        *[r_expr(a, b).alias(f"c_{a}_{b}") for a, b in _CORR_PAIRS], "n"
    )
    stack_args = ", ".join(f"'{a}', '{b}', c_{a}_{b}" for a, b in _CORR_PAIRS)
    return one.select(
        F.expr(f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (var_x, var_y, corr)"), "n"
    )


@query(
    "q_mutual_information",
    oracle="""
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n_xy FROM documents GROUP BY 1, 2
), m AS (
  SELECT *,
         SUM(n_xy) OVER (PARTITION BY lang)   AS n_x,
         SUM(n_xy) OVER (PARTITION BY source) AS n_y,
         SUM(n_xy) OVER ()                    AS n
  FROM cells
)
SELECT lang, source, n_xy,
       CASE WHEN abs(LN(CAST(n_xy AS DOUBLE) * n / (n_x * n_y))) < 4.5e9 THEN floor((LN(CAST(n_xy AS DOUBLE) * n / (n_x * n_y))) * 1e6 + 0.5) / 1e6 ELSE (LN(CAST(n_xy AS DOUBLE) * n / (n_x * n_y))) END AS pmi,
       CASE WHEN abs(SUM(CAST(n_xy AS DOUBLE) / n
                 * LN(CAST(n_xy AS DOUBLE) * n / (n_x * n_y)))
             OVER ()) < 4.5e9 THEN floor((SUM(CAST(n_xy AS DOUBLE) / n
                 * LN(CAST(n_xy AS DOUBLE) * n / (n_x * n_y)))
             OVER ()) * 1e6 + 0.5) / 1e6 ELSE (SUM(CAST(n_xy AS DOUBLE) / n
                 * LN(CAST(n_xy AS DOUBLE) * n / (n_x * n_y)))
             OVER ()) END AS mi_nats
FROM m
""",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source: the
    dependence audit behind sampling decisions (does source imply
    language?). Per observed (lang, source) cell: the pointwise MI
    ln(p_xy / (p_x p_y)), plus the corpus-level MI in nats (the
    p_xy-weighted sum over cells) repeated on every row.

    Shape: the fact table reduces to |lang| x |source| cells in one
    partial-agg shuffle; marginals and the MI total are window sums
    over that tiny cell frame (~100 rows at any corpus scale), so the
    unpartitioned windows are free. Chi-square (q_chisq_lang_source)
    tests the same pair for independence; MI quantifies the strength
    in interpretable units. Rounded to 6 dp."""
    docs = load(spark, sf_dir, "documents", columns=["lang", "source"])
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("n_xy"))
    n_x = F.sum("n_xy").over(Window.partitionBy("lang"))
    n_y = F.sum("n_xy").over(Window.partitionBy("source"))
    n = F.sum("n_xy").over(Window.partitionBy())
    m = cells.select("lang", "source", "n_xy", n_x.alias("n_x"), n_y.alias("n_y"), n.alias("n"))
    pmi = F.log(F.col("n_xy").cast("double") * F.col("n") / (F.col("n_x") * F.col("n_y")))
    contrib = F.col("n_xy").cast("double") / F.col("n") * pmi
    return m.select(
        "lang",
        "source",
        "n_xy",
        floor_quantize(pmi, 6).alias("pmi"),
        floor_quantize(F.sum(contrib).over(Window.partitionBy()), 6).alias("mi_nats"),
    )


@query(
    "q_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), tot AS (
  SELECT *,
         CAST(SUM(cents) OVER () AS BIGINT)              AS t_cents,
         CAST(COUNT(*)   OVER () AS BIGINT)              AS n_days,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
         CAST(SUM(cents) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM daily
), scored AS (
  SELECT day, cents,
         n_days * cum_cents - t * t_cents AS cusum_scaled,
         n_days
  FROM tot
)
SELECT day, cents, cusum_scaled,
       -- floor(x*100 + 0.5)/100, not ROUND: the engines' ROUNDs
       -- disagree on a half boundary (the q_stats_agg discipline)
       floor(CAST(cusum_scaled AS DOUBLE) / (n_days * 100.0) * 100 + 0.5) / 100
         AS cusum_value,
       (ABS(cusum_scaled) = MAX(ABS(cusum_scaled)) OVER ())
         AS is_changepoint
FROM scored
""",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection on the daily revenue series: the
    cumulative deviation from the global mean, S_t = Σ_{i≤t}(x_i − μ),
    peaks at the most likely changepoint (the classic offline CUSUM
    argmax). All comparisons are EXACT integers: revenue in cents,
    and S_t rescaled by n (n·cumsum_t − t·total is S_t·n with no
    division), so the argmax flag is bit-identical across engines —
    the double `cusum_value` is a rounded display column, never the
    decision input. Overflow headroom: n·cum stays under 2^63 through
    ~1e5× the fixture revenue volume; beyond that the documented swap
    is DECIMAL(38,0) for the two products.

    Shape: the fact table collapses to |days| rows in one partial-agg
    shuffle; every window (global total, ordered cumsum, global max)
    runs on that calendar-sized frame — single-partition windows on
    ≤ a-few-thousand rows at ANY input scale."""
    od = load(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    # day kept as midnight TIMESTAMP (not DATE) so both engines land
    # on the comparator's datetime64 dtype.
    daily = od.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
    )
    wall = Window.partitionBy()
    asc = Window.orderBy("day")
    cum = asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = daily.select(
        "day",
        "cents",
        F.sum("cents").over(wall).alias("t_cents"),
        F.count("*").over(wall).alias("n_days"),
        F.row_number().over(asc).cast("long").alias("t"),
        F.sum("cents").over(cum).alias("cum_cents"),
    )
    scored = tot.select(
        "day",
        "cents",
        (F.col("n_days") * F.col("cum_cents") - F.col("t") * F.col("t_cents")).alias(
            "cusum_scaled"
        ),
        "n_days",
    )
    return scored.select(
        "day",
        "cents",
        "cusum_scaled",
        (
            F.floor(
                F.col("cusum_scaled").cast("double")
                / (F.col("n_days") * 100.0)
                * F.lit(100)
                + F.lit(0.5)
            )
            / F.lit(100)
        ).alias("cusum_value"),
        (F.abs("cusum_scaled") == F.max(F.abs("cusum_scaled")).over(wall)).alias(
            "is_changepoint"
        ),
    )


# Decay horizon for recency-weighted customer value: weight = e^(-age/τ).
LTV_TAU_DAYS = 365.0


@query(
    "q_decay_ltv",
    oracle=f"""
WITH w AS (
  SELECT o_custkey,
         CAST(o_totalprice AS DECIMAL(20,2))
           * CAST(CASE WHEN abs(EXP(-date_diff('day', CAST(o_orderdate AS DATE),
                                       DATE '{KM_ASOF}') / {LTV_TAU_DAYS})) < 4.5e9 THEN floor((EXP(-date_diff('day', CAST(o_orderdate AS DATE),
                                       DATE '{KM_ASOF}') / {LTV_TAU_DAYS})) * 1e12 + 0.5) / 1e12 ELSE (EXP(-date_diff('day', CAST(o_orderdate AS DATE),
                                       DATE '{KM_ASOF}') / {LTV_TAU_DAYS})) END
                  AS DECIMAL(14,12)) AS contrib,
         CAST(o_totalprice AS DECIMAL(18,2)) AS raw
  FROM orders
)
SELECT o_custkey,
       floor(CAST(CAST(SUM(contrib) AS VARCHAR) AS DOUBLE) * 1e4 + 0.5) / 1e4
         AS decayed_value,
       CAST(CAST(SUM(raw) AS VARCHAR) AS DOUBLE) AS raw_value,
       COUNT(*)                                  AS n_orders
FROM w
GROUP BY 1
""",
)
def q_decay_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted customer value: Σ price·e^(−age/τ) with
    τ = 1 year — the decayed-LTV score that ranks a recently-active
    mid-spender above a long-gone big-spender (the live-value
    counterpart to q_rfm_segments' quintile codes).

    Exactness discipline: the per-row weight e^(−age/τ) is computed
    once in double (same libm input both engines), QUANTIZED to
    DECIMAL(14,12), and multiplied into the DECIMAL price — so the
    per-customer SUM is decimal-exact and order-independent, with the
    single double rounding at the end. Map-side: one projection + one
    groupBy(o_custkey) partial-agg; no windows, no joins."""
    od = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    age = F.datediff(F.lit(KM_ASOF).cast("date"), F.to_date("o_orderdate"))
    weight = F.round(F.exp(-age / F.lit(LTV_TAU_DAYS)), 12).cast("decimal(14,12)")
    w = od.select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * weight).alias("contrib"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("raw"),
    )
    # decimal->double via VARCHAR on the oracle side + the shared
    # floor(x*1e4+0.5)/1e4 quantization on both: DuckDB's native
    # decimal->double cast is one ulp off at ~1e12 sums (magnitude
    # campaign, seed 5401 — 1.2e-4 split, exactly ulp(1e12)).
    return w.groupBy("o_custkey").agg(
        (F.floor(F.sum("contrib").cast("double") * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4))
        .alias("decayed_value"),
        F.sum("raw").cast("double").alias("raw_value"),
        F.count("*").alias("n_orders"),
    )


# Inter-order gap buckets (days): label -> (lo inclusive, hi exclusive).
GAP_BUCKETS = ((0, 7, "00-06d"), (7, 30, "07-29d"), (30, 90, "30-89d"),
               (90, 365, "90-364d"), (365, 100_000, "365d+"))


@query(
    "q_order_gap_distribution",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   LAG(CAST(o_orderdate AS DATE))
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap
  FROM orders
), b AS (
  SELECT CASE WHEN gap < 7 THEN '00-06d'
              WHEN gap < 30 THEN '07-29d'
              WHEN gap < 90 THEN '30-89d'
              WHEN gap < 365 THEN '90-364d'
              ELSE '365d+' END AS bucket,
         gap
  FROM gaps WHERE gap IS NOT NULL
)
SELECT bucket,
       COUNT(*)            AS n_gaps,
       CAST(MIN(gap) AS BIGINT) AS min_gap,
       CAST(MAX(gap) AS BIGINT) AS max_gap,
       CASE WHEN abs(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER ()) < 4.5e9 THEN floor((CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER ()) * 1e6 + 0.5) / 1e6 ELSE (CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER ()) END AS share
FROM b GROUP BY 1
""",
)
def q_order_gap_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap distribution: days between a customer's
    consecutive orders, bucketed into recency bands with counts,
    exact min/max, and global share — the repurchase-cadence readout
    that calibrates q_kaplan_meier's churn threshold (KM_CHURN_DAYS
    should sit past the mass of this distribution) and q_decay_ltv's
    τ.

    Shape: one per-customer window (lag over the customer-partitioned
    order sort — AQE-splittable, never a global sort) feeding a
    |buckets|-row aggregate with map-side partials; the share window
    runs over ≤ 5 rows. Gap math is integer days; only the share is
    a rounded double."""
    od = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = od.select(
        F.datediff(
            F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
        ).alias("gap")
    ).filter(F.col("gap").isNotNull())
    bucket = F.when(F.col("gap") < 7, "00-06d")
    for lo, hi, label in GAP_BUCKETS[1:-1]:
        bucket = bucket.when(F.col("gap") < hi, label)
    bucket = bucket.otherwise("365d+")
    b = gaps.select(bucket.alias("bucket"), "gap")
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_gap"),
        F.max("gap").cast("long").alias("max_gap"),
        floor_quantize(
            F.count("*").cast("double") / F.sum(F.count("*")).over(Window.partitionBy()), 6).alias("share"),
    )
