"""Customer/behavioral insight operators — the classic warehouse
analytics layer a grading/attempt pipeline grows into once the daily
report (main.py:278-289) stops being enough: segmentation, rank
correlation, seasonality. All built-in JVM expressions; the only
shuffles are the per-group aggregations and the per-segment window
sorts.

Scale notes (100 TB discipline):
- RFM scores use NTILE partitioned by market segment, so the window
  sort is per-segment, never a single global sort; at extreme
  cardinality the documented variant is approx_percentile cutoffs
  broadcast back (same output contract, sketch-merge instead of sort).
- Spearman ranks ride per-returnflag window sorts that AQE can split
  on skew; the correlation itself is a single-pass mergeable state.
- Seasonality reduces to |days| rows before any window runs — the
  post-agg frames are calendar-sized, free at any input scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import fan_out, load, scatter_cap
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize

# Pinned "as of" date for recency: just past the fixtures' order-date
# range, so recency is a stable positive day count (P6 determinism
# rule — never current_date in an oracle-checked query).
RFM_ASOF = "2024-02-01"


@query(
    "q_rfm_segments",
    oracle=f"""
WITH base AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '{RFM_ASOF}')
           AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS monetary
  FROM orders
  GROUP BY o_custkey
), scored AS (
  SELECT c_custkey, c_mktsegment, recency_days, frequency, monetary,
         NTILE(5) OVER (PARTITION BY c_mktsegment
                        ORDER BY recency_days ASC, c_custkey)  AS r_score,
         NTILE(5) OVER (PARTITION BY c_mktsegment
                        ORDER BY frequency DESC, c_custkey)    AS f_score,
         NTILE(5) OVER (PARTITION BY c_mktsegment
                        ORDER BY monetary DESC, c_custkey)     AS m_score
  FROM base JOIN customer ON c_custkey = o_custkey
)
SELECT c_custkey, c_mktsegment, recency_days, frequency, monetary,
       r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS rfm
FROM scored
""",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary from
    the order history, quintile-scored WITHIN market segment (NTILE 5,
    ties broken by c_custkey so both engines bucket identically).

    Shape: one groupBy(o_custkey) partial-agg, a join to customer
    (broadcast at fixture scale; key-partitioned at 100 TB), then
    three NTILE windows sharing the c_mktsegment partitioning — the
    per-segment sort is the only O(n log n) step and AQE splits a hot
    segment. Monetary sums go through DECIMAL(18,2) so the aggregate
    is order-independent (registry value discipline)."""
    od = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    base = od.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("date"), F.max(F.to_date("o_orderdate"))
        ).cast("long").alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    seg = Window.partitionBy("c_mktsegment")
    joined = base.join(cust, base.o_custkey == cust.c_custkey)
    return joined.select(
        "c_custkey",
        "c_mktsegment",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(seg.orderBy(F.asc("recency_days"), F.asc("c_custkey")))
        .cast("long")
        .alias("r_score"),
        F.ntile(5)
        .over(seg.orderBy(F.desc("frequency"), F.asc("c_custkey")))
        .cast("long")
        .alias("f_score"),
        F.ntile(5)
        .over(seg.orderBy(F.desc("monetary"), F.asc("c_custkey")))
        .cast("long")
        .alias("m_score"),
    ).withColumn(
        "rfm",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


_RFM_DIMS = (
    # (name, sort-order cell expression SQL, spark cell builder):
    # cells ascend in SCORE order, so score = 1 + #cutoffs strictly
    # below — recency ascends naturally; frequency/monetary score
    # DESC, so their cells are negated.
    ("r", "recency_days"),
    ("f", "-frequency"),
    ("m", "-CAST(FLOOR(monetary) AS BIGINT)"),
)


def _rfm_cuts_sql(dim: str, cell_sql: str) -> str:
    cuts = ",\n         ".join(
        f"MIN(CASE WHEN cm >= ({j} * n + 4) // 5 THEN cell END) AS {dim}c{j}"
        for j in range(1, 5)
    )
    return f"""{dim}h AS (
  SELECT c_mktsegment, {cell_sql} AS cell, COUNT(*) AS c
  FROM joined GROUP BY c_mktsegment, cell
),
{dim}cum AS (
  SELECT c_mktsegment, cell,
         SUM(c) OVER (PARTITION BY c_mktsegment ORDER BY cell
                      ROWS UNBOUNDED PRECEDING) AS cm,
         SUM(c) OVER (PARTITION BY c_mktsegment) AS n
  FROM {dim}h
),
{dim}cuts AS (
  SELECT c_mktsegment,
         {cuts}
  FROM {dim}cum GROUP BY c_mktsegment
)"""


def _rfm_score_sql(dim: str, cell_sql: str) -> str:
    above = "\n           + ".join(
        f"(({cell_sql.replace('recency_days', 'j.recency_days').replace('frequency', 'j.frequency').replace('monetary', 'j.monetary')}) > {dim}c{j})::INT"
        for j in range(1, 5)
    )
    return f"CAST(1 + ({above}) AS BIGINT)"


@query(
    "q_rfm_segments_approx",
    oracle=f"""
WITH base AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '{RFM_ASOF}')
           AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS monetary
  FROM orders
  GROUP BY o_custkey
), joined AS (
  SELECT c_custkey, c_mktsegment, recency_days, frequency, monetary
  FROM base JOIN customer ON c_custkey = o_custkey
),
{_rfm_cuts_sql('r', _RFM_DIMS[0][1])},
{_rfm_cuts_sql('f', _RFM_DIMS[1][1])},
{_rfm_cuts_sql('m', _RFM_DIMS[2][1])}
SELECT j.c_custkey, j.c_mktsegment, j.recency_days, j.frequency, j.monetary,
       {_rfm_score_sql('r', _RFM_DIMS[0][1])} AS r_score,
       {_rfm_score_sql('f', _RFM_DIMS[1][1])} AS f_score,
       {_rfm_score_sql('m', _RFM_DIMS[2][1])} AS m_score
FROM joined j
JOIN rcuts USING (c_mktsegment)
JOIN fcuts USING (c_mktsegment)
JOIN mcuts USING (c_mktsegment)
""",
)
def q_rfm_segments_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_rfm_segments' documented approx-cutoff variant, executable
    (B10's 100 TB swap; G29b/G40b precedents): the three per-segment
    NTILE(5) sorts — each a total order over every customer in a
    segment — are replaced by quintile CUTOFFS derived from COMPACT
    per-segment value histograms (recency in whole days, frequency
    exact counts, monetary in whole dollars), then one map-side
    score-by-comparison against the broadcast 4-cutoff rows. Nothing
    ever sorts the customer set: histogram state is bounded by the
    value domains, not by |customers|, which is the whole point at
    extreme per-segment cardinality.

    Bucket depth error ≤ one cell's mass (customers tied within one
    day / one order / one dollar land in one bucket together instead
    of splitting on the c_custkey tie-break). Like the equi-depth
    precedent, the grid pipeline is integer-deterministic end to end,
    so the DuckDB oracle verifies every score value-for-value — this
    is the approx twin, not a weaker gate."""
    od = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    base = od.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("date"), F.max(F.to_date("o_orderdate"))
        ).cast("long").alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = base.join(cust, base.o_custkey == cust.c_custkey).select(
        "c_custkey", "c_mktsegment", "recency_days", "frequency", "monetary"
    )
    cells = {
        "r": F.col("recency_days"),
        "f": -F.col("frequency"),
        "m": -F.floor("monetary").cast("long"),
    }
    # ONE histogram pass for all three dimensions (was three: each dim
    # re-derived base⋈customer and ran its own agg + two windows + its
    # own broadcast join — 17 exchanges, 4 evaluations of the joined
    # subtree). The three (dim, cell) readings explode map-side from
    # one row, the per-(segment, dim) histogram/cumulative/cutoff
    # algebra is UNCHANGED (same values, per dim), and the three
    # 4-cutoff rows pivot into one per-segment row joined back once.
    trip = joined.select(
        "c_mktsegment",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dim).alias("dim"), cell.cast("long").alias("cell"))
                    for dim, cell in cells.items()
                ]
            )
        ).alias("t"),
    ).select("c_mktsegment", "t.dim", "t.cell")
    hist = trip.groupBy("c_mktsegment", "dim", "cell").agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = (
        Window.partitionBy("c_mktsegment", "dim")
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "c_mktsegment",
        "dim",
        "cell",
        F.sum("c").over(wc).alias("cm"),
        F.sum("c").over(Window.partitionBy("c_mktsegment", "dim")).alias("n"),
    )
    cuts_long = cum.groupBy("c_mktsegment", "dim").agg(
        *[
            F.min(
                F.when(F.col("cm") >= F.expr(f"({j} * n + 4) div 5"), F.col("cell"))
            ).alias(f"c{j}")
            for j in range(1, 5)
        ]
    )
    cuts = (
        cuts_long.groupBy("c_mktsegment")
        .pivot("dim", list(cells))
        .agg(*[F.first(f"c{j}").alias(f"c{j}") for j in range(1, 5)])
    )
    out = joined.join(F.broadcast(cuts), on="c_mktsegment")
    for dim, cell in cells.items():
        score = F.lit(1) + sum(
            (cell.cast("long") > F.col(f"{dim}_c{j}")).cast("int") for j in range(1, 5)
        )
        out = out.withColumn(f"{dim}_score", score.cast("long"))
    return out.select(
        "c_custkey", "c_mktsegment", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )


@query(
    "q_spearman_corr",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag,
         CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           AS DECIMAL(19,0)) AS qty_rank,
         CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           AS DECIMAL(19,0)) AS price_rank
  FROM lineitem
), m AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS k,
         CAST(sum(qty_rank) AS DOUBLE) AS sx,
         CAST(sum(price_rank) AS DOUBLE) AS sy,
         CAST(sum(qty_rank * price_rank) AS DOUBLE) AS sxy,
         CAST(sum(qty_rank * qty_rank) AS DOUBLE) AS sxx,
         CAST(sum(price_rank * price_rank) AS DOUBLE) AS syy,
         COUNT(*) AS n
  FROM ranked GROUP BY l_returnflag
)
SELECT l_returnflag,
       CASE WHEN abs(r) < 4.5e9 THEN floor(r * 1e6 + 0.5) / 1e6 ELSE r END
         AS spearman,
       n
FROM (
  SELECT l_returnflag, n,
         CASE WHEN (k * sxx - sx * sx) * (k * syy - sy * sy) > 0
              THEN (k * sxy - sx * sy)
                   / sqrt((k * sxx - sx * sx) * (k * syy - sy * sy))
              ELSE NULL END AS r
  FROM m) t
""",
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per group: monotonic-association
    probe that Pearson corr (q_stats_agg) misses. RANK() gives tied
    values identical ranks in both engines (no tie-break needed —
    determinism comes from rank semantics, not ordering), then one
    Pearson corr over the rank pairs.

    Both rank windows share the l_returnflag partitioning, so one
    shuffle + two local sorts. The correlation is spelled as EXPLICIT
    moment sums accumulated in DECIMAL (ranks are integers, so the
    five sums are exact — no accumulation-order sensitivity at any
    merge fan-in), then ONE identical IEEE double expression tree on
    both engines (the q_autocorr_daily discipline; previously this
    query used Spark covar_pop/stddev_pop against DuckDB's Welford
    corr — mathematically equal but a different FP path, which can
    flip the last displayed digit at a quantize boundary). The
    zero-variance guard (constant rank column) is the same CASE
    predicate on both sides. Rounded to 6 dp."""
    li = load(
        spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    byflag = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        F.rank().over(byflag.orderBy("l_quantity")).cast("decimal(19,0)").alias("qty_rank"),
        F.rank().over(byflag.orderBy("l_extendedprice")).cast("decimal(19,0)").alias("price_rank"),
    )
    x, y = F.col("qty_rank"), F.col("price_rank")
    m = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.count("*").alias("n"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    denprod = (k * sxx - sx * sx) * (k * syy - sy * sy)
    r = F.when(denprod > F.lit(0.0), (k * sxy - sx * sy) / F.sqrt(denprod))
    return m.select(
        "l_returnflag", floor_quantize(r, 6).alias("spearman"), F.col("n")
    )


@query(
    "q_seasonality_dow",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS revenue
  FROM orders
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(revenue) AS DECIMAL(38,2)) AS all_rev,
         COUNT(*) AS all_days
  FROM daily
)
SELECT EXTRACT(dow FROM d) AS dow,
       COUNT(*) AS n_days,
       CAST(SUM(revenue) AS DOUBLE) AS dow_revenue,
       CASE WHEN abs((CAST(SUM(revenue) AS DOUBLE) / COUNT(*))
             / (CAST(MAX(all_rev) AS DOUBLE) / MAX(all_days))) < 4.5e9 THEN floor(((CAST(SUM(revenue) AS DOUBLE) / COUNT(*))
             / (CAST(MAX(all_rev) AS DOUBLE) / MAX(all_days))) * 1e6 + 0.5) / 1e6 ELSE ((CAST(SUM(revenue) AS DOUBLE) / COUNT(*))
             / (CAST(MAX(all_rev) AS DOUBLE) / MAX(all_days))) END
         AS seasonal_index
FROM daily CROSS JOIN tot
GROUP BY 1
""",
)
def q_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: mean daily revenue per weekday
    over the global mean daily revenue (index 1.0 = flat week). DOW
    pinned to DuckDB's Sunday=0 (q_datetime_funcs convention).

    Shape: orders collapse to |days| rows first (one partial-agg
    shuffle); the totals frame is ONE row carried by a broadcast-able
    cross join, and the final 7-row agg is free. All sums ride
    DECIMAL so both engines see bit-identical numerators; the single
    double division happens once per output row, rounded to 6 dp."""
    od = load(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    daily = od.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("revenue")
    )
    tot = daily.agg(
        F.sum("revenue").cast("decimal(38,2)").alias("all_rev"),
        F.count("*").alias("all_days"),
    )
    return (
        daily.crossJoin(F.broadcast(tot))
        .groupBy((F.dayofweek("d") - 1).cast("long").alias("dow"))
        .agg(
            F.count("*").alias("n_days"),
            F.sum("revenue").cast("double").alias("dow_revenue"),
            floor_quantize(
                (F.sum("revenue").cast("double") / F.count("*"))
                / (F.max("all_rev").cast("double") / F.max("all_days")), 6).alias("seasonal_index"),
        )
    )


@query(
    "q_ks_test",
    oracle="""
WITH tagged AS (
  SELECT l_extendedprice AS v,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
  FROM lineitem
  WHERE l_returnflag IN ('R', 'N')
), tot AS (
  SELECT CAST(SUM(g1) AS BIGINT) AS n1,
         CAST(SUM(1 - g1) AS BIGINT) AS n2
  FROM tagged
), ecdf AS (
  SELECT SUM(g1)     OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS c1,
         SUM(1 - g1) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS c2
  FROM tagged
)
SELECT MAX(n1) AS n1, MAX(n2) AS n2,
       CASE WHEN abs(MAX(ABS(CAST(c1 AS DOUBLE) / n1
                     - CAST(c2 AS DOUBLE) / n2))) < 4.5e9 THEN floor((MAX(ABS(CAST(c1 AS DOUBLE) / n1
                     - CAST(c2 AS DOUBLE) / n2))) * 1e6 + 0.5) / 1e6 ELSE (MAX(ABS(CAST(c1 AS DOUBLE) / n1
                     - CAST(c2 AS DOUBLE) / n2))) END AS d_stat
FROM ecdf CROSS JOIN tot
""",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: max ECDF gap between
    returned ('R') and non-returned ('N') line-item prices — the
    nonparametric distribution-shift test next to q_psi_drift's
    binned one.

    Ties are handled by a RANGE (value-based) frame, so every row at
    the same price sees the same cumulative counts in both engines —
    determinism from frame semantics, not tie-breaks. Per-row ECDF
    values are exact-integer divisions (bit-identical IEEE), so only
    the final max is rounded. The global ORDER BY v window is the
    scale limit; the documented 100 TB variant computes the gap on an
    approx_percentile grid (sketch-merge, no global sort)."""
    li = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    tagged = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.col("l_extendedprice").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g1"),
    )
    tot = tagged.agg(
        F.sum("g1").alias("n1"), F.sum(F.lit(1) - F.col("g1")).alias("n2")
    )
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = tagged.select(
        F.sum("g1").over(w).alias("c1"),
        F.sum(F.lit(1) - F.col("g1")).over(w).alias("c2"),
    )
    return ecdf.crossJoin(F.broadcast(tot)).agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        floor_quantize(
            # try_divide: an empty side (all rows in one sample at
            # tiny n) has no ECDF — D is NULL, as in the oracle
            F.max(
                F.abs(
                    F.try_divide(F.col("c1").cast("double"), F.col("n1"))
                    - F.try_divide(F.col("c2").cast("double"), F.col("n2"))
                )
            ), 6).alias("d_stat"),
    )


@query(
    "q_benford",
    oracle="""
WITH digits AS (
  SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                             AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), counted AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
)
SELECT digit, n,
       CASE WHEN abs(CAST(n AS DOUBLE)
             / SUM(n) OVER ()) < 4.5e9 THEN floor((CAST(n AS DOUBLE)
             / SUM(n) OVER ()) * 1e6 + 0.5) / 1e6 ELSE (CAST(n AS DOUBLE)
             / SUM(n) OVER ()) END                       AS observed_share,
       CASE WHEN abs(log10(1.0 + 1.0 / digit)) < 4.5e9 THEN floor((log10(1.0 + 1.0 / digit)) * 1e6 + 0.5) / 1e6 ELSE (log10(1.0 + 1.0 / digit)) END               AS benford_share,
       CASE WHEN abs(POWER(CAST(n AS DOUBLE) / SUM(n) OVER ()
                   - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit)
             * SUM(n) OVER ()) < 4.5e9 THEN floor((POWER(CAST(n AS DOUBLE) / SUM(n) OVER ()
                   - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit)
             * SUM(n) OVER ()) * 1e4 + 0.5) / 1e4 ELSE (POWER(CAST(n AS DOUBLE) / SUM(n) OVER ()
                   - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit)
             * SUM(n) OVER ()) END                       AS chi2_term
FROM counted
""",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals: observed vs
    theoretical log10(1 + 1/d) share plus the per-digit chi-square
    contribution — the classic synthetic-data / fraud smell test.

    The first significant digit is extracted via exact integer cents
    (round(x*100) as BIGINT → first char), never log10-of-value, so
    boundary amounts like 1000.00 can't flip digits between engines.
    One partial-agg shuffle to 9 rows; the share windows run over the
    9-row table (free). log10 terms are libm on identical literals —
    rounded to 6/4 dp per the BM25 precedent."""
    od = load(spark, sf_dir, "orders", columns=["o_totalprice"])
    digit = (
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    counted = od.select(digit).groupBy("digit").agg(F.count("*").alias("n"))
    wall = Window.partitionBy()
    share = F.col("n").cast("double") / F.sum("n").over(wall)
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counted.select(
        "digit",
        "n",
        floor_quantize(share, 6).alias("observed_share"),
        floor_quantize(benford, 6).alias("benford_share"),
        floor_quantize(F.pow(share - benford, 2) / benford * F.sum("n").over(wall), 4).alias(
            "chi2_term"
        ),
    )


@query(
    "q_ab_test",
    oracle="""
WITH assigned AS (
  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS converted
  FROM events
), cells AS (
  SELECT COUNT(CASE WHEN variant = 'A' THEN 1 END)                   AS n_a,
         COUNT(CASE WHEN variant = 'B' THEN 1 END)                   AS n_b,
         COUNT(CASE WHEN variant = 'A' AND converted = 1 THEN 1 END) AS conv_a,
         COUNT(CASE WHEN variant = 'B' AND converted = 1 THEN 1 END) AS conv_b
  FROM assigned
)
SELECT n_a, n_b, conv_a, conv_b,
       CASE WHEN abs(CAST(conv_a AS DOUBLE) / n_a) < 4.5e9 THEN floor((CAST(conv_a AS DOUBLE) / n_a) * 1e6 + 0.5) / 1e6 ELSE (CAST(conv_a AS DOUBLE) / n_a) END AS rate_a,
       CASE WHEN abs(CAST(conv_b AS DOUBLE) / n_b) < 4.5e9 THEN floor((CAST(conv_b AS DOUBLE) / n_b) * 1e6 + 0.5) / 1e6 ELSE (CAST(conv_b AS DOUBLE) / n_b) END AS rate_b,
       CASE WHEN abs((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))) < 4.5e9 THEN floor(((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))) * 1e4 + 0.5) / 1e4 ELSE ((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))) END AS z_stat
FROM cells
""",
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic md5 hash split
    (~50/50 on the first hex nibble, the q_sample_hash scheme): did
    variant A convert (event_type='purchase') at a different rate
    than B? The experiment-analysis primitive.

    Everything up to the final formula is exact integer conditional
    counts in ONE global aggregate (map-side partials, no shuffle of
    rows, no groupBy — a single 4-counter state). The z formula runs
    once on the driver-side 1-row frame from identical integers, so
    division/sqrt are bit-identical IEEE on both engines; rounded to
    4 dp."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_type"])
    assigned = ev.select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        )
        .otherwise("B")
        .alias("variant"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("converted"),
    )
    # COUNT (not SUM-of-0/1): zero events must yield ZERO cells like
    # the oracle's COUNT(CASE ...), not SUM's NULL; the rate/z math
    # then try_divides so the empty experiment emits NULLs instead of
    # the ANSI /0 throw (empty fuzz shape).
    cells = assigned.agg(
        F.count(F.when(F.col("variant") == "A", 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == "B", 1)).alias("n_b"),
        F.count(F.when((F.col("variant") == "A") & (F.col("converted") == 1), 1)).alias(
            "conv_a"
        ),
        F.count(F.when((F.col("variant") == "B") & (F.col("converted") == 1), 1)).alias(
            "conv_b"
        ),
    )
    rate_a = F.try_divide(F.col("conv_a").cast("double"), F.col("n_a"))
    rate_b = F.try_divide(F.col("conv_b").cast("double"), F.col("n_b"))
    pooled = F.try_divide(
        (F.col("conv_a") + F.col("conv_b")).cast("double"),
        F.col("n_a") + F.col("n_b"),
    )
    return cells.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        floor_quantize(rate_a, 6).alias("rate_a"),
        floor_quantize(rate_b, 6).alias("rate_b"),
        floor_quantize(
            F.try_divide(
                rate_a - rate_b,
                F.sqrt(
                    pooled
                    * (F.lit(1.0) - pooled)
                    * (
                        F.try_divide(F.lit(1.0), F.col("n_a"))
                        + F.try_divide(F.lit(1.0), F.col("n_b"))
                    )
                ),
            ), 4).alias("z_stat"),
    )


@query(
    "q_audience_overlap",
    oracle="""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
), sizes AS (
  SELECT event_type, COUNT(*) AS n FROM du GROUP BY event_type
), inter AS (
  SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_inter
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT t1, t2, n_inter,
       s1.n AS n1, s2.n AS n2,
       CASE WHEN abs(CAST(n_inter AS DOUBLE) / (s1.n + s2.n - n_inter)) < 4.5e9 THEN floor((CAST(n_inter AS DOUBLE) / (s1.n + s2.n - n_inter)) * 1e6 + 0.5) / 1e6 ELSE (CAST(n_inter AS DOUBLE) / (s1.n + s2.n - n_inter)) END AS jaccard
FROM inter
JOIN sizes s1 ON s1.event_type = t1
JOIN sizes s2 ON s2.event_type = t2
""",
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap: Jaccard similarity of USER SETS
    between every pair of event types — the segment-overlap question
    (how much do viewers and buyers coincide?). Same set-similarity
    algebra as the document near-dup family, on the behavioral axis.

    The key move is distinct-first: |types|×|users| rows reduce
    BEFORE the self-join, and the join is keyed on user_id (shuffle
    co-location), so intersections are join-hit counts — never a
    cartesian of users. Output is |types|²-sized. Exact integers
    until the one rounded division."""
    du = (
        load(spark, sf_dir, "events", columns=["event_type", "user_id"])
        .distinct()
    )
    sizes = du.groupBy("event_type").agg(F.count("*").alias("n"))
    a = du.select(F.col("event_type").alias("t1"), "user_id")
    b = du.select(F.col("event_type").alias("t2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    s1 = sizes.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2), "t2")
        .select(
            "t1", "t2", "n_inter", "n1", "n2",
            floor_quantize(
                F.col("n_inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_inter")), 6).alias("jaccard"),
        )
    )


@query(
    "q_anomaly_dow",
    oracle="""
WITH daily AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
         EXTRACT(dow FROM CAST(o_orderdate AS DATE)) AS dow,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1, 2
), stats AS (
  SELECT dow, AVG(revenue) AS mu, stddev_samp(revenue) AS sigma
  FROM daily GROUP BY dow
)
SELECT d, daily.dow, revenue,
       CASE WHEN abs((revenue - mu) / sigma) < 4.5e9 THEN floor(((revenue - mu) / sigma) * 1e4 + 0.5) / 1e4 ELSE ((revenue - mu) / sigma) END AS z
FROM daily JOIN stats USING (dow)
WHERE ABS(CASE WHEN abs((revenue - mu) / sigma) < 4.5e9 THEN floor(((revenue - mu) / sigma) * 1e4 + 0.5) / 1e4 ELSE ((revenue - mu) / sigma) END) > 1.5
""",
)
def q_anomaly_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted daily-revenue anomalies: each day is
    z-scored against ITS WEEKDAY's distribution, so a quiet Sunday
    isn't flagged just for being a Sunday (the time-series upgrade of
    q_zscore_outliers' static groups). Input collapses to |days| rows
    before any statistics; the per-DOW stats frame is 7 rows,
    broadcast back. The filter compares the ROUNDED z on both engines
    (boundary-row discipline); daily revenues themselves are
    DECIMAL-exact doubles."""
    od = load(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    daily = od.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("d"),
        (F.dayofweek(F.to_date("o_orderdate")) - 1).cast("long").alias("dow"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue")
    )
    stats = daily.groupBy("dow").agg(
        F.avg("revenue").alias("mu"), F.stddev_samp("revenue").alias("sigma")
    )
    z = floor_quantize((F.col("revenue") - F.col("mu")) / F.col("sigma"), 4)
    return (
        daily.join(F.broadcast(stats), "dow")
        .select("d", "dow", "revenue", z.alias("z"))
        .filter(F.abs(F.col("z")) > 1.5)
    )


# ---------------------------------------------------------------------------
# q_skyline_parts — Pareto frontier (skyline) via sorted running max
# ---------------------------------------------------------------------------


@query(
    "q_skyline_parts",
    oracle="""
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
""",
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): parts not dominated on
    (p_retailprice min, p_size max) — the multi-criteria shortlist
    query (Borzsony/Kossmann/Stocker, ICDE 2001 is public). The naive
    form is the oracle's quadratic NOT-EXISTS self-join; here it
    collapses to sort-order algebra:

    * per-price aggregate: smax = max(size) within each price — any
      same-price row below smax is dominated locally;
    * one running max of smax over the DISTINCT-price frame in
      ascending price order (rows frame, so "strictly cheaper" is
      exact even with duplicate prices) — a row is dominated by a
      cheaper one iff that running max reaches its size;
    * join the verdict back on price.

    Cost: one groupBy(price) whose output is distinct-price-sized,
    one window over THAT frame, one shuffle join back. At extreme
    price cardinality the single-partition window over distinct
    prices becomes the bottleneck; the documented scale path is
    range-partitioning by price, per-partition skylines, then the
    running max of the partition maxima broadcast as prefix offsets —
    same algebra, two levels (the q_sample_stratified two-phase
    pattern applied to a prefix scan)."""
    parts = load(spark, sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_size"])
    g = parts.groupBy("p_retailprice").agg(F.max("p_size").alias("smax"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    g = g.withColumn("runmax", F.max("smax").over(w))
    return (
        parts.join(g, "p_retailprice")
        .filter(
            (F.col("runmax").isNull() | (F.col("runmax") < F.col("p_size")))
            & (F.col("p_size") == F.col("smax"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# B18 — power-user curve (activity-depth distribution)
# ---------------------------------------------------------------------------


@query(
    "q_power_user_curve",
    oracle="""
WITH depth AS (
  SELECT user_id, COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
  FROM events GROUP BY user_id
)
SELECT CAST(active_days AS BIGINT) AS active_days,
       CAST(COUNT(*) AS BIGINT)    AS n_users,
       CASE WHEN abs(CAST(SUM(COUNT(*)) OVER (
         ORDER BY active_days DESC ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / SUM(COUNT(*)) OVER ()) < 4.5e9 THEN floor((CAST(SUM(COUNT(*)) OVER (
         ORDER BY active_days DESC ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / SUM(COUNT(*)) OVER ()) * 1e6 + 0.5) / 1e6 ELSE (CAST(SUM(COUNT(*)) OVER (
         ORDER BY active_days DESC ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / SUM(COUNT(*)) OVER ()) END AS frac_at_least
FROM depth GROUP BY active_days
""",
)
def q_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user curve: distribution of per-user active-day counts
    with the 'fraction of users at least this active' running share —
    the engagement-depth histogram (L30/L7 curves in product
    analytics) that separates a habit product from a drive-by one.
    Per-user distinct-day agg (one shuffle), then all windows run over
    the ≤|calendar| distinct-depth rows — free at any event volume."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts"])
    depth = ev.groupBy("user_id").agg(
        F.countDistinct(F.to_date("ts")).alias("active_days")
    )
    per = depth.groupBy("active_days").agg(F.count(F.lit(1)).alias("n_users"))
    w_cum = Window.orderBy(F.col("active_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    return per.select(
        F.col("active_days").cast("long").alias("active_days"),
        "n_users",
        floor_quantize(
            F.sum("n_users").over(w_cum).cast("double") / F.sum("n_users").over(w_all), 6).alias("frac_at_least"),
    )


# ---------------------------------------------------------------------------
# G39 — market-basket brand affinity (support + lift)
# ---------------------------------------------------------------------------

AFFINITY_MIN_ORDERS = 50


@query(
    "q_brand_affinity",
    oracle=f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM ob),
brand_n AS (SELECT p_brand, COUNT(*) AS n_b FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_both
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b,
       CAST(n_both AS BIGINT) AS n_both,
       CASE WHEN abs(CAST(n_both AS DOUBLE) * n_orders.n
             / (na.n_b * nb.n_b)) < 4.5e9 THEN floor((CAST(n_both AS DOUBLE) * n_orders.n
             / (na.n_b * nb.n_b)) * 1e6 + 0.5) / 1e6 ELSE (CAST(n_both AS DOUBLE) * n_orders.n
             / (na.n_b * nb.n_b)) END AS lift
FROM pairs
JOIN brand_n na ON na.p_brand = brand_a
JOIN brand_n nb ON nb.p_brand = brand_b
CROSS JOIN n_orders
WHERE n_both >= {AFFINITY_MIN_ORDERS}
""",
)
def q_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: brand pairs co-occurring in the same
    order, with lift = P(a,b)/(P(a)·P(b)) — the association-rule
    primitive behind 'bought together' and assortment planning
    (Agrawal/Srikant's support-confidence framing is public).

    Plan shape: ONE shuffle builds the per-order brand BASKET
    (groupBy l_orderkey, collect_set, sorted), and the i<j pair
    enumeration is a map-side array expression over each basket —
    Σ C(brands-per-order, 2) rows, basket-size-bounded, never
    brands² × orders, never a self-join (the previous rendition
    equi-self-joined the order-brand frame, re-shuffling it for each
    side AND for the marginals; baskets serve all three consumers
    from the same exchange). Brand marginals and the order total
    broadcast back onto the ≤ C(25,2)-row pair table. A support
    floor ({AFFINITY_MIN_ORDERS} co-orders) keeps noise pairs out,
    the same reason the PMI operator floors its counts."""
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_brand"])
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
        # three consumers (total, marginals, pairs): without this,
        # column pruning specializes each subtree past ReusedExchange
        # and the scan+join+groupBy runs three times
        .persist()
    )
    n_orders = baskets.select(F.count(F.lit(1)).alias("n"))
    brand_n = baskets.select(F.explode("brands").alias("p_brand")).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_b")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("brands"),
            lambda x, i: F.transform(
                F.slice(F.col("brands"), i + 2, F.size(F.col("brands"))),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= AFFINITY_MIN_ORDERS)
    )
    na = brand_n.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("na"))
    nb = brand_n.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("nb"))
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            floor_quantize(
                F.col("n_both").cast("double") * F.col("n") / (F.col("na") * F.col("nb")), 6).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# B19 — new vs returning daily actives
# ---------------------------------------------------------------------------


@query(
    "q_new_vs_returning",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
),
daily AS (
  SELECT DISTINCT CAST(e.ts AS DATE) AS day, e.user_id, f.first_day
  FROM events e JOIN f ON f.user_id = e.user_id
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(COUNT(CASE WHEN first_day = day THEN 1 END) AS BIGINT) AS n_new,
       CAST(COUNT(CASE WHEN first_day < day THEN 1 END) AS BIGINT) AS n_returning,
       CASE WHEN abs(CAST(COUNT(CASE WHEN first_day < day THEN 1 END) AS DOUBLE)
             / COUNT(*)) < 4.5e9 THEN floor((CAST(COUNT(CASE WHEN first_day < day THEN 1 END) AS DOUBLE)
             / COUNT(*)) * 1e6 + 0.5) / 1e6 ELSE (CAST(COUNT(CASE WHEN first_day < day THEN 1 END) AS DOUBLE)
             / COUNT(*)) END AS returning_share
FROM daily GROUP BY day
""",
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives split into first-time vs returning users with the
    returning share — the growth-accounting decomposition every DAU
    chart hides (flat DAU can be healthy retention or a churn-for-
    acquisition treadmill; this tells them apart). The (day, user)
    grid collapses first (the q_active_users discipline), the
    first-seen frame is user-keyed and narrow, and the final agg is
    calendar-sized."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts"])
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    daily = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .join(f, "user_id")
    )
    return daily.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.when(F.col("first_day") == F.col("day"), 1)).alias("n_new"),
        F.count(F.when(F.col("first_day") < F.col("day"), 1)).alias("n_returning"),
        floor_quantize(
            F.count(F.when(F.col("first_day") < F.col("day"), 1)).cast("double")
            / F.count(F.lit(1)), 6).alias("returning_share"),
    )


# ---------------------------------------------------------------------------
# G40 — revenue decile concentration
# ---------------------------------------------------------------------------


@query(
    "q_revenue_deciles",
    oracle="""
WITH t AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile
  FROM orders
),
d AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM t GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile, n_orders,
       CAST(revenue AS DOUBLE) AS revenue,
       CASE WHEN abs(CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER () AS DOUBLE)) < 4.5e9 THEN floor((CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER () AS DOUBLE)) * 1e6 + 0.5) / 1e6 ELSE (CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER () AS DOUBLE)) END AS revenue_share
FROM d
""",
)
def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by decile: orders ranked by value into
    NTILE(10), each decile's revenue and share of total — the
    'top 10% of orders is X% of revenue' readout that G19's Gini
    compresses into one number, kept here as the full curve a pricing
    team actually reads. NTILE over a (value, key) TOTAL order is
    deterministic and engine-identical — without the key tie-break,
    equal-value rows straddling a decile boundary would make the
    split engine-dependent. The global sort is the cost; at extreme
    scale the documented swap is fixed-grid histogram decile cutoffs +
    map-side bucketing (q_revenue_deciles_approx: no row sort, bounded
    sketch state), same output contract."""
    od = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    w = Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    d = (
        od.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
        )
    )
    return d.select(
        F.col("decile").cast("long").alias("decile"),
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
        floor_quantize(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(Window.partitionBy()).cast("double"), 6).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# G43 — ABC classification (cumulative revenue share classes)
# ---------------------------------------------------------------------------


@query(
    "q_abc_classification",
    oracle="""
WITH pr AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, revenue,
         SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
         SUM(revenue) OVER () AS total_rev
  FROM pr
),
classed AS (
  SELECT CASE WHEN CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) <= 0.8 THEN 'A'
              WHEN CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class,
         revenue
  FROM ranked
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(revenue) AS DOUBLE) AS revenue,
       CASE WHEN abs(CAST(SUM(revenue) AS DOUBLE)
             / CAST(SUM(SUM(revenue)) OVER () AS DOUBLE)) < 4.5e9 THEN floor((CAST(SUM(revenue) AS DOUBLE)
             / CAST(SUM(SUM(revenue)) OVER () AS DOUBLE)) * 1e6 + 0.5) / 1e6 ELSE (CAST(SUM(revenue) AS DOUBLE)
             / CAST(SUM(SUM(revenue)) OVER () AS DOUBLE)) END AS revenue_share
FROM classed GROUP BY abc_class
""",
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, classed
    A/B/C at 80%/95% cumulative share — the Pareto workhorse of
    assortment and stocking policy (G40's decile curve with the
    standard industry cut points and per-class rollup). Revenue and
    the running cumulative stay DECIMAL end-to-end (the A/B boundary
    is a comparison on an exact cumulative, so class membership is
    engine-identical; only the emitted share is a rounded double);
    the rank window runs over the |parts|-sized revenue table, not
    lineitems, and the per-key tie-break makes the cumulative a total
    order. At extreme part cardinality the documented swap is the
    same two-phase salted ranking as q_sample_stratified."""
    li = load(spark, sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("revenue")
    )
    w_cum = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    share = F.col("cum_rev").cast("double") / F.col("total_rev").cast("double")
    classed = pr.select(
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum_rev"),
        F.sum("revenue").over(w_all).alias("total_rev"),
    ).select(
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias("abc_class"),
        "revenue",
    )
    agg = classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("revenue").alias("rev_dec"),
    )
    return agg.select(
        "abc_class",
        "n_parts",
        F.col("rev_dec").cast("double").alias("revenue"),
        floor_quantize(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(Window.partitionBy()).cast("double"), 6).alias("revenue_share"),
    )


@query(
    "q_topn_with_other",
    oracle="""
WITH per_cust AS (
  SELECT c_mktsegment, o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY rev DESC, o_custkey) AS rk
  FROM per_cust
)
SELECT c_mktsegment,
       CASE WHEN rk <= 5 THEN CAST(o_custkey AS VARCHAR) ELSE 'OTHER' END
         AS entity,
       CAST(SUM(rev) AS DOUBLE) AS revenue,
       COUNT(*)                 AS n_customers
FROM ranked
GROUP BY 1, 2
""",
)
def q_topn_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers per market segment by lifetime order value,
    with everyone else rolled into one 'OTHER' row per segment — the
    standard executive-report shape (named leaders + a remainder that
    keeps the segment total honest). Deterministic rank tie-break on
    custkey; revenue through DECIMAL sums so the rollup is
    order-independent.

    Shape: fact → per-(segment, customer) partial-agg (the one real
    shuffle) → per-segment rank window on the customer-sized frame →
    a second tiny aggregate (≤ 6 rows per segment). The rank window
    sorts per segment, never globally; at extreme per-segment
    cardinality the documented swap is a two-phase top-k (per-salt
    leaders merged, remainder = segment total − leaders) with the
    same output contract."""
    od = load(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    per_cust = (
        od.join(F.broadcast(cust), od.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    rk = F.row_number().over(
        Window.partitionBy("c_mktsegment").orderBy(F.desc("rev"), F.asc("o_custkey"))
    )
    ranked = per_cust.withColumn("rk", rk)
    entity = F.when(F.col("rk") <= 5, F.col("o_custkey").cast("string")).otherwise("OTHER")
    return (
        ranked.groupBy("c_mktsegment", entity.alias("entity"))
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count("*").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# q_did_lift — difference-in-differences lift estimate
# ---------------------------------------------------------------------------


@query(
    "q_did_lift",
    oracle="""
WITH assigned AS (
  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'treat' ELSE 'control' END AS grp,
         CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'pre' ELSE 'post' END AS period,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL
),
cells AS (
  SELECT grp, period,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE) / count(*) AS mean_v
  FROM assigned GROUP BY 1, 2
),
wide AS (
  SELECT
    max(CASE WHEN grp = 'treat'   AND period = 'pre'  THEN mean_v END) AS treat_pre,
    max(CASE WHEN grp = 'treat'   AND period = 'post' THEN mean_v END) AS treat_post,
    max(CASE WHEN grp = 'control' AND period = 'pre'  THEN mean_v END) AS control_pre,
    max(CASE WHEN grp = 'control' AND period = 'post' THEN mean_v END) AS control_post,
    CAST(sum(n) AS BIGINT) AS n_events
  FROM cells
)
SELECT CASE WHEN abs(treat_pre) < 4.5e9 THEN floor((treat_pre) * 1e6 + 0.5) / 1e6 ELSE (treat_pre) END AS treat_pre,
       CASE WHEN abs(treat_post) < 4.5e9 THEN floor((treat_post) * 1e6 + 0.5) / 1e6 ELSE (treat_post) END AS treat_post,
       CASE WHEN abs(control_pre) < 4.5e9 THEN floor((control_pre) * 1e6 + 0.5) / 1e6 ELSE (control_pre) END AS control_pre,
       CASE WHEN abs(control_post) < 4.5e9 THEN floor((control_post) * 1e6 + 0.5) / 1e6 ELSE (control_post) END AS control_post,
       CASE WHEN abs((treat_post - treat_pre) - (control_post - control_pre)) < 4.5e9 THEN floor(((treat_post - treat_pre) - (control_post - control_pre)) * 1e6 + 0.5) / 1e6 ELSE ((treat_post - treat_pre) - (control_post - control_pre)) END AS did_lift,
       n_events
FROM wide
""",
)
def q_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences lift: the causal-inference workhorse
    for launches without a clean holdout — compare the treated
    group's pre→post change against the control group's, so shared
    time trends cancel. Treatment assignment is the deterministic
    md5 hash split (q_ab_test's scheme), the period cut a pinned
    date; the 2×2 cell means go through DECIMAL sums (order-exact)
    with ONE double division per cell, and the DiD arithmetic runs
    on the unrounded doubles in identical op order both engines.

    Scale shape: one corpus pass → 4-cell partial aggregate →
    constant-size pivot; nothing downstream of the scan is larger
    than 4 rows at any input size."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts", "value"]).filter(
        F.col("value").isNotNull()
    )
    assigned = ev.select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "treat"
        ).otherwise("control").alias("grp"),
        F.when(F.to_date("ts") < F.lit("2024-01-16").cast("date"), "pre")
        .otherwise("post")
        .alias("period"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    cells = assigned.groupBy("grp", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_v"),
    )

    def cell(g: str, p: str):
        return F.max(F.when((F.col("grp") == g) & (F.col("period") == p), F.col("mean_v")))

    wide = cells.agg(
        cell("treat", "pre").alias("tp"),
        cell("treat", "post").alias("tq"),
        cell("control", "pre").alias("cp"),
        cell("control", "post").alias("cq"),
        F.sum("n").cast("long").alias("n_events"),
    )
    return wide.select(
        floor_quantize("tp", 6).alias("treat_pre"),
        floor_quantize("tq", 6).alias("treat_post"),
        floor_quantize("cp", 6).alias("control_pre"),
        floor_quantize("cq", 6).alias("control_post"),
        floor_quantize((F.col("tq") - F.col("tp")) - (F.col("cq") - F.col("cp")), 6).alias("did_lift"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# q_yoy_revenue — year-over-year revenue growth per nation (G52)
# ---------------------------------------------------------------------------


@query(
    "q_yoy_revenue",
    oracle="""
WITH rev AS (
  SELECT n_name,
         CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, o_year,
       -- decimal->double via VARCHAR: the native cast is one ulp off
       -- at ~1e14 revenues (magnitude seed 5401); growth quantized
       -- with the shared floor spelling on both engines.
       CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(LAG(revenue) OVER (PARTITION BY n_name ORDER BY o_year) AS VARCHAR) AS DOUBLE)
         AS prev_revenue,
       floor(
         (CAST(CAST(revenue AS VARCHAR) AS DOUBLE)
           / CAST(CAST(LAG(revenue) OVER (PARTITION BY n_name ORDER BY o_year) AS VARCHAR) AS DOUBLE)
           - 1.0) * 1e4 + 0.5) / 1e4 AS yoy_growth
FROM rev
""",
)
def q_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the growth-
    accounting readout next to G21's within-series trend slope.

    Plan shape: the fact spine (lineitem⋈orders) carries only the
    revenue columns plus the year; customer and nation ride
    broadcasts. The input collapses to |nations|×|years| rows in ONE
    partial-aggregated shuffle before the lag window touches it, so
    the window sort is free at any fact scale. Revenue accumulates in
    DECIMAL (order-independent, bit-equal cross-engine); the growth
    ratio is one float division of identical decimals, rounded 4 dp.
    First year per nation reports NULL growth (no prior), matching
    SQL LAG semantics."""
    # fan_out: the fact-spine join and the per-row decimal revenue
    # products otherwise run on the one-row-group scan's 1-3 tasks;
    # no-op at scale.
    li = fan_out(
        load(
            spark, sf_dir, "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        ),
        max_bytes=scatter_cap(),
    )
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nat = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    dec = "decimal(18,2)"
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(dec) * (F.lit(1) - F.col("l_discount").cast(dec))
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    prev = F.lag("revenue").over(w)
    growth = F.col("revenue").cast("double") / prev.cast("double") - 1.0
    return rev.select(
        "n_name",
        "o_year",
        F.col("revenue").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        (F.floor(growth * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias("yoy_growth"),
    )


# ---------------------------------------------------------------------------
# q_power_analysis — sample size for the next A/B test (G58)
# ---------------------------------------------------------------------------


@query(
    "q_power_analysis",
    oracle="""
WITH base AS (
  SELECT CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) / COUNT(*) AS p
  FROM events
),
grid AS (SELECT unnest([0.01, 0.02, 0.05]) AS mde),
calc AS (
  SELECT mde, p,
         p + mde AS p2,
         (p + p + mde) / 2 AS pbar
  FROM base CROSS JOIN grid
)
SELECT CASE WHEN abs(p) < 4.5e9 THEN floor((p) * 1e6 + 0.5) / 1e6 ELSE (p) END AS baseline_rate,
       mde,
       -- p + mde > 1: the lift is unobservable (baseline already at or
       -- past 100% - mde) => NULL sample size. Without the guard the
       -- variance term goes negative and DuckDB's SQRT throws where
       -- Spark yields NaN (single-row fuzz shape, all-purchase event).
       CASE WHEN p2 > 1 THEN NULL ELSE
       CAST(CEIL(
         POWER(1.959964 * SQRT(2 * pbar * (1 - pbar))
               + 0.841621 * SQRT(p * (1 - p) + p2 * (1 - p2)), 2)
         / (mde * mde)
       ) AS BIGINT) END AS n_per_arm
FROM calc
""",
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size calculator for the NEXT experiment, seeded by the
    measured baseline: n per arm to detect an absolute lift of
    {1,2,5} points over the measured purchase rate at α=0.05 (two-sided)
    and 80% power — the two-proportion formula
    n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁+p₂q₂))² / Δ². Closes the
    experimentation loop around G28: q_ab_test judges a finished
    experiment; this sizes the next one (and tells you whether the
    corpus can even support detecting a 1-point lift).

    Cost: ONE global conditional-count aggregate over events (map-side
    partial) → a 1-row frame crossed with a 3-row literal MDE grid.
    The z constants are identical literals in both engines; every
    derived value is the same IEEE expression tree on the same
    doubles, and the output n is CEIL'd to an exact integer."""
    ev = load(spark, sf_dir, "events", columns=["event_type"])
    # try_divide: zero events → NULL baseline rate (rows still emit,
    # NULL-propagated) — ANSI /0 throws, DuckDB yields NULL.
    base = ev.agg(
        F.try_divide(
            F.count(F.when(F.col("event_type") == "purchase", 1)).cast("double"),
            F.count(F.lit(1)),
        ).alias("p")
    )
    grid = spark.range(3).select(
        F.element_at(F.array(F.lit(0.01), F.lit(0.02), F.lit(0.05)), (F.col("id") + 1).cast("int")).alias("mde")
    )
    c = base.crossJoin(F.broadcast(grid))
    p, mde = F.col("p"), F.col("mde")
    p2 = p + mde
    pbar = (p + p2) / 2
    # p + mde > 1: the lift is unobservable => NULL n (the guard keeps
    # the variance term non-negative — DuckDB SQRT throws on negatives
    # where Spark yields NaN; single-row fuzz shape).
    n = F.when(
        p2 <= 1,
        F.ceil(
            F.pow(
                F.lit(1.959964) * F.sqrt(2 * pbar * (1 - pbar))
                + F.lit(0.841621) * F.sqrt(p * (1 - p) + p2 * (1 - p2)),
                2,
            )
            / (mde * mde)
        ).cast("long"),
    )
    return c.select(floor_quantize(p, 6).alias("baseline_rate"), "mde", n.alias("n_per_arm"))


# ---------------------------------------------------------------------------
# q_revenue_deciles_approx — the sort-free decile swap, made executable (G40b)
# ---------------------------------------------------------------------------


@query(
    "q_revenue_deciles_approx",
    oracle="""
WITH h AS (
  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS cell, COUNT(*) AS c
  FROM orders GROUP BY cell
),
cum AS (
  SELECT cell, c,
         SUM(c) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS cm,
         SUM(c) OVER () AS n
  FROM h
),
cuts AS (
  SELECT MIN(CASE WHEN cm >= (1 * n + 9) // 10 THEN cell END) AS c1,
         MIN(CASE WHEN cm >= (2 * n + 9) // 10 THEN cell END) AS c2,
         MIN(CASE WHEN cm >= (3 * n + 9) // 10 THEN cell END) AS c3,
         MIN(CASE WHEN cm >= (4 * n + 9) // 10 THEN cell END) AS c4,
         MIN(CASE WHEN cm >= (5 * n + 9) // 10 THEN cell END) AS c5,
         MIN(CASE WHEN cm >= (6 * n + 9) // 10 THEN cell END) AS c6,
         MIN(CASE WHEN cm >= (7 * n + 9) // 10 THEN cell END) AS c7,
         MIN(CASE WHEN cm >= (8 * n + 9) // 10 THEN cell END) AS c8,
         MIN(CASE WHEN cm >= (9 * n + 9) // 10 THEN cell END) AS c9
  FROM cum
),
bucketed AS (
  SELECT o_totalprice,
         10 - ((CAST(FLOOR(o_totalprice) AS BIGINT) > c1)::INT
             + (CAST(FLOOR(o_totalprice) AS BIGINT) > c2)::INT
             + (CAST(FLOOR(o_totalprice) AS BIGINT) > c3)::INT
             + (CAST(FLOOR(o_totalprice) AS BIGINT) > c4)::INT
             + (CAST(FLOOR(o_totalprice) AS BIGINT) > c5)::INT
             + (CAST(FLOOR(o_totalprice) AS BIGINT) > c6)::INT
             + (CAST(FLOOR(o_totalprice) AS BIGINT) > c7)::INT
             + (CAST(FLOOR(o_totalprice) AS BIGINT) > c8)::INT
             + (CAST(FLOOR(o_totalprice) AS BIGINT) > c9)::INT) AS decile
  FROM orders, cuts
),
d AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM bucketed GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile, n_orders,
       CAST(revenue AS DOUBLE) AS revenue,
       CASE WHEN abs(CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER () AS DOUBLE)) < 4.5e9 THEN floor((CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER () AS DOUBLE)) * 1e6 + 0.5) / 1e6 ELSE (CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER () AS DOUBLE)) END AS revenue_share
FROM d
""",
)
def q_revenue_deciles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB swap for q_revenue_deciles, executable:
    decile CUTOFFS from a FIXED-GRID value histogram (whole-dollar
    cells: one map-side floor + a grouped count whose state is bounded
    by the money domain, not n — mergeable, commutative), a cumulative
    pass over the COMPACT histogram (≤|price range| rows — the thing
    NTILE's single-reducer total order over all n rows cannot scale),
    then map-side bucketing against the broadcast 9-cell cutoff row.
    Cutoff rank error ≤ the mass of one grid cell; population error is
    bounded accordingly (pytest: within 5% of exact n/10, revenue
    conserved to the cent).

    Unlike the GK approx_percentile rendition this replaced (cutoffs
    engine-specific ⇒ rows-only), the grid pipeline is
    integer-deterministic end to end, so the DuckDB oracle verifies
    populations, revenue, and shares value-for-value. For continuous /
    unbounded domains where no natural grid exists, the GK sketch
    remains the right tool — q_approx_percentiles carries that
    pattern with its rank-band contract."""
    od = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    cell = F.floor("o_totalprice").cast("long")
    hist = od.groupBy(cell.alias("cell")).agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "cell",
        F.sum("c").over(wc).alias("cm"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    cuts = cum.agg(
        *[
            F.min(
                F.when(F.col("cm") >= F.expr(f"({j} * n + 9) div 10"), F.col("cell"))
            ).alias(f"c{j}")
            for j in range(1, 10)
        ]
    )
    # decile 1 = HIGHEST values (q_revenue_deciles orders desc):
    # cell > c9 → 1, > c8 → 2, ..., else 10. Comparing CELLS (not raw
    # values) keeps every order inside a boundary cell in one decile.
    above = sum(
        (F.col("cell") > F.col(f"c{j}")).cast("int") for j in range(1, 10)
    )
    bucketed = od.select("o_totalprice", cell.alias("cell")).crossJoin(
        F.broadcast(cuts)
    ).select("o_totalprice", (F.lit(10) - above).cast("long").alias("decile"))
    d = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
    )
    return d.select(
        "decile",
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
        floor_quantize(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(Window.partitionBy()).cast("double"), 6).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# q_price_realization — realized vs list price per brand (G59)
# ---------------------------------------------------------------------------


@query(
    "q_price_realization",
    oracle="""
SELECT p_brand,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS units,
       -- decimal->double via VARCHAR (native cast one ulp off at ~1e14
       -- — magnitude seed 5401); ratio floor-quantized on both engines
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS realized_revenue,
       CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))
                * CAST(l_quantity AS BIGINT)) AS VARCHAR) AS DOUBLE)   AS list_revenue,
       floor(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS BIGINT)) AS VARCHAR) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS realization
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def q_price_realization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price REALIZATION per brand: revenue actually collected
    (extended price net of discount) against revenue at list
    (retail price × units) — the pricing team's leakage readout,
    pinpointing brands whose street price has detached from the list
    price. Uses the one part-table column (p_retailprice) the TPC-H
    shapes leave untouched, closing the fixture's column coverage.

    Plan: part rides a broadcast; both revenue states accumulate in
    DECIMAL through the same grouped aggregate (order-independent,
    bit-equal cross-engine); the ratio is one float division of
    identical decimals, rounded 6 dp."""
    # fan_out: broadcast join + two decimal-product sums otherwise run
    # on the one-row-group scan's 1-3 tasks (q_corr_matrix discipline).
    li = fan_out(
        load(
            spark, sf_dir, "lineitem",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ),
        max_bytes=scatter_cap(),
    )
    part = load(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_retailprice"])
    dec = "decimal(18,2)"
    realized = F.sum(
        F.col("l_extendedprice").cast(dec) * (F.lit(1) - F.col("l_discount").cast(dec))
    )
    at_list = F.sum(F.col("p_retailprice").cast(dec) * F.col("l_quantity").cast("long"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("units"),
            realized.cast("double").alias("realized_revenue"),
            at_list.cast("double").alias("list_revenue"),
            (
                F.floor(
                    realized.cast("double") / at_list.cast("double") * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("realization"),
        )
    )
