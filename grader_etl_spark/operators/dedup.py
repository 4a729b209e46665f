"""Keyed deduplication / idempotent-insert operators
(SURVEY.md §2.4 D1–D2).

The reference makes its overlapping 7-day re-fetch idempotent with
`INSERT ... ON CONFLICT (user_id, event_timestamp) DO NOTHING`
(/root/reference/main.py:202) — first-writer-wins on a composite
natural key. Spark has no row-at-a-time upsert; the equivalents are:

- in-batch: deterministic first-row-per-key (window rank, tie-broken
  on a stable column — plain ``dropDuplicates`` keeps an *arbitrary*
  row, which can't be oracle-checked and shouldn't be trusted in a
  pipeline either);
- across batches: left-anti join of the incoming batch against the
  sink's keys (see plans/pipeline.py), or Delta MERGE where available;
- streaming: ``withWatermark(...).dropDuplicates(...)`` (streaming/).

At 100 TB the window and the anti-join both shuffle on the key — one
shuffle each, partial-agg-free but AQE-skew-protected; the anti-join's
sink side reads keys only (two columns) thanks to pruning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query


def first_writer_wins(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Keep exactly one row per key — the first by ``order`` — the
    deterministic rendition of ON CONFLICT DO NOTHING (main.py:202)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def insert_new_keys_only(batch: DataFrame, sink: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``batch`` whose key is absent from ``sink`` — the
    cross-batch half of the idempotent insert (left-anti join)."""
    return batch.join(sink.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")


@query(
    "q_dedup_key",
    oracle="""
SELECT user_id, event_date, event_id
FROM (
  SELECT user_id,
         strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
         event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def q_dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: first-writer-wins per (user_id, day) — earliest event kept,
    deterministic tie-break on event_id."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts", "event_id"]).withColumn(
        "event_date", F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    )
    return first_writer_wins(ev, keys=["user_id", "event_date"], order=["ts", "event_id"]).select(
        "user_id", "event_date", "event_id"
    )


@query(
    "q_dedup_exact",
    oracle="""
SELECT DISTINCT user_id, event_type
FROM events
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact whole-row dedup — `distinct` compiles to a hash aggregate
    with map-side partials, so duplicates collapse before the shuffle."""
    return load(spark, sf_dir, "events", columns=["user_id", "event_type"]).distinct()


# ---------------------------------------------------------------------------
# K9 — snapshot reconciliation diff (added / changed / unchanged)
# ---------------------------------------------------------------------------

SNAPSHOT_CUT = "2024-01-20"


@query(
    "q_snapshot_diff",
    oracle=f"""
WITH t1 AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM events WHERE ts < TIMESTAMP '{SNAPSHOT_CUT} 00:00:00'
  GROUP BY user_id
),
t2 AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM events GROUP BY user_id
)
SELECT CASE WHEN t1.user_id IS NULL THEN 'added'
            WHEN t1.n = t2.n AND t1.total = t2.total THEN 'unchanged'
            ELSE 'changed' END AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM t2 LEFT JOIN t1 ON t1.user_id = t2.user_id
GROUP BY 1
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff the per-user aggregate state of
    the store at two versions (as-of {SNAPSHOT_CUT} vs now) into
    added / changed / unchanged key counts — the migration-validation
    / backfill-audit operator every 'did the rewrite preserve the
    table' check reduces to. Both versions aggregate BEFORE the join,
    so the diff join carries one row per key with a fixed-width state
    (count + DECIMAL-exact sum — order-independent, no false
    'changed' from partial-sum association), never raw rows; the
    older snapshot's time predicate pushes into its scan. Deleted
    keys would surface from the symmetric anti side — append-only
    fixtures have none, so the left join keeps the output 3-state."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts", "value"])

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )

    t1 = state(ev.filter(F.col("ts") < SNAPSHOT_CUT)).select(
        F.col("user_id").alias("u1"), F.col("n").alias("n1"), F.col("total").alias("tot1")
    )
    t2 = state(ev)
    change = (
        F.when(F.col("u1").isNull(), "added")
        .when((F.col("n1") == F.col("n")) & (F.col("tot1") == F.col("total")), "unchanged")
        .otherwise("changed")
    )
    return (
        t2.join(t1, t2.user_id == t1.u1, "left")
        .select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
