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
