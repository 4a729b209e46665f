"""As-of join (SURVEY.md §2.6 J6, §7.4(7)) — the one relational op
Spark lacks natively.

Semantics: for each left row, the single right row with the largest
right.ts <= left.ts within the same key (DuckDB's ASOF JOIN).

Implementation is the union-tag + running-last trick:

1. tag right rows 0, left rows 1; union by (key, ts, tag, payload);
2. one window per key ordered by (ts, tag, right-id) with an
   unbounded-preceding frame;
3. ``last(right_payload, ignorenulls=True)`` carries the most recent
   right row forward onto every subsequent row;
4. keep only the left-tagged rows.

Cost: ONE shuffle on the key + one local sort — the same price as a
single sort-merge join, and it never builds the (left × right)
candidate pairs a naive range-join would. At 100 TB with a skewed key
the standard salting applies; with ts-bucketed storage both inputs
arrive nearly sorted and the local sort is cheap.

Tie rules (must match DuckDB): right rows sort before left rows at
equal ts (tag 0 < 1) so an exact-ts match is taken; duplicate right
rows at the same (key, ts) are collapsed to the max id first, making
the winner deterministic on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value: str,
) -> DataFrame:
    """Left as-of join: attach ``right_value`` of the latest right row
    with right.ts <= left.ts per key. Returns left columns +
    ``right_value`` (null when no prior right row exists)."""
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("__rv"),
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        F.col(right_value).alias("__rv"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lt.unionByName(rt)
        .withColumn("__asof", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
        .select("__left.*", F.col("__asof").alias(right_value))
    )


@query(
    "q_join_asof",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
signups AS (
  -- collapse same-(user, ts) duplicates deterministically (max id)
  SELECT user_id, ts, MAX(event_id) AS signup_event_id
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, s.signup_event_id
FROM purchases p
ASOF LEFT JOIN signups s
  ON p.user_id = s.user_id AND s.ts <= p.ts
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: for each purchase, the user's most recent signup at-or-before
    the purchase timestamp — checked against DuckDB's native ASOF JOIN."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
    )
    return asof_join(purchases, signups, key="user_id", ts="ts", right_value="signup_event_id").select(
        "event_id", "user_id", "signup_event_id"
    )
