"""Set operations (SURVEY.md §2.6 O2): union / intersect / except.

One labeled result set so a single oracle covers all three. INTERSECT
and EXCEPT are distinct-semantics (they plan as aggregates + semi/anti
joins in Spark); UNION here is by-name with dedup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load
from grader_etl_spark.registry import query


def _typed_users(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events", columns=["user_id", "event_type"])
        .filter(F.col("event_type") == event_type)
        .select("user_id")
    )


@query(
    "q_set_ops",
    oracle="""
SELECT 'purchase_and_click' AS op, user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'click'
)
UNION ALL
SELECT 'signup_not_error' AS op, user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'signup'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT 'view_or_click' AS op, user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'view'
  UNION
  SELECT user_id FROM events WHERE event_type = 'click'
)
""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: intersect / except / union(distinct) over user-id sets,
    labeled and unioned into one result."""
    purchase = _typed_users(spark, sf_dir, "purchase")
    click = _typed_users(spark, sf_dir, "click")
    signup = _typed_users(spark, sf_dir, "signup")
    error = _typed_users(spark, sf_dir, "error")
    view = _typed_users(spark, sf_dir, "view")

    both = purchase.intersect(click).select(F.lit("purchase_and_click").alias("op"), "user_id")
    only = signup.subtract(error).select(F.lit("signup_not_error").alias("op"), "user_id")
    either = view.unionByName(click).distinct().select(F.lit("view_or_click").alias("op"), "user_id")
    return both.unionByName(only).unionByName(either)
