"""Unpivot (SURVEY.md §2.7 K3 / q_unpivot_report).

The reference renders its 1-row report as 8 metric/value spreadsheet
rows (/root/reference/main.py:324-333) — a wide→long unpivot. In
Spark that is the ``stack`` generator (or ``DataFrame.melt``); it runs
on the 1-row aggregate, so cost is nil — the point is the operator's
availability for wide fact tables, where stack over N columns is one
narrow pass with no shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.operators.aggregates import daily_report
from grader_etl_spark.io import load
from grader_etl_spark.registry import query

_METRICS = [
    "total_attempts",
    "successful_attempts",
    "success_percentage",
    "unique_users",
    "run_attempts",
    "check_attempts",
]


def unpivot_metrics(report: DataFrame, metrics: list[str]) -> DataFrame:
    """Wide 1-row report → (metric, value) rows, values unified to double."""
    pairs = ", ".join(f"'{m}', CAST({m} AS DOUBLE)" for m in metrics)
    return report.select(F.expr(f"stack({len(metrics)}, {pairs}) AS (metric, value)"))


_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{m}' AS metric, CAST({m} AS DOUBLE) AS value FROM report" for m in _METRICS
)


@query(
    "q_unpivot_report",
    oracle=f"""
WITH report AS (
  SELECT
    COUNT(*)                                                  AS total_attempts,
    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)       AS successful_attempts,
    CASE WHEN COUNT(*) = 0 THEN 0.0
         ELSE ROUND(CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
                    * 100 / CAST(COUNT(*) AS DOUBLE), 2) END  AS success_percentage,
    COUNT(DISTINCT user_id)                                   AS unique_users,
    COUNT(CASE WHEN event_type = 'view' THEN 1 END)           AS run_attempts,
    COUNT(CASE WHEN event_type = 'click' THEN 1 END)          AS check_attempts
  FROM events
  WHERE CAST(ts AS DATE) = DATE '2024-01-15'
)
{_ORACLE}
""",
)
def q_unpivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: the report-sheet layout (main.py:324-333) as stack()."""
    report = daily_report(load(spark, sf_dir, "events")).drop("report_date")
    return unpivot_metrics(report, _METRICS)
