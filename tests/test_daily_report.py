"""Daily-report semantics (SURVEY.md §7.4 traps 3-5).

Covers the zero-row division guard (/root/reference/main.py:283,293 —
an empty day must yield the all-zero report row, never null/NaN) and
value correctness on a hand-built batch.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from grader_etl_spark.constants import CHECK_TYPE, RUN_TYPE, SUCCESS_TYPE
from grader_etl_spark.operators.aggregates import daily_report

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ]
)


def test_zero_row_guard_returns_zero_report(spark):
    empty = spark.createDataFrame([], SCHEMA)
    row = daily_report(empty, report_date="2024-01-15").collect()[0].asDict()
    assert row == {
        "report_date": "2024-01-15",
        "total_attempts": 0,
        "successful_attempts": 0,
        "success_percentage": 0.0,  # not null, not NaN (main.py:293-315)
        "unique_users": 0,
        "run_attempts": 0,
        "check_attempts": 0,
    }


def test_report_values_and_date_filter(spark):
    day = dt.datetime(2024, 1, 15, 12, 0, 0)
    other_day = dt.datetime(2024, 1, 16, 0, 0, 1)
    rows = [
        ("u1", day, SUCCESS_TYPE),
        ("u1", day, RUN_TYPE),
        ("u2", day, CHECK_TYPE),
        ("u2", day, SUCCESS_TYPE),
        ("u3", other_day, SUCCESS_TYPE),  # outside the report day
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    row = daily_report(df, report_date="2024-01-15").collect()[0].asDict()
    assert row["total_attempts"] == 4
    assert row["successful_attempts"] == 2
    assert row["success_percentage"] == 50.0
    assert row["unique_users"] == 2
    assert row["run_attempts"] == 1
    assert row["check_attempts"] == 1
