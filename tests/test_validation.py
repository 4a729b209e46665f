"""Validation / quarantine semantics (SURVEY.md §2.3 F1-F2, F5) vs the
reference's drop-nonconforming-rows gates (/root/reference/main.py:146-163).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from grader_etl_spark.operators.validation import split_valid

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("props", StringType()),
    ]
)

TS = dt.datetime(2024, 1, 15, 12, 0, 0)

ROWS = [
    ("ok", "u1", TS, "run", '{"a": "1"}'),  # valid
    ("no_user", None, TS, "run", "{}"),  # main.py:146-147
    ("no_ts", "u1", None, "run", "{}"),  # main.py:161-163
    ("no_type", "u1", TS, None, "{}"),  # main.py:158-160
    ("empty_type", "u1", TS, "", "{}"),  # empty string fails too
    ("bad_props", "u1", TS, "run", "not json"),  # main.py:149-157
    ("null_props", "u1", TS, "run", None),  # absent dict -> quarantine
]


def test_split_valid_partitions_exactly(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    valid, quarantined = split_valid(df)
    v = {r["event_id"] for r in valid.collect()}
    q = {r["event_id"] for r in quarantined.collect()}
    assert v == {"ok"}
    assert q == {"no_user", "no_ts", "no_type", "empty_type", "bad_props", "null_props"}
    # Exhaustive and disjoint: F5's tolerance loses no rows.
    assert v | q == {r[0] for r in ROWS}
    assert not (v & q)
