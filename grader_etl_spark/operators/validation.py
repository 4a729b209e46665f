"""Validation / quarantine operators (SURVEY.md §2.3 F1–F2, F5).

The reference validates row-at-a-time in Python and silently drops
nonconforming rows (/root/reference/main.py:146-163). Spark-first,
validation is a typed predicate: one codegen'd filter pass, with the
complement available as a quarantine side-output instead of a WARN
log. ``split_valid`` gives both halves from one lineage; at scale the
quarantine write reuses the same scan via DataFrame persistence or
simply two pushed-down passes (cheap — the predicate is pruned to the
validated columns only).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from grader_etl_spark.io import load
from grader_etl_spark.registry import query


def validity_predicate() -> Column:
    """The engine's rendition of the reference's 6 validation gates
    (main.py:146-163) on the events fixture columns:

    - user_id present            (main.py:146-147: non-empty user id)
    - ts present                 (main.py:161-163: created_at required)
    - event_type present+non-empty (main.py:158-160: str-typed optional
      becomes not-null here — the fixture is typed, so "wrong type"
      manifests as null after a typed read)
    - props parses as a JSON object (main.py:149-157: the three
      passback keys must come from a dict)
    """
    props_map = F.from_json("props", "map<string,string>")
    return (
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & (F.col("event_type") != "")
        & props_map.isNotNull()
    )


def split_valid(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Return (valid, quarantined) — F5's per-record tolerance as a
    side output rather than a dropped-and-logged row."""
    pred = validity_predicate()
    return events.filter(pred), events.filter(~pred | pred.isNull())


@query(
    "q_validate_filter",
    oracle="""
SELECT event_id, user_id, event_type
FROM events
WHERE user_id IS NOT NULL
  AND ts IS NOT NULL
  AND event_type IS NOT NULL
  AND event_type != ''
  AND json_valid(props)
  AND json_type(json(props)) = 'OBJECT'
""",
)
def q_validate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: the validation gates as one pushed-down filter."""
    valid, _ = split_valid(load(spark, sf_dir, "events"))
    return valid.select("event_id", "user_id", "event_type")
