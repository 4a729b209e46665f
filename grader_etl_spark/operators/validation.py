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


@query(
    "q_dq_checks",
    oracle="""
SELECT 'orders_custkey_not_null' AS rule,
       count(CASE WHEN o_custkey IS NULL THEN 1 END) AS violations
FROM orders
UNION ALL
SELECT 'orders_duplicate_pk', count(*) - count(DISTINCT o_orderkey) FROM orders
UNION ALL
SELECT 'orders_status_accepted_values',
       count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
FROM orders
UNION ALL
SELECT 'lineitem_discount_in_range',
       count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
FROM lineitem
UNION ALL
SELECT 'orders_orphan_custkey', count(*)
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'lineitem_orphan_orderkey', count(*)
FROM lineitem
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
""",
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (dbt-test style): not-null,
    primary-key uniqueness, accepted values, numeric range, and two
    referential-integrity checks — one row per rule with its violation
    count, so a scheduler can gate a pipeline on ``violations > 0``
    (the engine-level form of the reference's per-row gates,
    main.py:146-163).

    Scale shape: every single-table rule for a table is computed in
    ONE aggregate pass (null count, count-minus-distinct, accepted
    values share a scan), then stack() unpivots to rule rows — rules
    don't multiply scans, exactly like q_profile_columns. The
    referential checks are broadcast/shuffled anti joins on the key
    columns only."""
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = load(spark, sf_dir, "customer", columns=["c_custkey"])
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_discount"])

    orders_wide = orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("r_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("r_dup"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias("r_vals"),
    ).select(
        F.expr(
            "stack(3, 'orders_custkey_not_null', r_null, "
            "'orders_duplicate_pk', r_dup, "
            "'orders_status_accepted_values', r_vals) AS (rule, violations)"
        )
    )
    li_range = li.agg(
        F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)).alias("v")
    ).select(F.lit("lineitem_discount_in_range").alias("rule"), F.col("v").alias("violations"))
    orphan_orders = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("orders_orphan_custkey").alias("rule"), F.col("v").alias("violations"))
    )
    orphan_lines = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("lineitem_orphan_orderkey").alias("rule"), F.col("v").alias("violations"))
    )
    return (
        orders_wide.unionByName(li_range)
        .unionByName(orphan_orders)
        .unionByName(orphan_lines)
    )
