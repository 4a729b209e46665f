"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``grader_etl_spark.registry`` — every
operator module registers its (PySpark fn, DuckDB oracle) pair there;
this file only re-exposes the registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's daily report, SURVEY.md §7.1)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from grader_etl_spark.operators.aggregates import q_daily_report

    return q_daily_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (omitted => rows-only check)."""
    return registry.all_oracles()
