"""Fixture table access.

All oracle-checked queries read the driver-generated parquet tables
(TESTDATA.md). ``load`` is the one scan entry point so that column
pruning / predicate pushdown behavior is auditable in one place:
callers pass ``columns=`` when they statically know the projection,
but Catalyst prunes through ``select`` anyway — the parameter exists
for readability, not necessity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str, columns: list[str] | None = None) -> DataFrame:
    """Scan one fixture table from ``{sf_dir}/{table}.parquet``.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader
    rejects; with spark.sql.legacy.parquet.nanosAsLong (session.py) it
    arrives as epoch-nanos long and is normalized to a microsecond
    TimestampType here (the fixture's values are µs-resolution, so the
    floor-division is lossless)."""
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if columns:
        df = df.select(*columns)
    return df


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
