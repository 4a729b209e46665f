"""Storage layout — the write-side half of the 100 TB design.

The reference's one store is an unpartitioned Postgres table written
row-at-a-time (main.py:180-228). At scale the store is parquet laid
out so the READ plans in this repo get their pruning for free:

- **date partitioning** (`partitionBy("event_date")`): the daily
  report's date-equality filter (SURVEY §2.3 F3) becomes partition
  pruning — the scan never opens files outside the day.
- **one file per partition-value per write** (`repartition` on the
  partition column first): without it every task writes every date it
  happens to hold → tasks × dates small files, the classic layout
  bug that turns a 100 TB table into billions of tiny objects.
- **sortWithinPartitions(ts)**: clusters rows so parquet row-group
  min/max statistics make intra-day time-range scans skip row groups
  (the pushed-down range filter in io.load_events_range needs this
  physical order to actually skip anything).

tests/test_layout.py pins all three properties: directory structure,
file counts, and that a day-filtered read shows PartitionFilters and
touches only that day's files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load

PARTITION_COL = "event_date"


def write_date_partitioned(
    events: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write events as date-partitioned parquet, one file per day,
    time-sorted within each file."""
    (
        events.withColumn(PARTITION_COL, F.to_date(ts_col))
        .repartition(F.col(PARTITION_COL))
        .sortWithinPartitions(ts_col)
        .write.partitionBy(PARTITION_COL)
        .mode(mode)
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Scan one day from the partitioned store. The equality filter on
    the partition column prunes directories at planning time —
    .explain('formatted') shows it under PartitionFilters, not
    PushedFilters, and inputFiles() stays inside one day directory."""
    return spark.read.parquet(path).filter(F.col(PARTITION_COL) == F.lit(day).cast("date"))


def ingest_events(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Lay out the events fixture as the canonical partitioned store
    (the batch half of the reference pipeline's Load stage)."""
    write_date_partitioned(load(spark, sf_dir, "events"), path)
