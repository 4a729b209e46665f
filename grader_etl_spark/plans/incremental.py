"""Incremental (differential) report maintenance.

The reference recomputes its daily report from scratch every run
(main.py:278-289 scans the whole table server-side). At 100 TB a full
recompute per batch is untenable; the correct shape is incremental
view maintenance over the date-partitioned store:

1. land the batch idempotently (ParquetStore.idempotent_append);
2. the AFFECTED dates = the batch's distinct event dates — a
   driver-sized list (days, not rows);
3. recompute the per-day report ONLY for those dates — the date
   filter prunes the store scan to the touched partitions;
4. merge the fresh rows into the report table with DYNAMIC partition
   overwrite (`partitionOverwriteMode=dynamic`): untouched report
   partitions are never rewritten.

The pytest contract (tests/test_incremental.py) is the differential
invariant: after any sequence of (possibly overlapping) batches, the
incrementally-maintained report table equals a from-scratch recompute
over the full store.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.plans.pipeline import ParquetStore
from grader_etl_spark.functions.quantize import floor_quantize


def per_day_report(stats: DataFrame) -> DataFrame:
    """The reference's 7-metric report (main.py:278-289), grouped by
    event date instead of filtered to one day — the maintainable form:
    each output row depends ONLY on its own date partition, which is
    what makes partition-grained incremental recompute correct."""
    succ = F.count(F.when(F.col("is_correct") == True, 1))  # noqa: E712
    total = F.count(F.lit(1))
    return (
        stats.withColumn("event_date", F.to_date("event_timestamp"))
        .groupBy("event_date")
        .agg(
            total.alias("total_attempts"),
            succ.alias("successful_attempts"),
            F.when(total == 0, F.lit(0.0))
            .otherwise(floor_quantize(succ * 100.0 / total, 2))
            .alias("success_percentage"),
            F.countDistinct("user_id").alias("unique_users"),
            F.count(F.when(F.col("attempt_type") == "run", 1)).alias("run_attempts"),
            F.count(F.when(F.col("attempt_type") == "check", 1)).alias("check_attempts"),
        )
    )


@dataclass
class IncrementalReport:
    """Date-partitioned report table maintained batch-by-batch."""

    spark: SparkSession
    store: ParquetStore
    report_path: str

    def read(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.report_path)
        except Exception:
            return None

    def apply_batch(self, batch: DataFrame) -> list:
        """Land the batch and refresh only the report partitions whose
        dates it touches. Returns the affected dates (driver-sized)."""
        self.store.idempotent_append(batch)
        dates = [
            r["d"]
            for r in batch.select(F.to_date("event_timestamp").alias("d")).distinct().collect()
        ]
        if not dates:
            return []
        stats = self.store.read()
        fresh = per_day_report(stats.filter(F.col("event_date").isin(dates)))
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            (
                fresh.write.mode("overwrite")
                .partitionBy("event_date")
                .parquet(self.report_path)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return dates
