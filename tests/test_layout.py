"""Storage-layout invariants (plans/layout.py): partition directory
structure, one file per day, partition pruning in the read plan."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from grader_etl_spark.io import load
from grader_etl_spark.plans.layout import ingest_events, read_day

SF = "/root/testdata/sf0.001"
DAY = "2024-01-15"


def _store(spark, tmp_path) -> str:
    path = str(tmp_path / "events_store")
    ingest_events(spark, SF, path)
    return path


def test_directory_per_day_and_one_file_each(spark, tmp_path):
    path = _store(spark, tmp_path)
    days = sorted(d for d in os.listdir(path) if d.startswith("event_date="))
    src_days = {
        r["d"].isoformat()
        for r in load(spark, SF, "events").select(F.to_date("ts").alias("d")).distinct().collect()
    }
    assert {d.split("=", 1)[1] for d in days} == src_days
    for d in days:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: expected 1 compacted file, got {len(files)}"


def test_day_read_prunes_partitions(spark, tmp_path):
    path = _store(spark, tmp_path)
    day_df = read_day(spark, path, DAY)

    plan = day_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan

    # inputFiles() reflects the pre-pruning FileIndex; the executed
    # scan node's metrics show what was actually read.
    jdf = day_df._jdf
    n_rows = len(jdf.collect())
    scan = jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    assert scan.metrics().apply("numFiles").value() == 1  # 1 of ~30 day dirs
    assert scan.metrics().apply("numPartitions").value() == 1

    expected = load(spark, SF, "events").filter(F.to_date("ts") == F.lit(DAY).cast("date")).count()
    assert n_rows == expected


def test_within_day_rows_are_time_sorted(spark, tmp_path):
    path = _store(spark, tmp_path)
    ts = [r["ts"] for r in read_day(spark, path, DAY).select("ts").collect()]
    assert ts == sorted(ts), "rows inside a day file should be time-clustered"
