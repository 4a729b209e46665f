"""Data-lifecycle plans: retention expiry and subject erasure over
the date-partitioned store.

The reference keeps every row forever in one unpartitioned Postgres
table (/root/reference/main.py:180-228) — deleting a user or an old
month would be a full-table DELETE. At 100 TB both operations must be
layout operations, not scans:

- **Retention expiry** (`expire_before`): dropping data older than a
  cutoff is a PARTITION DROP — remove whole `event_date=.../`
  directories. Zero data read, zero data written, cost proportional
  to the number of expired days, not bytes. This is the same
  contract as `ALTER TABLE ... DROP PARTITION` (Hive/Delta/Iceberg
  retention jobs).
- **Subject erasure** (`erase_users`, the GDPR Art. 17 job): a
  right-to-be-forgotten request names user_ids, not partitions. The
  plan first finds WHICH partitions contain the subjects (one
  column-pruned scan of `user_id` + the partition column, tombstone
  set broadcast), then rewrites ONLY those partitions with an
  anti-join — untouched partitions keep their files byte-identical
  (pinned by mtime+size in tests/test_lifecycle_plans.py). At scale
  the rewrite cost is (partitions containing subjects) × partition
  size, not corpus size; with user-bucketed layout it shrinks
  further to the subjects' buckets.

Both return one-row audit frames (what was dropped/rewritten) — the
compliance evidence a production lifecycle job must emit. Writes go
through the same advisory store lock as ParquetStore.idempotent_append
(plans/pipeline.py): lifecycle jobs and appenders serialize.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.plans import manifest
from grader_etl_spark.plans.layout import PARTITION_COL
from grader_etl_spark.plans.pipeline import _store_lock


def _partition_days(path: str) -> list[str]:
    """Partition values present on disk, from directory names (the
    metadata-only view a catalog would give)."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith(f"{PARTITION_COL}="):
            out.append(name.split("=", 1)[1])
    return out


def expire_before(spark: SparkSession, path: str, cutoff_day: str) -> DataFrame:
    """Drop every partition strictly older than ``cutoff_day``
    (YYYY-MM-DD). Pure directory removal — no scan, no rewrite; the
    audit row reports dropped/kept partition counts and the dropped
    day range."""
    cutoff = dt.date.fromisoformat(cutoff_day)
    days = _partition_days(path)
    dropped = [d for d in days if dt.date.fromisoformat(d) < cutoff]
    with _store_lock(path):
        before = manifest.dir_mtimes(path) if os.path.isdir(path) else {}
        for d in dropped:
            shutil.rmtree(os.path.join(path, f"{PARTITION_COL}={d}"))
        if os.path.isdir(path):
            manifest.republish_changed(path, before)
    return spark.createDataFrame(
        [
            (
                cutoff_day,
                len(dropped),
                len(days) - len(dropped),
                min(dropped) if dropped else None,
                max(dropped) if dropped else None,
            )
        ],
        "cutoff string, partitions_dropped int, partitions_kept int, "
        "oldest_dropped string, newest_dropped string",
    )


def erase_users(spark: SparkSession, path: str, user_ids: list[int]) -> DataFrame:
    """GDPR-style targeted erasure: remove all rows for ``user_ids``
    by rewriting ONLY the partitions that contain them.

    Plan: (1) one column-pruned scan of (user_id, partition col) with
    the tombstone set broadcast finds affected days — at scale this
    is the only corpus-wide read and it reads two columns; (2) each
    affected day is rewritten day-by-day with an anti-join and
    atomically swapped in (write to a sibling temp dir, rename);
    (3) every other partition's files are untouched. Returns the
    audit row: rows erased, partitions rewritten, partitions
    untouched."""
    tomb = [int(u) for u in user_ids]
    days = _partition_days(path)
    with _store_lock(path):
        before = manifest.dir_mtimes(path) if os.path.isdir(path) else {}
        store = spark.read.parquet(path)
        affected_rows = (
            store.select("user_id", PARTITION_COL)
            .filter(F.col("user_id").isin(tomb))
            .groupBy(PARTITION_COL)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        affected = {str(r[PARTITION_COL]): r["n"] for r in affected_rows}
        for day in sorted(affected):
            part_dir = os.path.join(path, f"{PARTITION_COL}={day}")
            tmp_dir = part_dir + ".__rewrite__"
            keep = (
                spark.read.parquet(part_dir)
                .filter(~F.col("user_id").isin(tomb))
                .sortWithinPartitions("ts")
                .coalesce(1)
            )
            keep.write.mode("overwrite").parquet(tmp_dir)
            # Atomic-ish swap: the window where neither dir exists is
            # the rename pair below; a real lakehouse closes it with a
            # manifest commit (Delta/Iceberg), which is the documented
            # production swap for this whole function.
            old_dir = part_dir + ".__old__"
            os.rename(part_dir, old_dir)
            os.rename(tmp_dir, part_dir)
            shutil.rmtree(old_dir)
            # drop the _SUCCESS marker so the partition dir stays a
            # plain hive-style leaf
            marker = os.path.join(part_dir, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)
        if os.path.isdir(path):
            manifest.republish_changed(path, before)
    return spark.createDataFrame(
        [
            (
                len(tomb),
                int(sum(affected.values())),
                len(affected),
                len(days) - len(affected),
            )
        ],
        "subjects int, rows_erased long, partitions_rewritten int, partitions_untouched int",
    )
