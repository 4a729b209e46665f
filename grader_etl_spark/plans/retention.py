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
    from grader_etl_spark.plans.merge import (
        _commit_journal,
        _recover_unlocked,
        _staging_pair,
    )

    cutoff = dt.date.fromisoformat(cutoff_day)
    with _store_lock(path):
        # List partitions only AFTER recovery, under the lock: a merge
        # committing in the listing→lock gap could add an expired day
        # this run would otherwise silently miss (ADVICE r7 medium),
        # and recovery itself can change the directory set.
        _recover_unlocked(path)
        days = _partition_days(path)
        dropped = [d for d in days if dt.date.fromisoformat(d) < cutoff]
        if dropped and os.path.isdir(path):
            # Journaled partition DROP through the same commit machinery
            # as merge (empty staging, delete list only): a crash
            # mid-drop rolls FORWARD on the next recover instead of
            # leaving half the days dropped with a stale manifest —
            # and the manifest publish is part of the same commit.
            staging, trash = _staging_pair(path)
            os.makedirs(staging)
            _commit_journal(
                spark, path, staging, trash,
                staged_nonces={},
                deletes=[f"{PARTITION_COL}={d}" for d in dropped],
                _crash_after_swaps=None,
            )
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
    is the only corpus-wide read and it reads two columns; (2) ONE
    anti-join plan over exactly those partitions is staged and
    committed through merge's fsync'd-journal machinery (round 7 —
    roll-forward crash recovery and the atomic manifest publish come
    with it; previously a bespoke rename pair with a documented
    neither-dir-exists window); (3) every other partition's files are
    untouched. Returns the audit row: rows erased, partitions
    rewritten, partitions untouched."""
    from grader_etl_spark.plans.merge import _recover_unlocked, _stage_and_commit

    tomb = [int(u) for u in user_ids]
    with _store_lock(path):
        # Listing must follow recovery INSIDE the lock: a day added by
        # a merge committing in the gap, all of whose rows are erased,
        # would stage empty yet be absent from existing_dirs — never
        # retired, tombstoned rows surviving the erasure (ADVICE r7).
        _recover_unlocked(path)
        days = _partition_days(path)
        store = spark.read.parquet(path)
        affected_rows = (
            store.select("user_id", PARTITION_COL)
            .filter(F.col("user_id").isin(tomb))
            .groupBy(PARTITION_COL)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        affected = {str(r[PARTITION_COL]): r["n"] for r in affected_rows}
        if affected:
            # Rewrite the affected partitions through merge's staged
            # journaled commit (round 7): one anti-join plan over ONLY
            # those partitions, clustered one file per day and
            # time-sorted like the original layout, swapped in by the
            # roll-forward-idempotent journal — replaces the bespoke
            # rename pair whose "neither dir exists" window this
            # module used to document, and publishes the manifest as
            # part of the same commit. A day whose every row is erased
            # stages empty and is retired via the journal's delete
            # list.
            result = (
                store.filter(F.col(PARTITION_COL).isin(sorted(affected)))
                .filter(~F.col("user_id").isin(tomb))
                .repartition(F.col(PARTITION_COL))
                # prefix the sort with the partition column so the file
                # writer's required ordering is already satisfied and it
                # keeps the ts order (layout contract: time-sorted row
                # groups) even if AQE coalesces two days into one task
                .sortWithinPartitions(PARTITION_COL, "ts")
            )
            touched = {f"{PARTITION_COL}={d}" for d in affected}
            existing = {f"{PARTITION_COL}={d}" for d in days}
            _stage_and_commit(
                spark, path, result, [PARTITION_COL],
                touched=touched, existing_dirs=existing,
                _crash_after_swaps=None,
            )
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
