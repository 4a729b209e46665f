"""Retention expiry + subject erasure over the partitioned store:
partition drops are metadata-only, erasure rewrites ONLY affected
partitions (others stay byte-identical), and audit rows reconcile
with before/after row counts.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from grader_etl_spark.io import load
from grader_etl_spark.plans.layout import PARTITION_COL, write_date_partitioned
from grader_etl_spark.plans.retention import erase_users, expire_before


def _file_state(path: str) -> dict[str, tuple[int, float]]:
    # the pin is about DATA files: manifest metadata (_manifest.json,
    # per-dir _content-* nonces) is re-published by every lifecycle
    # commit by design and excluded here
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_content-", "_manifest.json")):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime)
    return out


def _days(path: str) -> list[str]:
    return sorted(
        n.split("=", 1)[1] for n in os.listdir(path) if n.startswith(f"{PARTITION_COL}=")
    )


def test_expire_before_drops_only_old_partitions(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    write_date_partitioned(load(spark, sf_dir, "events"), store)
    days = _days(store)
    assert len(days) >= 3
    cutoff = days[2]
    keep_state_before = {
        k: v for k, v in _file_state(store).items() if not any(
            f"{PARTITION_COL}={d}" in k for d in days[:2]
        )
    }

    audit = expire_before(spark, store, cutoff).collect()[0]
    assert audit["partitions_dropped"] == 2
    assert audit["partitions_kept"] == len(days) - 2
    assert audit["oldest_dropped"] == days[0]
    assert audit["newest_dropped"] == days[1]
    assert _days(store) == days[2:]
    # Surviving partitions untouched byte-for-byte.
    assert keep_state_before == _file_state(store)
    # Reads still work and contain no expired day.
    remaining = spark.read.parquet(store)
    assert remaining.filter(F.col(PARTITION_COL) < F.lit(cutoff).cast("date")).count() == 0


def test_erase_users_rewrites_only_affected_partitions(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    events = load(spark, sf_dir, "events")
    write_date_partitioned(events, store)
    total_before = spark.read.parquet(store).count()

    # Pick two subjects present in SOME days only (so untouched
    # partitions exist), from the fixture itself.
    subjects = [
        r["user_id"]
        for r in events.groupBy("user_id").count().orderBy("user_id").limit(2).collect()
    ]
    expect_erased = events.filter(F.col("user_id").isin(subjects)).count()
    affected_days = {
        str(r[0])
        for r in events.filter(F.col("user_id").isin(subjects))
        .select(F.to_date("ts"))
        .distinct()
        .collect()
    }
    before = _file_state(store)

    audit = erase_users(spark, store, subjects).collect()[0]
    assert audit["rows_erased"] == expect_erased
    assert audit["partitions_rewritten"] == len(affected_days)
    assert audit["partitions_untouched"] == len(_days(store)) - len(affected_days)

    after = _file_state(store)
    for rel, st in after.items():
        day = rel.split("=", 1)[1].split("/", 1)[0] if "=" in rel else None
        if day and day not in affected_days:
            assert before[rel] == st, f"untouched partition rewritten: {rel}"
    # Subjects fully gone; nothing else lost.
    now = spark.read.parquet(store)
    assert now.filter(F.col("user_id").isin([int(s) for s in subjects])).count() == 0
    assert now.count() == total_before - expect_erased
