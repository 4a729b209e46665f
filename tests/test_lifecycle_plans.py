"""Retention expiry + subject erasure over the partitioned store:
partition drops are metadata-only, erasure rewrites ONLY affected
partitions (others stay byte-identical), and audit rows reconcile
with before/after row counts.
"""

from __future__ import annotations

import os

import pytest

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


def test_expire_crash_mid_drop_rolls_forward(spark, sf_dir, tmp_path, monkeypatch):
    """Round 7: retention drops commit through merge's journal — a
    crash mid-drop leaves a journal that the next reader/writer rolls
    FORWARD (all expired days gone, manifest consistent), never half
    the days dropped with a stale manifest."""
    from grader_etl_spark.plans import manifest as M
    from grader_etl_spark.plans import merge as merge_mod
    from grader_etl_spark.plans.merge import _InjectedCrash, recover

    store = str(tmp_path / "store")
    write_date_partitioned(load(spark, sf_dir, "events"), store)
    days = _days(store)
    assert len(days) >= 3
    cutoff = days[2]

    real_apply = merge_mod._apply_swaps

    def crash_after_one(path, journal, on_step=None):
        done = {"n": 0}

        def step():
            done["n"] += 1
            if done["n"] > 1:
                raise _InjectedCrash("injected")

        real_apply(path, journal, on_step=step)

    monkeypatch.setattr(merge_mod, "_apply_swaps", crash_after_one)
    with pytest.raises(_InjectedCrash):
        expire_before(spark, store, cutoff)
    monkeypatch.undo()
    assert os.path.exists(store + ".merge-journal")

    assert recover(store) is True
    assert _days(store) == days[2:]
    assert M.mismatches(store) == []


def test_erase_crash_mid_swap_rolls_forward(spark, sf_dir, tmp_path, monkeypatch):
    from grader_etl_spark.plans import manifest as M
    from grader_etl_spark.plans import merge as merge_mod
    from grader_etl_spark.plans.merge import _InjectedCrash
    from grader_etl_spark.plans.retention import erase_users

    store = str(tmp_path / "store")
    write_date_partitioned(load(spark, sf_dir, "events"), store)
    # a subject present on >=2 days so the commit has >=2 swaps to
    # crash between
    user = int(
        spark.read.parquet(store)
        .groupBy("user_id").agg(F.countDistinct(PARTITION_COL).alias("d"))
        .filter(F.col("d") >= 2).orderBy("user_id").limit(1)
        .collect()[0]["user_id"]
    )

    real_apply = merge_mod._apply_swaps

    def crash_after_one(path, journal, on_step=None):
        done = {"n": 0}

        def step():
            done["n"] += 1
            if done["n"] > 1:
                raise _InjectedCrash("injected")

        real_apply(path, journal, on_step=step)

    monkeypatch.setattr(merge_mod, "_apply_swaps", crash_after_one)
    with pytest.raises(_InjectedCrash):
        erase_users(spark, store, [user])
    monkeypatch.undo()

    # the manifest reader completes the commit and never sees the
    # subject again
    df = M.read_table(spark, store)
    assert df.filter(df.user_id == user).count() == 0
    assert M.mismatches(store) == []


def test_torn_journal_tmp_is_swept_not_fatal(tmp_path):
    """A crash mid-journal-write leaves only a tmp (the rename is the
    commit point): recovery sweeps it and reports no commit."""
    from grader_etl_spark.plans.merge import recover

    path = str(tmp_path / "t")
    os.makedirs(os.path.join(path, "day=d1"))
    with open(path + ".merge-journal.tmp-abc", "w") as f:
        f.write('{"staging": "x", "trash":')  # torn JSON
    os.makedirs(path + ".merge-staging-abc/day=d1")
    assert recover(path) is False
    assert not os.path.exists(path + ".merge-journal.tmp-abc")
    assert not os.path.isdir(path + ".merge-staging-abc")
    assert os.path.isdir(os.path.join(path, "day=d1"))  # table untouched


def test_expire_lists_partitions_under_lock(spark, sf_dir, tmp_path, monkeypatch):
    """ADVICE r8 (medium): the partition listing must happen INSIDE the
    store lock, after recovery — a merge committing in the gap between
    a pre-lock listing and lock acquisition could add an expired day
    the run would silently keep. Simulated by having recovery (the
    first thing expire_before does under the lock) install a
    gap-committed expired day: the fix lists AFTER it, so the day is
    dropped."""
    import shutil

    from grader_etl_spark.plans import merge as merge_mod

    store = str(tmp_path / "store")
    write_date_partitioned(load(spark, sf_dir, "events"), store)
    days = _days(store)
    cutoff = days[1]
    real = merge_mod._recover_unlocked
    gap = os.path.join(store, f"{PARTITION_COL}=1999-01-01")

    def recover_then_gap_day(path):
        out = real(path)
        if not os.path.isdir(gap):
            shutil.copytree(os.path.join(store, f"{PARTITION_COL}={days[0]}"), gap)
        return out

    monkeypatch.setattr(merge_mod, "_recover_unlocked", recover_then_gap_day)
    audit = expire_before(spark, store, cutoff).collect()[0]
    monkeypatch.undo()
    assert audit["partitions_dropped"] == 2  # days[0] AND the gap day
    assert audit["oldest_dropped"] == "1999-01-01"
    assert "1999-01-01" not in _days(store)
    assert _days(store) == days[1:]


def test_erase_users_retires_gap_committed_day(spark, sf_dir, tmp_path, monkeypatch):
    """ADVICE r8 (medium), erasure side: a day committed in the
    listing→lock gap whose EVERY row belongs to the erased subject
    must be retired — under the old pre-lock listing it stayed on disk
    (stage-empty but absent from existing_dirs), tombstoned rows
    surviving the GDPR erasure."""
    import shutil as _shutil

    from grader_etl_spark.plans import merge as merge_mod

    store = str(tmp_path / "store")
    events = load(spark, sf_dir, "events")
    write_date_partitioned(events, store)
    days = _days(store)
    subject = events.groupBy("user_id").count().orderBy("user_id").limit(1).collect()[0][
        "user_id"
    ]

    # Build the gap day off to the side: subject-only rows under a new date.
    side = str(tmp_path / "side")
    write_date_partitioned(
        events.filter(F.col("user_id") == subject)
        .withColumn("ts", F.expr("ts - INTERVAL 3650 DAYS")),
        side,
    )
    gap_leaf = sorted(n for n in os.listdir(side) if n.startswith(f"{PARTITION_COL}="))[0]
    gap_day = gap_leaf.split("=", 1)[1]
    assert gap_day not in days

    real = merge_mod._recover_unlocked

    def recover_then_gap_day(path):
        out = real(path)
        if not os.path.isdir(os.path.join(store, gap_leaf)):
            _shutil.copytree(os.path.join(side, gap_leaf), os.path.join(store, gap_leaf))
        return out

    monkeypatch.setattr(merge_mod, "_recover_unlocked", recover_then_gap_day)
    erase_users(spark, store, [subject]).collect()
    monkeypatch.undo()

    # The all-subject gap day is RETIRED, and no subject row survives.
    assert gap_day not in _days(store)
    assert spark.read.parquet(store).filter(F.col("user_id") == subject).count() == 0
