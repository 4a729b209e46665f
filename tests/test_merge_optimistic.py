"""Optimistic partition-level concurrent merge (plans/merge.py round
8): the read/compose/stage phases run WITHOUT the store lock; the
lock covers only the nonce-checked commit tail. Disjoint-partition
merges commit concurrently; overlapping merges make the loser retry
from a fresh snapshot. Deterministic interleavings are driven through
the ``_test_before_commit`` hook (a competing commit lands exactly in
the stage→commit window); the real two-process race lives in
``test_two_process_*`` below and the soak's writer mode.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from grader_etl_spark.plans import manifest as M
from grader_etl_spark.plans.merge import (
    ConcurrentWriteConflict,
    merge_into,
)

SCHEMA = "k int, v string, day string"


def _target(spark, path) -> None:
    rows = [
        (1, "a", "d1"), (2, "b", "d1"),
        (3, "c", "d2"), (4, "d", "d2"),
        (5, "e", "d3"), (6, "f", "d3"),
    ]
    spark.createDataFrame(rows, SCHEMA).write.partitionBy("day").parquet(path)


def _rows(spark, path) -> set[tuple]:
    return {(r.k, r.v, r.day) for r in spark.read.parquet(path).collect()}


def _no_orphans(path: str) -> bool:
    parent, base = os.path.split(path.rstrip("/"))
    return not [
        d for d in os.listdir(parent)
        if d.startswith(base + ".merge-staging-") or d.startswith(base + ".merge-trash-")
    ]


def test_optimistic_parity_on_quiet_table(spark, tmp_path):
    """With no competition, optimistic == locked: same stats, same
    rows, manifest verifies, zero retries, no staging residue."""
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(2, "B", "d1"), (9, "i", "d9")], SCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       optimistic=True)
    assert (stats.inserted, stats.updated, stats.deleted) == (1, 1, 0)
    assert stats.commit_retries == 0
    assert _rows(spark, path) == {
        (1, "a", "d1"), (2, "B", "d1"), (3, "c", "d2"), (4, "d", "d2"),
        (5, "e", "d3"), (6, "f", "d3"), (9, "i", "d9"),
    }
    assert M.mismatches(path) == []
    assert _no_orphans(path)


def test_optimistic_creates_table_via_locked_path(spark, tmp_path):
    path = str(tmp_path / "t")
    src = spark.createDataFrame([(1, "a", "d1")], SCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       optimistic=True)
    assert stats.inserted == 1
    assert _rows(spark, path) == {(1, "a", "d1")}
    assert M.mismatches(path) == []


def test_overlap_conflict_retries_and_serializes(spark, tmp_path):
    """A competing locked merge commits into one of OUR touched
    partitions exactly in the stage→commit window: the nonce check
    must catch it, the attempt retries from a fresh snapshot, and the
    final table is the SERIAL result (their commit, then ours)."""
    path = str(tmp_path / "t")
    _target(spark, path)

    def compete(attempt):
        if attempt == 0:  # lands between our staging write and commit lock
            other = spark.createDataFrame([(1, "THEIRS", "d1"), (7, "g", "d1")], SCHEMA)
            merge_into(spark, path, other, keys=["k"], partition_col="day")

    src = spark.createDataFrame([(2, "MINE", "d1")], SCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       optimistic=True, _test_before_commit=compete)
    assert stats.commit_retries == 1
    assert stats.updated == 1
    # serial outcome: competitor's update+insert survive, ours applied on top
    assert _rows(spark, path) == {
        (1, "THEIRS", "d1"), (2, "MINE", "d1"), (7, "g", "d1"),
        (3, "c", "d2"), (4, "d", "d2"), (5, "e", "d3"), (6, "f", "d3"),
    }
    assert M.mismatches(path) == []
    assert _no_orphans(path)


def test_disjoint_commit_needs_no_retry(spark, tmp_path):
    """A competing commit into a DIFFERENT partition set must NOT
    conflict: we commit on the first attempt, both changes land, and
    the post-commit manifest carries both."""
    path = str(tmp_path / "t")
    _target(spark, path)

    def compete(attempt):
        other = spark.createDataFrame([(3, "THEIRS", "d2")], SCHEMA)
        merge_into(spark, path, other, keys=["k"], partition_col="day")

    src = spark.createDataFrame([(1, "MINE", "d1")], SCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       optimistic=True, _test_before_commit=compete)
    assert stats.commit_retries == 0
    assert stats.updated == 1
    assert _rows(spark, path) == {
        (1, "MINE", "d1"), (2, "b", "d1"), (3, "THEIRS", "d2"), (4, "d", "d2"),
        (5, "e", "d3"), (6, "f", "d3"),
    }
    assert M.mismatches(path) == []
    assert _no_orphans(path)


def test_new_partition_collision_is_a_conflict(spark, tmp_path):
    """Both writers insert into the same NOT-YET-EXISTING partition:
    the second to commit must see the dir appeared since its snapshot
    (absence→presence flip) and retry — otherwise its staged dir would
    REPLACE the winner's rows instead of merging with them."""
    path = str(tmp_path / "t")
    _target(spark, path)

    def compete(attempt):
        if attempt == 0:
            other = spark.createDataFrame([(100, "theirs", "d9")], SCHEMA)
            merge_into(spark, path, other, keys=["k"], partition_col="day")

    src = spark.createDataFrame([(200, "mine", "d9")], SCHEMA)
    stats = merge_into(spark, path, src, keys=["k"], partition_col="day",
                       optimistic=True, _test_before_commit=compete)
    assert stats.commit_retries == 1
    rows = _rows(spark, path)
    assert (100, "theirs", "d9") in rows  # winner's row NOT clobbered
    assert (200, "mine", "d9") in rows
    assert M.mismatches(path) == []


def test_conflict_exhaustion_raises_table_intact(spark, tmp_path):
    """A writer that loses every attempt raises ConcurrentWriteConflict
    with the table reflecting only the competitors' commits and no
    staging residue."""
    path = str(tmp_path / "t")
    _target(spark, path)
    laps = {"n": 0}

    def always_compete(attempt):
        laps["n"] += 1
        other = spark.createDataFrame(
            [(50 + laps["n"], f"w{laps['n']}", "d1")], SCHEMA
        )
        merge_into(spark, path, other, keys=["k"], partition_col="day")

    src = spark.createDataFrame([(2, "never", "d1")], SCHEMA)
    with pytest.raises(ConcurrentWriteConflict, match="day=d1"):
        merge_into(spark, path, src, keys=["k"], partition_col="day",
                   optimistic=True, max_commit_retries=2,
                   _test_before_commit=always_compete)
    assert laps["n"] == 3  # one competitor per attempt
    rows = _rows(spark, path)
    assert (2, "b", "d1") in rows  # our update never landed
    assert {(51, "w1", "d1"), (52, "w2", "d1"), (53, "w3", "d1")} <= rows
    assert M.mismatches(path) == []
    assert _no_orphans(path)


def test_optimistic_rejects_moved_key_mode(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    src = spark.createDataFrame([(1, "x", "d2")], SCHEMA)
    with pytest.raises(ValueError, match="prune_with_source_partitions"):
        merge_into(spark, path, src, keys=["k"], partition_col="day",
                   optimistic=True, prune_with_source_partitions=False)


def test_recovery_sweep_spares_live_other_writer(spark, tmp_path):
    """A journal-less staging dir owned by a LIVE other process is an
    in-flight optimistic commit, not garbage: recovery must skip it —
    while a dead owner's dir is still reclaimed."""
    from grader_etl_spark.plans.merge import recover

    path = str(tmp_path / "t")
    _target(spark, path)
    # a live "other process": this test's child sleeps while we recover
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        live = f"{path}.merge-staging-{child.pid}-aaaaaaaaaaaa"
        os.makedirs(os.path.join(live, "day=d1"))
        dead = f"{path}.merge-staging-99999999-bbbbbbbbbbbb"
        os.makedirs(os.path.join(dead, "day=d1"))
        legacy = f"{path}.merge-staging-x"
        os.makedirs(legacy)
        recover(path)
        assert os.path.isdir(live)  # live owner: spared
        assert not os.path.isdir(dead)  # dead owner: reclaimed
        assert not os.path.isdir(legacy)  # pid-less legacy: reclaimed
    finally:
        child.kill()
        child.wait()


_CHILD = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, __REPO__)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from grader_etl_spark.session import get_spark
    from grader_etl_spark.plans.merge import merge_into

    path, day, lo, laps = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    spark = get_spark(app_name="opt-writer-" + day)
    spark.sparkContext.setLogLevel("ERROR")
    retries = 0
    for lap in range(laps):
        src = spark.createDataFrame(
            [(lo + lap * 10 + i, "p%s-l%d-%d" % (day, lap, i), day) for i in range(3)],
            "k int, v string, day string",
        )
        st = merge_into(spark, path, src, keys=["k"], partition_col="day",
                        optimistic=True, max_commit_retries=20)
        retries += st.commit_retries
    print(json.dumps({"retries": retries}))
""")


# two-process race soak: multi-minute, scale-audit tier (pytest.ini)
@pytest.mark.scale_audit
def test_two_process_disjoint_and_overlapping_race(spark, tmp_path):
    """The real thing: two separate Spark processes run optimistic
    merge laps concurrently — first into DISJOINT partitions (both
    must succeed; disjointness means conflicts are possible only via
    shared-nothing noise), then into the SAME partition (the losers
    retry; every row from both writers must survive). Final state
    verifies against the manifest with no orphan staging."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = str(tmp_path / "t")
    _target(spark, path)

    def run_pair(day_a, day_b, lo_a, lo_b, laps):
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _CHILD.replace("__REPO__", repr(repo)), path, day, str(lo), str(laps)],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
            for day, lo in ((day_a, lo_a), (day_b, lo_b))
        ]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), outs
        import json as _json

        return [_json.loads(o.strip().splitlines()[-1]) for o in outs]

    # disjoint partitions: d1 vs d2, 3 laps each
    run_pair("d1", "d2", 1000, 2000, 3)
    rows = _rows(spark, path)
    for lap in range(3):
        for i in range(3):
            assert (1000 + lap * 10 + i, f"pd1-l{lap}-{i}", "d1") in rows
            assert (2000 + lap * 10 + i, f"pd2-l{lap}-{i}", "d2") in rows

    # overlapping: both hammer d3 with different keys
    run_pair("d3", "d3", 3000, 4000, 3)
    spark.catalog.refreshByPath(path)
    rows = _rows(spark, path)
    for lap in range(3):
        for i in range(3):
            assert (3000 + lap * 10 + i, f"pd3-l{lap}-{i}", "d3") in rows
            assert (4000 + lap * 10 + i, f"pd3-l{lap}-{i}", "d3") in rows
    assert M.mismatches(path) == []
    assert _no_orphans(path)
