"""Versioned manifest commits (plans/manifest.py): every writer
publishes an atomic manifest as its LAST commit step, and manifest
readers (read_table / snapshot / locked_parquet_files) only ever plan
against a verified committed version — old or new, never the torn
mid-swap listing round 6 documented at plans/merge.py:37-41. The
reference has no analogue (single Postgres table, main.py:180-228);
this is the transaction-log piece of Delta/Iceberg re-expressed on a
plain filesystem."""

from __future__ import annotations

import json
import os

import duckdb
import pyspark.sql.functions as F
import pytest

from grader_etl_spark.plans import manifest as M
from grader_etl_spark.plans.merge import _InjectedCrash, merge_into

SCHEMA = "k int, v string, day string"


def _target(spark, path) -> None:
    rows = [
        (1, "a", "d1"), (2, "b", "d1"),
        (3, "c", "d2"), (4, "d", "d2"),
        (5, "e", "d3"), (6, "f", "d3"),
    ]
    spark.createDataFrame(rows, SCHEMA).write.partitionBy("day").parquet(path)


def _rows(df) -> set[tuple]:
    return {(r.k, r.v, r.day) for r in df.collect()}


def test_merge_publishes_versioned_manifest(spark, tmp_path):
    path = str(tmp_path / "t")
    src = spark.createDataFrame([(1, "a", "d1"), (2, "b", "d2")], SCHEMA)
    merge_into(spark, path, src, keys=["k"], partition_col="day")
    man = M.load_manifest(path)
    assert man is not None and man["version"] == 1
    assert set(man["partitions"]) == {"day=d1", "day=d2"}
    assert M.mismatches(path) == []

    merge_into(spark, path, spark.createDataFrame([(3, "c", "d2")], SCHEMA),
               keys=["k"], partition_col="day")
    man2 = M.load_manifest(path)
    assert man2["version"] == 2
    # only the touched partition's nonce changed
    assert man2["partitions"]["day=d1"] == man["partitions"]["day=d1"]
    assert man2["partitions"]["day=d2"] != man["partitions"]["day=d2"]
    # atomic publish leaves no tmp residue, and the manifest is
    # invisible to both engines' scans
    assert not [n for n in os.listdir(path) if n.startswith("_manifest.json.tmp")]
    assert spark.read.parquet(path).count() == 3
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}/*/*.parquet', hive_partitioning=1)"
    ).fetchone()[0]
    assert n == 3


def test_read_table_adopts_legacy_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)  # plain Spark write: no manifest, no markers
    assert M.load_manifest(path) is None
    df = M.read_table(spark, path)
    assert df.count() == 6
    man = M.load_manifest(path)
    assert man["version"] == 1 and len(man["partitions"]) == 3
    assert M.mismatches(path) == []


def test_reader_vs_mid_swap_crash_sees_old_or_new_never_mixed(spark, tmp_path):
    """THE race the manifest exists for: a writer dies mid-swap (one
    partition renamed in, the other not). A plain directory-listing
    read at that moment sees a MIXED table; read_table must instead
    roll the journaled commit forward and return exactly the new
    committed version."""
    path = str(tmp_path / "t")
    _target(spark, path)
    merge_into(spark, path, spark.createDataFrame([(9, "z", "d3")], SCHEMA),
               keys=["k"], partition_col="day")  # adopt under manifest
    src = spark.createDataFrame([(3, "C2", "d2"), (1, "A2", "d1")], SCHEMA)
    with pytest.raises(_InjectedCrash):
        merge_into(spark, path, src, keys=["k"], partition_col="day",
                   _crash_after_swaps=2)
    # torn on disk: journal pending, verification fails loudly
    assert os.path.exists(path + ".merge-journal")
    assert M.mismatches(path) != []
    # the naive reader CAN see a mix (this is the documented window) —
    # d1 swapped, d2 not (or vice versa); don't assert which, only
    # that the manifest reader never returns it:
    got = _rows(M.read_table(spark, path))
    assert got == {
        (1, "A2", "d1"), (2, "b", "d1"),
        (3, "C2", "d2"), (4, "d", "d2"),
        (5, "e", "d3"), (6, "f", "d3"), (9, "z", "d3"),
    }
    assert not os.path.exists(path + ".merge-journal")
    assert M.mismatches(path) == []


def test_crash_before_any_swap_reader_sees_old_version(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    before = _rows(M.read_table(spark, path))
    man_v = M.load_manifest(path)["version"]
    src = spark.createDataFrame([(3, "C2", "d2")], SCHEMA)
    with pytest.raises(_InjectedCrash):
        merge_into(spark, path, src, keys=["k"], partition_col="day",
                   _crash_after_swaps=0)
    # roll-forward completes the journaled commit: the reader gets the
    # NEW version (the journal is the commit point, not the swap)
    got = _rows(M.read_table(spark, path))
    assert got == (before - {(3, "c", "d2")}) | {(3, "C2", "d2")}
    assert M.load_manifest(path)["version"] > man_v


def test_mismatch_detection_classes(spark, tmp_path):
    path = str(tmp_path / "t")
    src = spark.createDataFrame([(1, "a", "d1"), (2, "b", "d2")], SCHEMA)
    merge_into(spark, path, src, keys=["k"], partition_col="day")
    assert M.mismatches(path) == []

    # unlisted dir on disk
    os.makedirs(os.path.join(path, "day=d9"))
    assert any("unlisted" in m for m in M.mismatches(path))
    os.rmdir(os.path.join(path, "day=d9"))

    # missing dir
    os.rename(os.path.join(path, "day=d2"), str(tmp_path / "stash"))
    assert any("missing" in m for m in M.mismatches(path))
    os.rename(str(tmp_path / "stash"), os.path.join(path, "day=d2"))

    # nonce mismatch (content replaced without a commit)
    M.mark_dir(os.path.join(path, "day=d1"), "deadbeef0000")
    assert any("nonce mismatch" in m for m in M.mismatches(path))


def test_snapshot_serializes_against_live_writer(spark, tmp_path):
    """snapshot() holds the store lock: every count it takes must be a
    COMMITTED total (base 6 rows + 2 per merge lap), even with a
    writer thread merging concurrently."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "t")
    _target(spark, path)

    def writer():
        for lap in range(4):
            src = spark.createDataFrame(
                [(100 + 2 * lap, "w", "d2"), (101 + 2 * lap, "w", "d4")], SCHEMA
            )
            merge_into(spark, path, src, keys=["k"], partition_col="day")

    valid = {6 + 2 * lap for lap in range(5)}
    counts = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(writer)
        while not fut.done():
            with M.snapshot(spark, path) as df:
                counts.append(df.count())
        fut.result()
    with M.snapshot(spark, path) as df:
        final = df.count()
    assert final == 14
    assert counts and all(c in valid for c in counts), counts


def test_locked_parquet_files_gives_sparkless_consistent_read(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    with M.locked_parquet_files(path) as files:
        assert files and all(f.endswith(".parquet") for f in files)
        n = duckdb.sql(
            "SELECT count(*) FROM read_parquet(?, hive_partitioning=1)", params=[files]
        ).fetchone()[0]
    assert n == 6


def test_append_and_retention_publish_through_manifest(spark, sf_dir, tmp_path):
    from grader_etl_spark.io import load
    from grader_etl_spark.plans.layout import PARTITION_COL, write_date_partitioned
    from grader_etl_spark.plans.retention import expire_before

    store = str(tmp_path / "store")
    write_date_partitioned(load(spark, sf_dir, "events"), store)
    df = M.read_table(spark, store)  # adopt
    v1 = M.load_manifest(store)["version"]
    total = df.count()

    days = sorted(
        n.split("=", 1)[1] for n in os.listdir(store) if n.startswith(f"{PARTITION_COL}=")
    )
    expire_before(spark, store, days[1])
    man = M.load_manifest(store)
    assert man["version"] == v1 + 1
    assert f"{PARTITION_COL}={days[0]}" not in man["partitions"]
    assert M.mismatches(store) == []
    assert M.read_table(spark, store).count() < total


def test_store_append_republishes(spark, tmp_path):
    from grader_etl_spark.plans.pipeline import ParquetStore

    path = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "run", "ck")],
        "user_id long, event_timestamp string, attempt_type string, oauth_consumer_key string",
    ).withColumn("event_timestamp", F.to_timestamp("event_timestamp"))
    store = ParquetStore(spark, path)
    store.idempotent_append(batch)
    man1 = M.load_manifest(path)
    assert man1 is not None and M.mismatches(path) == []
    store.idempotent_append(batch)  # idempotent no-new-rows append
    assert M.mismatches(path) == []


def test_journal_without_manifest_key_still_recovers(tmp_path):
    """Back-compat: a journal written by the pre-manifest merge (no
    'manifest' key) rolls forward without publishing anything."""
    from grader_etl_spark.plans.merge import recover

    path = str(tmp_path / "t")
    staging = path + ".merge-staging-x"
    os.makedirs(os.path.join(path, "day=a"))
    os.makedirs(os.path.join(staging, "day=a"))
    with open(os.path.join(staging, "day=a", "part.parquet"), "w") as f:
        f.write("new")
    journal = {"staging": staging, "trash": path + ".merge-trash-x",
               "swap": ["day=a"], "delete": []}
    with open(path + ".merge-journal", "w") as f:
        json.dump(journal, f)
    assert recover(path) is True
    assert open(os.path.join(path, "day=a", "part.parquet")).read() == "new"
    assert M.load_manifest(path) is None


def test_journal_less_drift_heals_instead_of_blocking(spark, tmp_path):
    """A crashed add-only append (files landed, republish didn't run)
    or an out-of-band writer leaves a mismatch with NO journal. Every
    engine rewrite commits through the journal, so this class is safe
    to HEAL: readers re-stamp + publish from disk instead of looping
    to timeout."""
    path = str(tmp_path / "t")
    merge_into(spark, path, spark.createDataFrame([(1, "a", "d1")], SCHEMA),
               keys=["k"], partition_col="day")
    v1 = M.load_manifest(path)["version"]

    # simulate the crashed append: a new partition dir full of data
    # with no manifest update
    spark.createDataFrame([(2, "b", "d2")], SCHEMA).coalesce(1) \
        .write.mode("append").partitionBy("day").parquet(path)
    assert M.mismatches(path) != []

    df = M.read_table(spark, path, timeout=10)
    assert _rows(df) == {(1, "a", "d1"), (2, "b", "d2")}
    assert M.load_manifest(path)["version"] > v1
    assert M.mismatches(path) == []

    # and a stale marker (content changed without republish) heals too
    M.mark_dir(os.path.join(path, "day=d1"), "feedfacefeed")
    # manifest now disagrees with the marker
    assert M.mismatches(path) != []
    assert _rows(M.read_table(spark, path, timeout=10)) == {(1, "a", "d1"), (2, "b", "d2")}
    assert M.mismatches(path) == []


def test_unhealable_table_fails_fast_not_timeout(spark, tmp_path, monkeypatch):
    """ADVICE r8 (low): when healing under the lock exhausts roll-
    forward, adoption, and journal-less republish and the table STILL
    does not verify, ensure_consistent must surface that terminal
    diagnostic immediately (TableInconsistentError) — not spin its
    50 ms retry loop for the full timeout and bury it in a generic
    TimeoutError."""
    import time as _time

    path = str(tmp_path / "t")
    _target(spark, path)
    M.ensure_consistent(path)  # adopt → verified

    # Drift the table, and disable the healing republish so the drift
    # is genuinely unhealable for this test.
    os.makedirs(os.path.join(path, "day=rogue"))
    open(os.path.join(path, "day=rogue", "_content-deadbeef0000"), "w").close()
    monkeypatch.setattr(M, "republish_changed", lambda *_a, **_k: None)

    t0 = _time.monotonic()
    with pytest.raises(M.TableInconsistentError, match="inconsistent under lock"):
        M.ensure_consistent(path, timeout=60.0)
    assert _time.monotonic() - t0 < 10.0  # fast-fail, not the 60 s spin
