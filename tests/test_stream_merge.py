"""Streaming UPSERT (streaming/jobs.upsert_stream = foreachBatch +
copy-on-write merge): last-writer-wins semantics across micro-batches,
in-batch version collapse, and kill-and-restart exactly-once — the
update-semantics twin of tests/test_stream_to_store.py's insert-only
crash-recovery proof."""

from __future__ import annotations

import datetime as dt

import pytest

from grader_etl_spark.streaming.jobs import file_stream, upsert_stream

SCHEMA_STR = "k int, v string, ts timestamp, day string"
T0 = dt.datetime(2024, 1, 15, 10, 0, 0)


def _schema(spark):
    return spark.createDataFrame([], SCHEMA_STR).schema


def _land(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA_STR).coalesce(1).write.mode("append").parquet(path)


def _run(spark, landing, table, chk):
    q = upsert_stream(
        file_stream(spark, landing, _schema(spark), max_files_per_trigger=1),
        table, keys=["k"], partition_col="day", order_col="ts", checkpoint=chk,
    )
    q.awaitTermination()


def _rows(spark, table):
    return {(r.k, r.v, r.day) for r in spark.read.parquet(table).collect()}


def test_upsert_stream_last_writer_wins(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    # batch 1: k1 v1, k2; batch 2: k1 -> v2 (update), k3 with TWO
    # in-batch versions (later ts must win the collapse)
    _land(spark, landing, [(1, "v1", T0, "d1"), (2, "b", T0, "d1")])
    _land(spark, landing, [
        (1, "v2", T0 + dt.timedelta(hours=1), "d1"),
        (3, "old", T0, "d2"),
        (3, "new", T0 + dt.timedelta(hours=2), "d2"),
    ])
    _run(spark, landing, table, str(tmp_path / "chk"))
    assert _rows(spark, table) == {(1, "v2", "d1"), (2, "b", "d1"), (3, "new", "d2")}


def test_upsert_stream_crash_and_restart_exactly_once(spark, tmp_path):
    """Crash after micro-batch 2's MERGE commit but before its stream
    checkpoint commit (the worst window), restart on the same
    checkpoint, and require the final table to equal an uninterrupted
    run — the replayed merge must be a semantic no-op."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from grader_etl_spark.plans.merge import merge_into

    batches = [
        [(1, "v1", T0, "d1"), (2, "b", T0, "d1")],
        [(1, "v2", T0 + dt.timedelta(hours=1), "d1"), (3, "c", T0, "d2")],
        [(2, "b2", T0 + dt.timedelta(hours=3), "d1"), (4, "d", T0, "d3")],
    ]

    def land_all(path):
        for rows in batches:
            _land(spark, path, rows)

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    chk = str(tmp_path / "chk")
    land_all(landing)

    seen = {"n": 0}

    def crashing_sink(batch, _bid):
        merge_into(batch.sparkSession, table, batch, keys=["k"], partition_col="day")
        seen["n"] += 1
        if seen["n"] == 2:
            raise RuntimeError("injected crash")

    q = (
        file_stream(spark, landing, _schema(spark), max_files_per_trigger=1)
        .writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    assert seen["n"] == 2

    # restart on the SAME checkpoint: batch 2 replays (uncommitted),
    # batch 3 drains — through the real upsert_stream sink this time.
    _run(spark, landing, table, chk)

    # uninterrupted ground truth
    landing2, table2 = str(tmp_path / "landing2"), str(tmp_path / "table2")
    land_all(landing2)
    _run(spark, landing2, table2, str(tmp_path / "chk2"))

    assert _rows(spark, table) == _rows(spark, table2) == {
        (1, "v2", "d1"), (2, "b2", "d1"), (3, "c", "d2"), (4, "d", "d3"),
    }


def test_upsert_stream_cdc_delete_markers(spark, tmp_path):
    """op_col tombstones: the latest op per key wins the in-batch
    collapse (upsert-then-delete deletes; delete-then-upsert keeps),
    deletes remove rows, and a later batch can re-insert a deleted
    key."""
    schema = "k int, v string, ts timestamp, day string, op string"
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")

    def land(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(landing)

    t = lambda h: T0 + dt.timedelta(hours=h)  # noqa: E731
    land([(1, "a", t(0), "d1", "upsert"), (2, "b", t(0), "d1", "upsert")])
    land([
        (1, None, t(1), "d1", "delete"),               # plain delete
        (2, "b2", t(1), "d1", "upsert"),               # upsert...
        (2, None, t(2), "d1", "delete"),               # ...then delete: gone
        (3, "c", t(1), "d2", "delete"),                # delete...
        (3, "c2", t(2), "d2", "upsert"),               # ...then upsert: kept
    ])
    land([(1, "back", t(3), "d1", "upsert")])          # re-insert after delete

    q = upsert_stream(
        file_stream(spark, landing, spark.createDataFrame([], schema).schema,
                    max_files_per_trigger=1),
        table, keys=["k"], partition_col="day", order_col="ts",
        checkpoint=str(tmp_path / "chk"), op_col="op",
    )
    q.awaitTermination()

    got = {(r.k, r.v, r.day) for r in spark.read.parquet(table).collect()}
    assert got == {(1, "back", "d1"), (3, "c2", "d2")}
    assert "op" not in spark.read.parquet(table).columns


def test_upsert_stream_moved_key_with_unpruned_mode(spark, tmp_path):
    """A feed that can move keys between partitions (status-partitioned
    table) must run unpruned, else the old row survives as a
    duplicate; the passthrough makes the relocation atomic per batch."""
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    _land(spark, landing, [(1, "open", T0, "d1"), (2, "x", T0, "d2")])
    _land(spark, landing, [(1, "closed", T0 + dt.timedelta(hours=1), "d2")])

    q = upsert_stream(
        file_stream(spark, landing, _schema(spark), max_files_per_trigger=1),
        table, keys=["k"], partition_col="day", order_col="ts",
        checkpoint=str(tmp_path / "chk"),
        prune_with_source_partitions=False,
    )
    q.awaitTermination()
    rows = _rows(spark, table)
    assert rows == {(1, "closed", "d2"), (2, "x", "d2")}
    assert sum(1 for k, _, _ in rows if k == 1) == 1  # no duplicate across partitions


def test_upsert_stream_clause_passthrough_multi_col_newer_wins(spark, tmp_path):
    """Round-7 passthrough: a CDC feed into a (day, src)-partitioned
    table where stale replays must LOSE — partition_cols +
    when_matched_condition flow through foreachBatch into merge_into.
    Batch 2 carries an out-of-order stale row for k1 (older ts) that
    must not clobber batch 1's newer value."""
    schema = "k int, v string, ts timestamp, day string, src string"
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")

    def land(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(landing)

    t = lambda h: T0 + dt.timedelta(hours=h)  # noqa: E731
    land([(1, "new", t(5), "d1", "web"), (2, "b", t(0), "d1", "app")])
    land([(1, "stale", t(1), "d1", "web"),     # out-of-order replay: loses
          (2, "b2", t(2), "d1", "app"),        # genuinely newer: wins
          (3, "c", t(0), "d2", "web")])        # fresh insert

    q = upsert_stream(
        file_stream(spark, landing, spark.createDataFrame([], schema).schema,
                    max_files_per_trigger=1),
        table, keys=["k"], partition_cols=["day", "src"], order_col="ts",
        checkpoint=str(tmp_path / "chk"),
        when_matched_condition="s.ts > t.ts",
    )
    q.awaitTermination()
    got = {(r.k, r.v, r.day, r.src) for r in spark.read.parquet(table).collect()}
    assert got == {(1, "new", "d1", "web"), (2, "b2", "d1", "app"),
                   (3, "c", "d2", "web")}
    import os
    assert os.path.isdir(os.path.join(table, "day=d1", "src=web"))
