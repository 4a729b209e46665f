"""End-to-end streaming ingestion: file stream -> watermarked keyed
dedup -> foreachBatch idempotent append into the date-partitioned
ParquetStore — the production replacement for the reference's
re-polled batch ingest (SURVEY.md §2.8), wired through the same store
the batch pipeline uses.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from grader_etl_spark.plans.pipeline import ParquetStore
from grader_etl_spark.streaming.jobs import deduplicated_stream, file_stream

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("event_timestamp", TimestampType()),
        StructField("attempt_type", StringType()),
        StructField("is_correct", BooleanType()),
        StructField("oauth_consumer_key", StringType()),
        StructField("lis_result_sourcedid", StringType()),
        StructField("lis_outcome_service_url", StringType()),
    ]
)

T0 = dt.datetime(2024, 1, 15, 10, 0, 0)


def _ingest(spark, landing, store):
    stream = deduplicated_stream(file_stream(spark, landing, SCHEMA))
    q = (
        stream.writeStream.foreachBatch(lambda batch, _id: store.idempotent_append(batch))
        .option("checkpointLocation", landing + "/_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# crash-recovery soak: multi-minute, scale-audit tier (pytest.ini)
@pytest.mark.scale_audit
def test_stream_restart_recovers_exactly_once_from_checkpoint(spark, tmp_path):
    """Kill the watermarked dedup stream MID-REPLAY — after micro-batch
    k's store write but before its checkpoint commit, the worst crash
    window — then restart against the same checkpointLocation and
    landing dir and let availableNow drain the rest. The final store
    must equal a single uninterrupted run row-for-row: the replayed
    uncommitted batch may not duplicate (idempotent_append absorbs it)
    and no later batch may be lost. Exactly-once measured, not
    asserted."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    def row(user, ts, typ="run", ok=True):
        return (user, ts, typ, ok, None, None, None)

    # Four single-file deliveries -> four micro-batches under
    # maxFilesPerTrigger=1; includes a cross-batch duplicate key (u1)
    # and an in-batch duplicate key (u5).
    batches = [
        [row("u1", T0), row("u2", T0 + dt.timedelta(hours=1), "check", False)],
        [row("u1", T0, "check", False), row("u3", T0 + dt.timedelta(days=1))],
        [row("u4", T0 + dt.timedelta(days=1, hours=2))],
        [row("u5", T0 + dt.timedelta(days=2)), row("u5", T0 + dt.timedelta(days=2))],
    ]

    def land(path: str) -> None:
        for rows in batches:
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)

    def start(landing: str, chk: str, sink) -> None:
        stream = deduplicated_stream(
            file_stream(spark, landing, SCHEMA, max_files_per_trigger=1)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    store = ParquetStore(spark, str(tmp_path / "stats"))
    land(landing)

    writes = {"n": 0}

    def crashing_sink(batch, _bid):
        store.idempotent_append(batch)  # sink write lands...
        writes["n"] += 1
        if writes["n"] == 2:
            raise RuntimeError("injected crash")  # ...its commit does not

    with pytest.raises(StreamingQueryException, match="injected crash"):
        start(landing, chk, crashing_sink)
    partial = store.read().count()
    assert writes["n"] == 2, "crash must hit after the 2nd micro-batch write"
    assert partial == 3, "two of four batches landed (u1, u2, u3)"

    # Restart against the SAME checkpoint + landing dir; batch 2 is
    # replayed (it never committed), batches 3-4 drain.
    start(landing, chk, lambda batch, _bid: store.idempotent_append(batch))

    # Single uninterrupted run for the ground truth.
    landing2 = str(tmp_path / "landing_single")
    store2 = ParquetStore(spark, str(tmp_path / "stats_single"))
    land(landing2)
    start(landing2, str(tmp_path / "chk_single"), lambda b, _bid: store2.idempotent_append(b))

    got = sorted(map(tuple, store.read().collect()))
    want = sorted(map(tuple, store2.read().collect()))
    assert got == want
    assert len(got) == 5  # u1..u5 exactly once


def test_stream_ingest_idempotent_store(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = ParquetStore(spark, str(tmp_path / "statistics"))

    def row(user, ts, typ="run", ok=True):
        return (user, ts, typ, ok, None, None, None)

    spark.createDataFrame(
        [
            row("u1", T0),
            row("u1", T0),  # in-stream duplicate key -> dropped by watermark dedup
            row("u2", T0 + dt.timedelta(hours=1), "check", False),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(landing)
    _ingest(spark, landing, store)
    assert store.read().count() == 2

    # Second delivery: one overlap key (must not duplicate), one new.
    spark.createDataFrame(
        [
            row("u1", T0, "check", False),  # same (user, ts) -> ignored
            row("u3", T0 + dt.timedelta(days=1)),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(landing)
    _ingest(spark, landing, store)

    stored = store.read()
    assert stored.count() == 3
    u1 = stored.filter("user_id = 'u1'").collect()
    assert len(u1) == 1 and u1[0]["attempt_type"] == "run"  # first writer won
    # Partition layout: one event_date dir per day (pruning surface).
    dates = {r["event_date"] for r in stored.select("event_date").distinct().collect()}
    assert dates == {dt.date(2024, 1, 15), dt.date(2024, 1, 16)}
