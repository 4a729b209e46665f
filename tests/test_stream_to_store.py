"""End-to-end streaming ingestion: file stream -> watermarked keyed
dedup -> foreachBatch idempotent append into the date-partitioned
ParquetStore — the production replacement for the reference's
re-polled batch ingest (SURVEY.md §2.8), wired through the same store
the batch pipeline uses.
"""

from __future__ import annotations

import datetime as dt

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
