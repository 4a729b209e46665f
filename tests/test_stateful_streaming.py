"""applyInPandasWithState operator: per-user running profile over two
micro-batches — counts accumulate across batches via the state store,
not by re-reading history."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from grader_etl_spark.streaming.jobs import file_stream
from grader_etl_spark.streaming.stateful import user_profile_stream

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("event_timestamp", TimestampType()),
        StructField("is_correct", BooleanType()),
    ]
)

T0 = dt.datetime(2024, 1, 15, 10, 0, 0)


def _run_batch(spark, landing, name):
    # foreachBatch (not the memory sink): it supports checkpoint
    # recovery, which is what carries the state store across the two
    # availableNow runs — the production sink shape.
    rows: list = []

    def sink(batch_df, _batch_id):
        rows.extend(batch_df.collect())

    q = (
        user_profile_stream(file_stream(spark, landing, SCHEMA))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", landing + "/_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["user_id"]: r for r in rows}


def test_state_accumulates_across_microbatches(spark, tmp_path):
    landing = str(tmp_path / "landing")

    spark.createDataFrame(
        [("u1", T0, True), ("u1", T0 + dt.timedelta(minutes=1), False), ("u2", T0, True)],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(landing)
    out1 = _run_batch(spark, landing, "profiles_1")
    assert out1["u1"]["n_attempts"] == 2 and out1["u1"]["n_success"] == 1
    assert out1["u2"]["n_attempts"] == 1

    # Second batch: state (not input re-read) carries the old counts.
    spark.createDataFrame(
        [("u1", T0 + dt.timedelta(hours=1), True)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(landing)
    out2 = _run_batch(spark, landing, "profiles_2")
    assert out2["u1"]["n_attempts"] == 3 and out2["u1"]["n_success"] == 2
    assert out2["u1"]["last_seen"] == T0 + dt.timedelta(hours=1)
    # u2 had no new events -> not re-emitted in update mode.
    assert "u2" not in out2
