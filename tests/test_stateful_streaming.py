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


class _FakeValueState:
    """Minimal ValueState stand-in for driving the v2 processor logic
    without the protobuf state server."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema, ttl_duration_ms=None):
        return self.state


def test_v2_processor_parity_with_v1_kernel():
    """UserProfileProcessor (transformWithStateInPandas rendition) must
    produce the same running profile as the v1 applyInPandasWithState
    kernel across two micro-batches of the same key."""
    import pandas as pd

    from grader_etl_spark.streaming.stateful import UserProfileProcessor

    t1 = pd.Timestamp("2024-01-15 10:00:00")
    t2 = pd.Timestamp("2024-01-15 12:00:00")
    b1 = pd.DataFrame(
        {"is_correct": [True, False, None], "event_timestamp": [t1, t1, t2]}
    )
    b2 = pd.DataFrame({"is_correct": [True], "event_timestamp": [t1]})

    proc = UserProfileProcessor()
    proc.init(_FakeHandle())
    (out1,) = list(proc.handleInputRows(("u1",), iter([b1]), None))
    assert out1.iloc[0][["n_attempts", "n_success"]].tolist() == [3, 1]
    assert out1.iloc[0]["last_seen"] == t2
    # second micro-batch: state carries over
    (out2,) = list(proc.handleInputRows(("u1",), iter([b2]), None))
    assert out2.iloc[0][["n_attempts", "n_success"]].tolist() == [4, 2]
    assert out2.iloc[0]["last_seen"] == t1  # max within THIS batch only


def test_v2_wiring_gates_cleanly_without_protobuf(spark):
    import pytest as _pytest

    import grader_etl_spark.streaming.stateful as st

    if st._HAS_PROTOBUF:
        _pytest.skip("protobuf present: the v2 wiring is runnable here")
    df = spark.createDataFrame(
        [], "user_id string, event_timestamp timestamp, is_correct boolean"
    )
    with _pytest.raises(NotImplementedError, match="protobuf"):
        st.user_profile_stream_v2(df)
