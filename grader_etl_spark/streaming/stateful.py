"""Custom stateful streaming operator (``applyInPandasWithState`` —
the Structured Streaming escape hatch the brief names for operators
watermark+window can't express).

The example operator is a per-user running profile: cumulative attempt
count, success count, and last-seen timestamp, emitted once per
micro-batch per active user — the streaming materialization of the
reference's per-user accumulation that its daily report re-computes
from scratch each run (/root/reference/main.py:278-289).

State design (the part that must survive 100 TB / 1000 executors):
state is keyed by user_id, holds three scalars (not the event
history), and is evicted after STATE_TTL of inactivity via the
processing-time timeout — bounded state, no unbounded growth.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_TTL_MS = 7 * 24 * 3600 * 1000  # the reference's 7-day horizon

_STATE_SCHEMA = StructType(
    [
        StructField("n_attempts", LongType()),
        StructField("n_success", LongType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("n_attempts", LongType()),
        StructField("n_success", LongType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _make_update_profile(ttl: bool):
    def update_profile(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_attempts, n_success = state.get if state.exists else (0, 0)
        last_seen: Any = None
        for pdf in batches:
            n_attempts += len(pdf)
            n_success += int(pdf["is_correct"].fillna(False).sum())
            batch_max = pdf["event_timestamp"].max()
            last_seen = batch_max if last_seen is None else max(last_seen, batch_max)
        state.update((n_attempts, n_success))
        if ttl:
            state.setTimeoutDuration(STATE_TTL_MS)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_attempts": [n_attempts],
                "n_success": [n_success],
                "last_seen": [last_seen],
            }
        )

    return update_profile


def user_profile_stream(events: DataFrame, ttl: bool = False) -> DataFrame:
    """Stateful per-user profile over a stream of attempt events
    (columns: user_id, event_timestamp, is_correct). Emits the updated
    profile for every user seen in each micro-batch.

    ``ttl=True`` arms the 7-day processing-time state eviction — the
    production mode for a continuously-triggered query (bounded state
    at 100 TB). Leave it False under Trigger.AvailableNow: a
    processing-time timeout makes the availableNow run WAIT for
    timeouts to fire before terminating, which deadlocks a drain-and-
    stop batch (observed as a never-returning awaitTermination)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(ttl),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if ttl else GroupStateTimeout.NoTimeout
        ),
    )
