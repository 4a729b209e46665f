"""End-to-end batch pipeline parity (plans/pipeline.py vs
/root/reference/main.py:421-453): transform gates, idempotent
redelivery, report values, sheet/email renderings.
"""

from __future__ import annotations

from grader_etl_spark.plans.pipeline import (
    CollectingSink,
    ParquetStore,
    run_pipeline,
    transform,
)

RAW_SCHEMA = (
    "lti_user_id string, passback_params string, is_correct boolean, "
    "attempt_type string, created_at string"
)

BATCH_1 = [
    ("u1", '{"oauth_consumer_key": "ok1"}', True, "run", "2024-01-15T10:00:00"),
    ("u1", "{'oauth_consumer_key': 'ok1b'}", False, "check", "2024-01-15T11:00:00"),
    ("u2", None, None, "run", "2024-01-15T12:00:00"),
    ("", "{}", True, "run", "2024-01-15T13:00:00"),  # dropped: empty user
    ("u3", "{}", True, "check", "not-a-timestamp"),  # dropped: bad ts
]

# Overlapping redelivery (same u1@10:00 key, different payload) + one new row.
BATCH_2 = [
    ("u1", '{"oauth_consumer_key": "DIFFERENT"}', False, "check", "2024-01-15T10:00:00"),
    ("u4", '{"lis_result_sourcedid": "sid"}', True, "run", "2024-01-15T14:00:00"),
]


def test_transform_gates_and_extraction(spark):
    valid, quarantine = transform(spark.createDataFrame(BATCH_1, RAW_SCHEMA))
    v = {r["user_id"]: r for r in valid.collect()}
    assert set(v) == {"u1", "u2"}  # u1 twice collapses to dict, check below
    assert valid.count() == 3
    assert quarantine.count() == 2
    ok1 = [r for r in valid.collect() if r["oauth_consumer_key"] == "ok1"]
    assert len(ok1) == 1 and ok1[0]["is_correct"] is True
    # Python-literal passback syntax must extract too (main.py:94-101).
    assert any(r["oauth_consumer_key"] == "ok1b" for r in valid.collect())
    # None is_correct passes through as NULL (main.py:142-145).
    assert v["u2"]["is_correct"] is None


def test_pipeline_idempotent_redelivery_and_report(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "statistics"))
    mirror, report_sink, emails = CollectingSink(), CollectingSink(), []

    row1 = run_pipeline(
        spark.createDataFrame(BATCH_1, RAW_SCHEMA),
        store,
        report_date="2024-01-15",
        raw_mirror=mirror,
        report_sink=report_sink,
        notify=emails.append,
    )
    assert row1["total_attempts"] == 3
    assert row1["successful_attempts"] == 1
    assert row1["unique_users"] == 2
    assert row1["run_attempts"] == 2 and row1["check_attempts"] == 1

    # Redelivery: the overlapping key must NOT be replaced (first writer
    # wins — main.py:202); the new row must land.
    row2 = run_pipeline(
        spark.createDataFrame(BATCH_2, RAW_SCHEMA),
        store,
        report_date="2024-01-15",
        notify=emails.append,
    )
    assert row2["total_attempts"] == 4
    stored = {r["user_id"]: r for r in store.read().collect()}
    assert stored["u1"] is not None
    u1_10am = [
        r
        for r in store.read().collect()
        if r["user_id"] == "u1" and r["event_timestamp"].hour == 10
    ]
    assert len(u1_10am) == 1 and u1_10am[0]["oauth_consumer_key"] == "ok1"
    assert "u4" in stored

    # Running batch 2 again changes nothing (idempotence).
    row3 = run_pipeline(
        spark.createDataFrame(BATCH_2, RAW_SCHEMA), store, report_date="2024-01-15"
    )
    assert row3["total_attempts"] == 4

    # Renderings: sheet rows unpivot the report; email formats the %.
    assert mirror.rows is not None and len(mirror.rows) == 3
    metrics = {r[1]: r[2] for r in report_sink.rows}
    assert metrics["Total Attempts"] == "3"
    assert metrics["Success Percentage"] == "33.33"
    assert "Success Percentage: 33.33%" in emails[0]
    # Report runs even for an empty batch (main.py:441 sequencing).
    empty = spark.createDataFrame([], RAW_SCHEMA)
    row4 = run_pipeline(empty, store, report_date="2024-01-16")
    assert row4["total_attempts"] == 0 and row4["success_percentage"] == 0.0


def test_concurrent_appends_preserve_first_writer_wins(spark, tmp_path):
    """Two writers appending interleaved batches with overlapping keys
    must never land a key twice: the store lock serializes the
    snapshot-read -> anti-join -> append critical section, so whichever
    writer commits second sees the first's keys. Which payload
    survives a contested key depends on arrival order (both orders are
    first-writer-wins-legal); uniqueness and completeness must not."""
    import datetime as dt
    from concurrent.futures import ThreadPoolExecutor

    from grader_etl_spark.plans.pipeline import DEDUP_KEYS

    store = ParquetStore(spark, str(tmp_path / "stats_concurrent"))
    stats_schema = (
        "user_id string, oauth_consumer_key string, lis_result_sourcedid string, "
        "lis_outcome_service_url string, is_correct boolean, attempt_type string, "
        "event_timestamp timestamp"
    )
    t0 = dt.datetime(2024, 1, 15, 10, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [
                (u, payload, None, None, True, "run", t0 + dt.timedelta(minutes=m))
                for u, payload, m in rows
            ],
            stats_schema,
        )

    # 6 contested keys (same user/ts, different payload) + 4 unique each.
    a = mk([("u%d" % i, "A", i) for i in range(6)] + [("a%d" % i, "A", i) for i in range(4)])
    b = mk([("u%d" % i, "B", i) for i in range(6)] + [("b%d" % i, "B", i) for i in range(4)])

    with ThreadPoolExecutor(max_workers=2) as ex:
        for f in [ex.submit(store.idempotent_append, a), ex.submit(store.idempotent_append, b)]:
            f.result()

    rows = store.read().collect()
    keys = [(r["user_id"], r["event_timestamp"]) for r in rows]
    assert len(keys) == len(set(keys)) == 14  # 6 contested once each + 8 unique
    # Every contested key holds exactly one of the two candidate payloads,
    # and each writer's unique keys all landed.
    for r in rows:
        assert r["oauth_consumer_key"] in ("A", "B")
    assert {k for k, _ in keys} == {f"u{i}" for i in range(6)} | {
        f"a{i}" for i in range(4)
    } | {f"b{i}" for i in range(4)}


def test_store_lock_times_out_on_live_holder(spark, tmp_path):
    import pytest

    from grader_etl_spark.plans.pipeline import _store_lock

    path = str(tmp_path / "locked_store")
    with _store_lock(path):
        # Same-process holder is alive, so no reap — a second writer
        # must wait out its timeout, not steal the lock.
        with pytest.raises(TimeoutError, match="LIVE process"):
            with _store_lock(path, timeout=0.3):
                pass


def test_dead_writer_lock_is_reaped_and_append_recovers(spark, tmp_path):
    """Kill a writer while it HOLDS the store lock: the next writer
    must reap the dead holder's lock immediately (no timeout, no
    manual cleanup) and the recovered store must still enforce
    first-writer-wins on a contested key."""
    import datetime as dt
    import os
    import subprocess
    import sys
    import time as _t

    from grader_etl_spark.plans.pipeline import DEDUP_KEYS, _store_lock

    path = str(tmp_path / "crash_store")
    code = (
        f"import sys; sys.path.insert(0, {os.getcwd()!r})\n"
        "from grader_etl_spark.plans.pipeline import _store_lock\n"
        "import time\n"
        f"with _store_lock({path!r}):\n"
        "    print('HELD', flush=True)\n"
        "    time.sleep(300)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    try:
        assert proc.stdout.readline().strip() == "HELD"
    finally:
        proc.kill()
    proc.wait()
    assert os.path.exists(path + ".lock")  # crash left the lock behind

    t0 = _t.monotonic()
    with _store_lock(path, timeout=30):
        took = _t.monotonic() - t0
    assert took < 5, f"reap took {took:.1f}s — waited instead of reaping"

    # Post-recovery appends behave exactly as before the crash.
    store = ParquetStore(spark, path)
    stats_schema = (
        "user_id string, oauth_consumer_key string, lis_result_sourcedid string, "
        "lis_outcome_service_url string, is_correct boolean, attempt_type string, "
        "event_timestamp timestamp"
    )
    ts = dt.datetime(2024, 1, 15, 10, 0, 0)
    first = spark.createDataFrame([("u1", "A", None, None, True, "run", ts)], stats_schema)
    second = spark.createDataFrame([("u1", "B", None, None, False, "check", ts)], stats_schema)
    store.idempotent_append(first)
    store.idempotent_append(second)
    rows = store.read().collect()
    assert len(rows) == 1 and rows[0]["oauth_consumer_key"] == "A"
    assert not os.path.exists(path + ".lock")


def test_ingest_metrics_ride_the_append_job(spark, tmp_path):
    """Observed ingest counters (batch_rows / quarantined_rows /
    null_is_correct) come back exact from the append job itself — the
    quarantine branch is never counted with a second scan."""
    store = ParquetStore(spark, str(tmp_path / "obs_store"))
    metrics: dict = {}
    run_pipeline(
        spark.createDataFrame(BATCH_1, RAW_SCHEMA),
        store,
        "2024-01-15",
        metrics_out=metrics,
    )
    assert metrics == {
        "batch_rows": 5,
        "quarantined_rows": 2,
        "null_is_correct": 1,
    }
