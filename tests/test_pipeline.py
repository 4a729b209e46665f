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
