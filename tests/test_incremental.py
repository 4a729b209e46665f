"""Incremental report maintenance (plans/incremental.py): the
differential invariant — after any sequence of overlapping batches,
the incrementally-maintained, partition-overwritten report table
equals a from-scratch recompute over the full store — plus the
partition-granularity guarantee (a batch only rewrites the report
dates it touches).
"""

from __future__ import annotations

from grader_etl_spark.plans.incremental import IncrementalReport, per_day_report
from grader_etl_spark.plans.pipeline import ParquetStore, transform

RAW_SCHEMA = (
    "lti_user_id string, passback_params string, is_correct boolean, "
    "attempt_type string, created_at string"
)

DAY1 = [
    ("u1", "{}", True, "run", "2024-01-15T10:00:00"),
    ("u2", "{}", False, "check", "2024-01-15T11:00:00"),
    ("u3", "{}", True, "run", "2024-01-15T12:00:00"),
]
DAY2_AND_REDELIVERY = [
    ("u1", "{}", False, "check", "2024-01-15T10:00:00"),  # dup key: must not change day 1
    ("u4", "{}", True, "run", "2024-01-16T09:00:00"),
    ("u5", "{}", None, "check", "2024-01-16T10:00:00"),
]
DAY2_MORE = [
    ("u6", "{}", True, "run", "2024-01-16T11:00:00"),
]


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(sorted(df.columns)).collect()
    )


def test_incremental_equals_full_recompute(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "stats"))
    inc = IncrementalReport(spark, store, str(tmp_path / "report"))
    for batch in (DAY1, DAY2_AND_REDELIVERY, DAY2_MORE):
        valid, _ = transform(spark.createDataFrame(batch, RAW_SCHEMA))
        inc.apply_batch(valid)
    full = per_day_report(store.read())
    assert _rows(inc.read()) == _rows(full)


def test_batch_touches_only_its_dates(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "stats"))
    inc = IncrementalReport(spark, store, str(tmp_path / "report"))
    valid1, _ = transform(spark.createDataFrame(DAY1, RAW_SCHEMA))
    assert [str(d) for d in inc.apply_batch(valid1)] == ["2024-01-15"]
    day1_before = _rows(inc.read().filter("event_date = '2024-01-15'"))
    valid3, _ = transform(spark.createDataFrame(DAY2_MORE, RAW_SCHEMA))
    assert [str(d) for d in inc.apply_batch(valid3)] == ["2024-01-16"]
    # Day-1 report rows are byte-identical: that partition was not rewritten.
    assert _rows(inc.read().filter("event_date = '2024-01-15'")) == day1_before
    assert inc.read().count() == 2


def test_redelivered_duplicates_do_not_change_report(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "stats"))
    inc = IncrementalReport(spark, store, str(tmp_path / "report"))
    valid1, _ = transform(spark.createDataFrame(DAY1, RAW_SCHEMA))
    inc.apply_batch(valid1)
    before = _rows(inc.read())
    inc.apply_batch(valid1)  # full redelivery: keyed idempotency absorbs it
    assert _rows(inc.read()) == before
