"""Structured Streaming jobs (streaming/jobs.py): watermarked keyed
dedup, tumbling daily report, and session windows, executed with an
availableNow trigger over a parquet landing directory — the test-sized
version of the production file-source topology.
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

from grader_etl_spark.streaming.jobs import (
    daily_tumbling_report,
    deduplicated_stream,
    file_stream,
    interval_join,
    rate_stream,
    run_to_memory_sink,
    session_activity,
    synthesize_events,
)

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("event_timestamp", TimestampType()),
        StructField("attempt_type", StringType()),
        StructField("is_correct", BooleanType()),
    ]
)

T0 = dt.datetime(2024, 1, 15, 10, 0, 0)


def _land(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def landing(spark, tmp_path):
    path = str(tmp_path / "landing")
    rows = [
        ("u1", T0, "run", True),
        ("u1", T0, "check", False),  # duplicate key — must be dropped
        ("u1", T0 + dt.timedelta(minutes=5), "check", False),
        ("u2", T0 + dt.timedelta(hours=2), "run", True),
        ("u2", T0 + dt.timedelta(days=1), "run", False),  # next day
    ]
    _land(spark, path, rows)
    return path


def test_streaming_dedup_drops_duplicate_keys(spark, landing):
    stream = deduplicated_stream(file_stream(spark, landing, SCHEMA))
    run_to_memory_sink(stream, "dedup_out")
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    keys = [(r["user_id"], r["event_timestamp"]) for r in rows]
    assert len(keys) == len(set(keys)) == 4  # 5 rows, 1 dup key


def test_streaming_daily_report(spark, landing):
    stream = daily_tumbling_report(
        deduplicated_stream(file_stream(spark, landing, SCHEMA))
    )
    # Append mode only emits closed windows; availableNow + watermark
    # won't close the final day, so use update-capable complete mode on
    # this tiny aggregate (production would let the watermark advance).
    run_to_memory_sink(stream, "daily_out", output_mode="complete")
    by_day = {r["report_date"]: r for r in spark.sql("SELECT * FROM daily_out").collect()}
    d1 = by_day["2024-01-15"]
    assert d1["total_attempts"] == 3
    assert d1["successful_attempts"] == 2
    assert d1["run_attempts"] == 2 and d1["check_attempts"] == 1
    assert by_day["2024-01-16"]["total_attempts"] == 1


def test_streaming_session_windows(spark, landing):
    stream = session_activity(
        deduplicated_stream(file_stream(spark, landing, SCHEMA)), gap="30 minutes"
    )
    run_to_memory_sink(stream, "sessions_out", output_mode="complete")
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    u1 = [r for r in rows if r["user_id"] == "u1"]
    # u1's two surviving events are 5 min apart -> one session of 2.
    assert len(u1) == 1 and u1[0]["n_events"] == 2
    # u2's events are 22h apart -> two sessions.
    assert len([r for r in rows if r["user_id"] == "u2"]) == 2


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked interval join (runs followed by checks within 1 h)
    equals the batch join with the identical condition."""
    run_path = str(tmp_path / "runs")
    check_path = str(tmp_path / "checks")
    runs = [
        ("u1", T0, "run", True),
        ("u2", T0 + dt.timedelta(hours=2), "run", True),
        ("u3", T0, "run", False),
    ]
    checks = [
        ("u1", T0 + dt.timedelta(minutes=10), "check", False),  # within 1 h of u1 run
        ("u1", T0 + dt.timedelta(hours=3), "check", True),      # too late
        ("u2", T0 + dt.timedelta(hours=2, minutes=30), "check", False),  # within
        ("u4", T0, "check", True),                              # no matching run
    ]
    _land(spark, run_path, runs)
    _land(spark, check_path, checks)

    joined = interval_join(
        file_stream(spark, run_path, SCHEMA), file_stream(spark, check_path, SCHEMA)
    )
    run_to_memory_sink(joined, "ij_out")
    got = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in spark.sql("SELECT * FROM ij_out").collect()
    }

    batch = interval_join(
        spark.read.schema(SCHEMA).parquet(run_path),
        spark.read.schema(SCHEMA).parquet(check_path),
    )
    want = {(r["user_id"], r["l_ts"], r["r_ts"]) for r in batch.collect()}
    assert got == want == {
        ("u1", T0, T0 + dt.timedelta(minutes=10)),
        ("u2", T0 + dt.timedelta(hours=2), T0 + dt.timedelta(hours=2, minutes=30)),
    }


def test_rate_source_chain_matches_batch(spark):
    """The generator-source (Kafka-twin) ingest through the SAME
    watermark+dedup+daily-report chain as the file topology must equal
    the batch computation over the identical tick set. rate-micro-batch
    with availableNow emits exactly one deterministic batch (values
    0..N-1), so the batch twin is spark.range(N) through the same
    synthesize_events mapping."""
    n = 500
    stream = daily_tumbling_report(
        deduplicated_stream(synthesize_events(rate_stream(spark, rows_per_batch=n)))
    )
    run_to_memory_sink(stream, "rate_daily_out", output_mode="complete")
    got = {
        r["report_date"]: r for r in spark.sql("SELECT * FROM rate_daily_out").collect()
    }

    batch = synthesize_events(spark.range(n).withColumnRenamed("id", "value"))
    want = {
        r["report_date"]: r
        for r in daily_tumbling_report(
            batch.dropDuplicates(["user_id", "event_timestamp"])
        ).collect()
    }
    assert set(got) == set(want) and len(got) >= 5  # ticks span ~5 days
    for day in want:
        for col in ("total_attempts", "successful_attempts", "run_attempts", "check_attempts"):
            assert got[day][col] == want[day][col], (day, col)


def test_rate_source_dedup_drops_synthetic_duplicates(spark):
    """Every 10th synthetic tick repeats the previous key, so the
    dedup stage must drop exactly that fraction."""
    n = 200
    stream = deduplicated_stream(synthesize_events(rate_stream(spark, rows_per_batch=n)))
    run_to_memory_sink(stream, "rate_dedup_out")
    rows = spark.sql("SELECT * FROM rate_dedup_out").collect()
    keys = {(r["user_id"], r["event_timestamp"]) for r in rows}
    assert len(rows) == len(keys) == n - n // 10


def test_enriched_stream_static_broadcast(spark, tmp_path):
    """Stream-static enrichment: every micro-batch row picks up its
    dimension attributes; the plan carries no streaming-state operator
    for the join (broadcast static side)."""
    from grader_etl_spark.streaming.jobs import enriched_stream

    path = str(tmp_path / "landing_enrich")
    _land(
        spark,
        path,
        [("u1", T0, "run", True), ("u2", T0, "check", False), ("u3", T0, "run", None)],
    )
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "silver")], "user_id string, tier string"
    )
    stream = file_stream(spark, path, SCHEMA)
    run_to_memory_sink(enriched_stream(stream, dim, on="user_id"), "enriched")
    rows = {r.user_id: r.tier for r in spark.sql("SELECT * FROM enriched").collect()}
    assert rows == {"u1": "gold", "u2": "silver", "u3": None}


def test_stream_stream_left_outer_interval_join_null_padding(spark, tmp_path):
    """leftOuter interval join: unmatched left rows are null-padded
    once the watermark passes left_ts + within; left rows still inside
    the watermark horizon at termination are withheld (a partner could
    still arrive) — the availableNow boundary the docstring pins."""
    run_path = str(tmp_path / "runs")
    check_path = str(tmp_path / "checks")
    far = T0 + dt.timedelta(days=10)  # watermark pusher on both sides
    runs = [
        ("u1", T0, "run", True),    # matched
        ("u3", T0, "run", False),   # unmatched, old -> null row
        ("u5", far, "run", True),   # unmatched but too new -> withheld
    ]
    checks = [
        ("u1", T0 + dt.timedelta(minutes=10), "check", False),
        ("u4", T0, "check", True),  # right-only: ignored in LEFT outer
        ("wm", far, "check", True),
    ]
    _land(spark, run_path, runs)
    _land(spark, check_path, checks)

    joined = interval_join(
        file_stream(spark, run_path, SCHEMA),
        file_stream(spark, check_path, SCHEMA),
        how="leftOuter",
    )
    run_to_memory_sink(joined, "oj_out")
    got = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in spark.sql("SELECT * FROM oj_out").collect()
    }
    assert got == {
        ("u1", T0, T0 + dt.timedelta(minutes=10)),
        ("u3", T0, None),
    }

    # Batch twin on identical inputs: every unmatched left appears
    # (no watermark horizon in batch) — streaming output is exactly
    # the batch output minus the withheld-by-horizon rows.
    batch = interval_join(
        spark.read.schema(SCHEMA).parquet(run_path),
        spark.read.schema(SCHEMA).parquet(check_path),
        how="leftOuter",
    )
    want = {(r["user_id"], r["l_ts"], r["r_ts"]) for r in batch.collect()}
    assert want == got | {("u5", far, None)}


def test_dedup_within_watermark_collapses_retried_keys(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the same business key re-emitted
    with DIFFERENT timestamps (an upstream retry) collapses to the
    first arrival — the case dropDuplicates([key, ts]) cannot dedup
    and dropDuplicates([key]) would hold state for forever."""
    from grader_etl_spark.streaming.jobs import deduplicated_stream_within_watermark

    path = str(tmp_path / "retries")
    rows = [
        ("u1", T0, "run", True),
        ("u1", T0 + dt.timedelta(seconds=30), "run", True),   # retry, new ts
        ("u2", T0 + dt.timedelta(hours=1), "check", False),
        ("u2", T0 + dt.timedelta(hours=1, seconds=5), "check", False),  # retry
        ("u3", T0, "run", False),
    ]
    _land(spark, path, rows)
    stream = deduplicated_stream_within_watermark(
        file_stream(spark, path, SCHEMA), keys=["user_id"]
    )
    run_to_memory_sink(stream, "wmdedup_out")
    got = {
        (r["user_id"], r["event_timestamp"])
        for r in spark.sql("SELECT * FROM wmdedup_out").collect()
    }
    assert got == {
        ("u1", T0),
        ("u2", T0 + dt.timedelta(hours=1)),
        ("u3", T0),
    }


def test_curated_doc_stream_matches_batch(spark, tmp_path):
    """Streaming quality gate == batch classifier filter on the same
    landed documents (stateless parity)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, LongType

    from grader_etl_spark.io import load
    from grader_etl_spark.operators.selection import quality_logit
    from grader_etl_spark.streaming.jobs import curated_doc_stream, file_stream, run_to_memory_sink

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    landing = str(tmp_path / "docs_landing")
    # Land in two files to exercise multi-batch discovery.
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(landing)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(landing)

    stream = file_stream(spark, landing, docs.schema)
    got_q = run_to_memory_sink(curated_doc_stream(stream), "curated_docs")
    try:
        rows = spark.sql("SELECT * FROM curated_docs").collect()
    finally:
        got_q.stop()
    got = {(r["doc_id"], r["logit_int"]) for r in rows}

    want = {
        (r["doc_id"], r["logit_int"])
        for r in docs.withColumn("logit_int", quality_logit(F.col("text")))
        .filter(F.col("logit_int") > 0)
        .collect()
    }
    assert got == want and got


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    """Stream-static anti-join dedup == batch anti-join on the same
    landed documents and the same ledger."""
    from pyspark.sql import functions as F

    from grader_etl_spark.io import load
    from grader_etl_spark.streaming.jobs import (
        file_stream,
        incremental_dedup_stream,
        run_to_memory_sink,
    )

    from grader_etl_spark.functions.textnorm import WS_RE, norm_lower

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    fp = F.md5(F.regexp_replace(norm_lower("text"), WS_RE, " "))
    # Ledger: fingerprints of the even half — the "already ingested" corpus.
    ledger = docs.filter(F.col("doc_id") % 2 == 0).select(fp.alias("fp")).distinct()
    ledger.cache().count()

    landing = str(tmp_path / "docs_landing")
    docs.coalesce(2).write.mode("append").parquet(landing)

    stream = file_stream(spark, landing, docs.schema)
    q = run_to_memory_sink(incremental_dedup_stream(stream, ledger), "incdedup_stream")
    try:
        got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM incdedup_stream").collect()}
    finally:
        q.stop()

    want_df = (
        docs.withColumn("fp", fp)
        .dropDuplicates(["fp"])
        .join(ledger, "fp", "left_anti")
    )
    want = {r["doc_id"] for r in want_df.collect()}
    # In-batch dedup keeps an arbitrary doc per fp; compare at the
    # fingerprint level (the contract) plus survivor count.
    got_fp = {r["fp"] for r in spark.sql("SELECT fp FROM incdedup_stream").collect()}
    want_fp = {r["fp"] for r in want_df.select("fp").collect()}
    assert got_fp == want_fp
    assert len(got) == len(want)
    assert got_fp and len(got_fp) < docs.count()


def test_trending_terms_matches_batch(spark, landing):
    """Streaming windowed term counts + batch-side ranking == the
    all-batch computation on the same landed events."""
    from pyspark.sql import functions as F

    from grader_etl_spark.streaming.jobs import (
        file_stream,
        run_to_memory_sink,
        top_terms_per_window,
        trending_terms,
    )

    stream = file_stream(spark, landing, SCHEMA)
    # complete mode: with availableNow over a static landing dir the
    # watermark never passes the last window, so append would emit
    # nothing — same sink mode the tumbling-report test uses.
    q = run_to_memory_sink(trending_terms(stream), "trend_counts", output_mode="complete")
    try:
        sink = spark.sql("SELECT * FROM trend_counts")
        got = {
            (r["window_start"], r["term"], r["n"], r["rank"])
            for r in top_terms_per_window(sink).collect()
        }
    finally:
        q.stop()

    batch = spark.read.parquet(landing)
    want_counts = (
        batch.groupBy(
            F.window("event_timestamp", "1 day").alias("win"), F.col("attempt_type").alias("term")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "term", "n")
    )
    want = {
        (r["window_start"], r["term"], r["n"], r["rank"])
        for r in top_terms_per_window(want_counts).collect()
    }
    assert got == want and got
