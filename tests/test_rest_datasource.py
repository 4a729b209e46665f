"""Python Data Source API tests: the partition-parallel REST source
must emit one partition per day, produce deterministic rows, honor
day-range filter pushdown (fewer fetch partitions), read the jsonl
landed-file transport, and stream day-by-day with exactly-once
offsets."""

from __future__ import annotations

import json

import pyspark.sql.functions as F


def _registered(spark):
    from grader_etl_spark.sources.rest_datasource import register

    register(spark)
    return spark


def test_batch_read_is_deterministic_and_day_partitioned(spark):
    from grader_etl_spark.sources.rest_datasource import ATTEMPTS_PER_DAY

    _registered(spark)
    df = (
        spark.read.format("attempts_rest")
        .option("start", "2024-01-01")
        .option("end", "2024-01-04")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one per day
    rows = df.collect()
    assert len(rows) == 3 * ATTEMPTS_PER_DAY
    again = (
        spark.read.format("attempts_rest")
        .option("start", "2024-01-01").option("end", "2024-01-04").load().collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # schema contract
    assert df.columns == ["day", "attempt_id", "user_id", "task", "is_correct", "score"]


def test_day_filter_pushdown_prunes_fetch_partitions(spark):
    _registered(spark)
    df = (
        spark.read.format("attempts_rest")
        .option("start", "2024-01-01")
        .option("end", "2024-01-31")
        .load()
        .filter((F.col("day") >= "2024-01-10") & (F.col("day") < "2024-01-13"))
    )
    # the range reaches partitions(): 3 fetch tasks, not 30
    assert df.rdd.getNumPartitions() == 3
    days = {r["day"] for r in df.select("day").distinct().collect()}
    assert days == {"2024-01-10", "2024-01-11", "2024-01-12"}


def test_jsonl_transport_reads_landed_files(spark, tmp_path):
    _registered(spark)
    rec = {"attempt_id": "abc", "user_id": 7, "task": "sql", "is_correct": True, "score": 9.5}
    (tmp_path / "2024-02-01.jsonl").write_text(json.dumps(rec) + "\n")
    df = (
        spark.read.format("attempts_rest")
        .option("mode", "jsonl")
        .option("path", str(tmp_path))
        .option("start", "2024-02-01")
        .option("end", "2024-02-03")  # 2024-02-02 has no file -> 0 rows, no error
        .load()
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["attempt_id"] == "abc" and rows[0]["score"] == 9.5


def test_stream_reader_advances_one_day_per_batch(spark, tmp_path):
    from grader_etl_spark.sources.rest_datasource import ATTEMPTS_PER_DAY

    _registered(spark)
    stream = (
        spark.readStream.format("attempts_rest")
        .option("start", "2024-03-01")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # wait until at least 2 microbatches (2 days) landed
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) c FROM rest_stream_test").collect()[0]["c"]
            if n >= 2 * ATTEMPTS_PER_DAY:
                break
            time.sleep(0.5)
        got = spark.sql(
            "SELECT day, COUNT(*) c FROM rest_stream_test GROUP BY day ORDER BY day"
        ).collect()
        assert got[0]["day"] == "2024-03-01" and got[0]["c"] == ATTEMPTS_PER_DAY
        assert got[1]["day"] == "2024-03-02" and got[1]["c"] == ATTEMPTS_PER_DAY
    finally:
        q.stop()


def test_jsonl_writer_two_phase_commit_roundtrip(spark, tmp_path):
    import os

    _registered(spark)
    out = str(tmp_path / "landed")
    os.makedirs(out)
    df = (
        spark.read.format("attempts_rest")
        .option("start", "2024-01-01").option("end", "2024-01-03").load()
    )
    df.write.format("attempts_rest").option("path", out).mode("append").save()
    # staged nothing left behind; _SUCCESS manifest lists the files
    assert not os.path.exists(os.path.join(out, "_staging"))
    manifest = open(os.path.join(out, "_SUCCESS")).read().splitlines()
    assert manifest and all(f.endswith(".jsonl") for f in manifest)
    # published files concatenate back to the exact input (merge the
    # per-partition day files through the jsonl reader)
    import json as _json

    merged = str(tmp_path / "merged")
    os.makedirs(merged)
    by_day: dict[str, list] = {}
    for f in manifest:
        day = f.split(".part-")[0]
        with open(os.path.join(out, f)) as fh:
            by_day.setdefault(day, []).extend(_json.loads(l) for l in fh)
    for day, recs in by_day.items():
        with open(os.path.join(merged, f"{day}.jsonl"), "w") as fh:
            for r in recs:
                fh.write(_json.dumps(r) + "\n")
    back = (
        spark.read.format("attempts_rest")
        .option("mode", "jsonl").option("path", merged)
        .option("start", "2024-01-01").option("end", "2024-01-03").load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
