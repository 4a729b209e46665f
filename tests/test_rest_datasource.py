"""Python Data Source API tests: the partition-parallel REST source
must emit one partition per day, produce deterministic rows, honor
day-range filter pushdown (fewer fetch partitions), read the jsonl
landed-file transport, stream day-by-day with exactly-once offsets,
and fetch the http transport against a LIVE socket (stdlib
``http.server`` fixture — day-range params, 5xx retry, malformed-JSON
quarantine, the 60 s timeout semantic at a test-sized setting)."""

from __future__ import annotations

import json
import threading
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyspark.sql.functions as F
import pytest


def _server_records(day: str) -> list[dict]:
    """What the fixture serves for a healthy day — distinct from the
    synthetic transport's md5 rows so a test can't pass by accident."""
    return [
        {
            "attempt_id": f"{day}-a{i}",
            "user_id": 100 + i,
            "task": "sql" if i % 2 == 0 else "spark",
            "is_correct": i % 3 == 0,
            "score": float(i) + 0.5,
        }
        for i in range(5)
    ]


class _ApiHandler(BaseHTTPRequestHandler):
    """JSON-array contract of the reference API (main.py:103-125),
    with per-day fault injection: FLAKY_DAYS fail with 503 for the
    first `flaky_failures` requests, MALFORMED_DAYS return a JSON
    object (not an array), SLOW_DAYS sleep past the client timeout."""

    hits: Counter = Counter()
    seen_params: dict = {}
    flaky_days: set = set()
    flaky_failures = 2
    malformed_days: set = set()
    slow_days: set = set()
    lock = threading.Lock()

    def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
        q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
        day = q.get("start", "")
        with self.lock:
            self.hits[day] += 1
            self.seen_params[day] = q
            nth = self.hits[day]
        if day in self.slow_days:
            import time

            time.sleep(3.0)
        if day in self.flaky_days and nth <= self.flaky_failures:
            self.send_response(503)
            self.end_headers()
            return
        if day in self.malformed_days:
            body = b'{"error": "not an array"'
        else:
            body = json.dumps(_server_records(day)).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture()
def api_server():
    _ApiHandler.hits = Counter()
    _ApiHandler.seen_params = {}
    _ApiHandler.flaky_days = set()
    _ApiHandler.malformed_days = set()
    _ApiHandler.slow_days = set()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}/attempts", _ApiHandler
    finally:
        srv.shutdown()
        srv.server_close()


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


def test_http_transport_fetches_partition_per_day_live(api_server, spark):
    url, handler = api_server
    _registered(spark)
    df = (
        spark.read.format("attempts_rest")
        .option("mode", "http")
        .option("url", url)
        .option("client_key", "k-test")
        .option("start", "2024-05-01")
        .option("end", "2024-05-04")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # still one fetch task per day
    rows = df.collect()
    assert len(rows) == 3 * 5
    got = {(r["day"], r["attempt_id"], r["user_id"], r["task"], r["is_correct"], r["score"])
           for r in rows}
    want = {
        (d, r["attempt_id"], r["user_id"], r["task"], r["is_correct"], r["score"])
        for d in ("2024-05-01", "2024-05-02", "2024-05-03")
        for r in _server_records(d)
    }
    assert got == want
    # exactly one request per day hit the live socket, with the
    # reference's day-range + credential params (main.py:104-111)
    assert dict(handler.hits) == {"2024-05-01": 1, "2024-05-02": 1, "2024-05-03": 1}
    p = handler.seen_params["2024-05-02"]
    assert p["end"] == "2024-05-03" and p["client"] == "Skillfactory"
    assert p["client_key"] == "k-test"


def test_http_transport_pushdown_prunes_live_requests(api_server, spark):
    url, handler = api_server
    _registered(spark)
    df = (
        spark.read.format("attempts_rest")
        .option("mode", "http")
        .option("url", url)
        .option("start", "2024-05-01")
        .option("end", "2024-05-31")
        .load()
        .filter(F.col("day") == "2024-05-10")
    )
    assert df.count() == 5
    # the pushed filter reached the SOCKET, not just the plan: the
    # server saw one request, for the one surviving day
    assert dict(handler.hits) == {"2024-05-10": 1}


def test_http_transport_retries_transient_5xx(api_server, spark):
    url, handler = api_server
    handler.flaky_days = {"2024-06-02"}  # 503 twice, then healthy
    _registered(spark)
    rows = (
        spark.read.format("attempts_rest")
        .option("mode", "http")
        .option("url", url)
        .option("start", "2024-06-01")
        .option("end", "2024-06-03")
        .load()
        .collect()
    )
    assert len(rows) == 2 * 5  # the flaky day still produced its rows
    assert handler.hits["2024-06-02"] == 3  # 2 failures + 1 success
    assert handler.hits["2024-06-01"] == 1  # healthy day never re-fetched


def test_http_transport_5xx_exhaustion_raises():
    """Retries are BOUNDED: a day that never stops 5xx-ing re-raises
    (so Spark's task retry owns it) instead of spinning. Exercised on
    the executor function directly to avoid a 4-attempt task storm."""
    import urllib.error

    from grader_etl_spark.sources.rest_datasource import _http_records

    _ApiHandler.flaky_days = {"2024-06-05"}
    _ApiHandler.flaky_failures = 99
    _ApiHandler.hits = Counter()
    _ApiHandler.seen_params = {}
    _ApiHandler.malformed_days = set()
    _ApiHandler.slow_days = set()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError):
            _http_records(
                f"http://127.0.0.1:{srv.server_port}/attempts",
                "2024-06-05",
                retries=3,
            )
        assert _ApiHandler.hits["2024-06-05"] == 3
    finally:
        srv.shutdown()
        srv.server_close()
        _ApiHandler.flaky_failures = 2


def test_http_transport_malformed_json_lands_in_quarantine(api_server, spark, tmp_path):
    import os

    url, handler = api_server
    handler.malformed_days = {"2024-07-02"}
    qdir = str(tmp_path / "quarantine")
    _registered(spark)
    rows = (
        spark.read.format("attempts_rest")
        .option("mode", "http")
        .option("url", url)
        .option("quarantine", qdir)
        .option("start", "2024-07-01")
        .option("end", "2024-07-04")
        .load()
        .collect()
    )
    # bad day yields 0 rows, the OTHER days are unaffected (day-scoped
    # degrade, vs the reference's whole-window None at main.py:121-123)
    assert len(rows) == 2 * 5
    assert {r["day"] for r in rows} == {"2024-07-01", "2024-07-03"}
    raw = open(os.path.join(qdir, "2024-07-02.raw")).read()
    assert raw == '{"error": "not an array"'  # exact bytes, inspectable


def test_http_transport_timeout_semantic(api_server):
    """The reference's timeout=60 (main.py:114) plumbs through as the
    ``timeout`` option; proven at a test-sized setting against a
    server that sleeps past it."""
    import urllib.error

    from grader_etl_spark.sources.rest_datasource import _http_records

    url, handler = api_server
    handler.slow_days = {"2024-08-01"}
    with pytest.raises((urllib.error.URLError, TimeoutError)):
        _http_records(url, "2024-08-01", timeout=0.5, retries=1)


def test_http_transport_nonpositive_retries_still_fetches_once(api_server):
    """A user-supplied retries <= 0 must not skip the fetch loop (and
    trip the no-body guard): both the executor-side fetcher and the
    reader option clamp to one attempt."""
    from grader_etl_spark.sources.rest_datasource import AttemptsRestReader, _http_records

    url, _handler = api_server
    want = [
        ("2024-10-01", str(r["attempt_id"]), int(r["user_id"]), str(r["task"]),
         bool(r["is_correct"]), float(r["score"]))
        for r in _server_records("2024-10-01")
    ]
    assert _http_records(url, "2024-10-01", retries=0) == want
    assert _http_records(url, "2024-10-01", retries=-3) == want
    reader = AttemptsRestReader({"mode": "http", "url": url, "retries": "0"})
    assert reader.retries == 1


def test_driver_side_http_fetcher_parity_live(api_server):
    """sources/rest.py http_fetcher (the reference fetch_data parity
    function, main.py:113-125) over a real socket: list on 200, None
    on persistent HTTP failure, None on malformed JSON."""
    from grader_etl_spark.sources.rest import http_fetcher

    url, handler = api_server
    assert http_fetcher(url, {"start": "2024-09-01"}) == _server_records("2024-09-01")
    handler.flaky_days = {"2024-09-02"}
    handler.flaky_failures = 99
    assert http_fetcher(url, {"start": "2024-09-02"}) is None
    handler.malformed_days = {"2024-09-03"}
    assert http_fetcher(url, {"start": "2024-09-03"}) is None


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
