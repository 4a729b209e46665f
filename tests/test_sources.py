"""Source connectors (sources/): REST fetch contract with an injected
transport, schema-pinned PERMISSIVE file readers with corrupt-record
quarantine, and the end-to-end REST -> pipeline hookup.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from grader_etl_spark.sources.files import read_csv, read_json, split_corrupt
from grader_etl_spark.sources.rest import (
    ATTEMPT_SCHEMA,
    attempts_to_df,
    date_range_params,
    fetch_attempts,
)

NOW = dt.datetime(2024, 1, 15, 12, 0, 0, tzinfo=dt.timezone.utc)


def test_date_range_params_seven_day_window():
    p = date_range_params(NOW, client="c", client_key="k")
    assert p["client"] == "c" and p["client_key"] == "k"
    assert p["start"] == "2024-01-08 12:00:00.000000"  # main.py:104-105
    assert p["end"] == "2024-01-15 12:00:00.000000"


def test_fetch_attempts_contract():
    seen = {}

    def fake_fetcher(url, params):
        seen["url"], seen["params"] = url, params
        return [{"lti_user_id": "u1", "created_at": "2024-01-15T10:00:00", "is_correct": 1}]

    out = fetch_attempts("http://api", NOW, fetcher=fake_fetcher)
    assert seen["url"] == "http://api"
    assert seen["params"]["start"].startswith("2024-01-08")
    assert out[0]["lti_user_id"] == "u1"
    # transport failure degrades to None (main.py:113-125)
    assert fetch_attempts("http://api", NOW, fetcher=lambda u, p: None) is None


def test_attempts_to_df_schema_and_none(spark):
    df = attempts_to_df(
        spark,
        [
            {"lti_user_id": "u1", "created_at": "2024-01-15T10:00:00", "is_correct": 1},
            {"lti_user_id": "u2", "passback_params": "{'k': 'v'}", "attempt_type": "run"},
        ],
    )
    assert df.schema == ATTEMPT_SCHEMA
    rows = {r["lti_user_id"]: r for r in df.collect()}
    assert rows["u1"]["is_correct"] == "1"  # stringly upstream, typed later
    assert rows["u2"]["created_at"] is None
    # None payload -> empty frame, same schema (degrade-and-continue).
    empty = attempts_to_df(spark, None)
    assert empty.count() == 0 and empty.schema == ATTEMPT_SCHEMA


def test_rest_to_pipeline_end_to_end(spark, tmp_path):
    """REST payload -> attempts_to_df -> transform -> store -> report:
    the full reference topology with an injected transport."""
    from grader_etl_spark.plans.pipeline import ParquetStore, run_pipeline

    payload = [
        {"lti_user_id": "u1", "passback_params": '{"oauth_consumer_key": "ck"}',
         "is_correct": 1, "attempt_type": "run", "created_at": "2024-01-15T10:00:00"},
        {"lti_user_id": "u2", "is_correct": 0, "attempt_type": "check",
         "created_at": "2024-01-15T11:00:00"},
        {"created_at": "2024-01-15T12:00:00"},  # no user -> quarantined
    ]
    raw = attempts_to_df(spark, fetch_attempts("http://api", NOW, fetcher=lambda u, p: payload))
    row = run_pipeline(raw, ParquetStore(spark, str(tmp_path / "stats")), "2024-01-15")
    assert row["total_attempts"] == 2
    assert row["successful_attempts"] == 1
    assert row["run_attempts"] == 1 and row["check_attempts"] == 1


JSON_SCHEMA = StructType(
    [StructField("a", IntegerType()), StructField("b", StringType())]
)


def test_read_json_permissive_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": "NOT_INT", "b": "y"}\nnot json at all\n')
    clean, corrupt = split_corrupt(read_json(spark, str(p), JSON_SCHEMA))
    assert [(r["a"], r["b"]) for r in clean.collect()] == [(1, "x")]
    assert corrupt.count() == 2  # bad type + unparseable line


def test_read_csv_permissive_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\nNOT_INT,y\n")
    clean, corrupt = split_corrupt(read_csv(spark, str(p), JSON_SCHEMA))
    assert [(r["a"], r["b"]) for r in clean.collect()] == [(1, "x")]
    assert corrupt.count() == 1


def test_orc_roundtrip_pushdown(spark, sf_dir, tmp_path):
    """ORC write → read roundtrip preserves values and types, and an
    ORC scan accepts pushed filters like parquet."""
    from grader_etl_spark.io import load
    from grader_etl_spark.sources.files import read_orc, write_orc

    src = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in src.collect()
    )
    plan = back.filter(back.n_nationkey == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_nationkey" in plan
