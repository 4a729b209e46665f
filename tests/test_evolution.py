"""Additive schema evolution: widened appends merge at read time,
old files stay untouched, incompatible appends are refused."""

from __future__ import annotations

import glob
import os

import pytest

from grader_etl_spark.plans.evolution import (
    SchemaEvolutionError,
    append_batch,
    read_evolved,
    with_backfill,
)


def test_additive_evolution_and_backfill(spark, tmp_path):
    store = str(tmp_path / "store")
    v1 = spark.range(3).selectExpr("id AS user_id", "CAST(id * 10 AS DOUBLE) AS score")
    append_batch(store, v1)
    files_v1 = {p: os.stat(p).st_mtime for p in glob.glob(f"{store}/*.parquet")}

    v2 = spark.range(3, 5).selectExpr(
        "id AS user_id", "CAST(id * 10 AS DOUBLE) AS score", "'beta' AS cohort"
    )
    append_batch(store, v2)

    # Old files untouched byte-for-byte (no history rewrite).
    for p, mtime in files_v1.items():
        assert os.stat(p).st_mtime == mtime

    merged = read_evolved(spark, store)
    assert set(merged.columns) == {"user_id", "score", "cohort"}
    rows = {r["user_id"]: r["cohort"] for r in merged.collect()}
    assert rows[0] is None and rows[4] == "beta"

    filled = {r["user_id"]: r["cohort"] for r in with_backfill(merged, {"cohort": "legacy"}).collect()}
    assert filled[0] == "legacy" and filled[4] == "beta"


def test_incompatible_appends_refused(spark, tmp_path):
    store = str(tmp_path / "store")
    append_batch(store, spark.range(2).selectExpr("id AS user_id", "CAST(id AS DOUBLE) AS score"))

    with pytest.raises(SchemaEvolutionError, match="drops"):
        append_batch(store, spark.range(2).selectExpr("id AS user_id"))

    with pytest.raises(SchemaEvolutionError, match="types"):
        append_batch(store, spark.range(2).selectExpr("id AS user_id", "CAST(id AS STRING) AS score"))
