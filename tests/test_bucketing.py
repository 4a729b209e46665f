"""Bucketed co-located join: the equi-join of two co-bucketed tables
must plan WITHOUT a shuffle Exchange on either side — the pre-paid
layout replaces the per-query shuffle (plans/bucketing.py)."""

from __future__ import annotations

import contextlib
import io

import pytest

from grader_etl_spark.io import load
from grader_etl_spark.plans.bucketing import bucketed_equi_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    write_bucketed(
        load(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]),
        "orders_b", ["o_orderkey"], 8,
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]),
        "lineitem_b", ["l_orderkey"], 8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    # Pin the sort-merge path: tiny test tables would otherwise
    # broadcast, which proves nothing about bucketing.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_equi_join(spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # And it computes the right thing.
        li = load(spark, sf_dir, "lineitem", columns=["l_orderkey"])
        od = load(spark, sf_dir, "orders", columns=["o_orderkey"])
        assert joined.count() == li.join(od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)