"""Reference checks for the lifecycle/dependence operators: the
Kaplan-Meier estimator, weighted quantiles, mutual information, and
containment near-dup — each against hand-computed or independently
derived values on tiny synthetic frames (the sf0.01 DuckDB oracle is
the scale gate; these pin the SEMANTICS)."""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F


def test_kaplan_meier_hand_computed(spark, monkeypatch):
    import grader_etl_spark.operators.lifecycle as lc

    # Four customers: tenures 10, 10, 20, 30 days. Last orders placed
    # so that the t=10 pair churned (last order long before asof) and
    # t=20 is censored (recent), t=30 churned.
    def orders(cust, first, last):
        return [(cust, dt.datetime.fromisoformat(first)), (cust, dt.datetime.fromisoformat(last))]

    rows = (
        orders(1, "2001-01-01", "2001-01-11")
        + orders(2, "2001-01-01", "2001-01-11")
        + orders(3, "2001-08-01", "2001-08-21")   # within 180d of 2001-09-01 -> censored
        + orders(4, "2001-01-01", "2001-01-31")
    )
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")
    monkeypatch.setattr(lc, "load", lambda spark, sf, t, columns=None: df)
    got = {r["t_days"]: r for r in lc.q_kaplan_meier(spark, "x").collect()}
    # t=10: n_risk=4, d=2  -> S = 1 - 2/4 = 0.5
    # t=20: n_risk=2, d=0, c=1 -> S stays 0.5
    # t=30: n_risk=1, d=1  -> S = 0.5 * (1 - 1/1) = 0
    assert (got[10]["n_risk"], got[10]["d_events"], got[10]["c_censored"]) == (4, 2, 0)
    assert got[10]["survival"] == 0.5
    assert (got[20]["n_risk"], got[20]["d_events"], got[20]["c_censored"]) == (2, 0, 1)
    assert got[20]["survival"] == 0.5
    assert (got[30]["n_risk"], got[30]["d_events"]) == (1, 1)
    assert got[30]["survival"] == 0.0


def test_weighted_quantiles_unit_semantics(spark, monkeypatch):
    import grader_etl_spark.operators.lifecycle as lc

    # One group; prices 1..4 with weights 1,1,1,7 (total 10). The
    # unit-weighted median is the price of the 5th unit = 4.0, even
    # though the row-median of prices is 2.5.
    rows = [
        ("A", 1.0, 1.0, 1, 1),
        ("A", 2.0, 1.0, 2, 1),
        ("A", 3.0, 1.0, 3, 1),
        ("A", 4.0, 7.0, 4, 1),
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double, "
        "l_orderkey long, l_linenumber int"
    )
    monkeypatch.setattr(lc, "load", lambda spark, sf, t, columns=None: df)
    r = lc.q_weighted_quantiles(spark, "x").collect()[0]
    assert r["p25_w"] == 3.0   # cum 1,2,3,10: first 4*cum>=10 at price 3
    assert r["p50_w"] == 4.0
    assert r["p75_w"] == 4.0
    assert r["total_qty"] == 10


def test_mutual_information_extremes(spark, monkeypatch):
    import grader_etl_spark.operators.lifecycle as lc

    # Perfectly dependent: lang determined by source, uniform over 2.
    dep = spark.createDataFrame(
        [("en", "s1")] * 5 + [("de", "s2")] * 5, "lang string, source string"
    )
    monkeypatch.setattr(lc, "load", lambda spark, sf, t, columns=None: dep)
    rows = lc.q_mutual_information(spark, "x").collect()
    assert all(abs(r["mi_nats"] - math.log(2)) < 1e-6 for r in rows)

    # Independent: every (lang, source) cell equal -> MI = 0.
    ind = spark.createDataFrame(
        [(lang, src) for lang in ("en", "de") for src in ("s1", "s2") for _ in range(3)],
        "lang string, source string",
    )
    monkeypatch.setattr(lc, "load", lambda spark, sf, t, columns=None: ind)
    rows = lc.q_mutual_information(spark, "x").collect()
    assert all(r["mi_nats"] == 0.0 for r in rows)
    assert all(r["pmi"] == 0.0 for r in rows)


def test_containment_detects_subset_doc(spark, monkeypatch):
    import grader_etl_spark.operators.llm_dedup as ld

    quote = "the quick brown fox jumps over the lazy dog"
    host = quote + " and then a very long unrelated tail " + " ".join(
        f"tok{i}" for i in range(40)
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, host), (3, "completely different words entirely here")],
        "doc_id long, text string",
    )
    ld._SHINGLE_CACHE.clear()
    monkeypatch.setattr(ld, "load", lambda spark, sf, t, columns=None: docs)
    try:
        got = {(r["src_doc"], r["dst_doc"]): r for r in ld.q_containment_dup(spark, "x").collect()}
    finally:
        ld._SHINGLE_CACHE.clear()
    # Doc 1 fully contained in doc 2 -> containment 1.0 in that
    # direction only; host->quote containment is small; doc 3 shares
    # nothing.
    assert got[(1, 2)]["containment"] == 1.0
    assert (2, 1) not in got
    assert not any(3 in pair for pair in got)
