"""Semantics checks for the Bloom-pruned join, CUSUM changepoint,
triangle counting, quantile normalization, and decay-weighted LTV —
hand-computed frames pin the math; the sf0.01 DuckDB oracle is the
scale gate."""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F


def test_bloom_filter_no_false_negatives_and_prunes(spark):
    from grader_etl_spark.operators.bloom import bloom_prune, build_bloom_words

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    words = build_bloom_words(members, "k")
    probe = spark.range(0, 50_000).select(F.col("id").alias("k"))
    kept = bloom_prune(probe, "k", words).collect()
    kept_ids = {r["k"] for r in kept}
    # Every true member survives (false negatives are impossible)...
    assert set(range(500)) <= kept_ids
    # ...and the 49.5k non-members are almost all pruned map-side.
    fp = len(kept_ids) - 500
    assert fp / 49_500 < 0.01, f"false-positive rate too high: {fp}"


def test_cusum_finds_mean_shift(spark, monkeypatch):
    import grader_etl_spark.operators.lifecycle as lc

    # 10 days at 100.00, then 10 days at 200.00: |S_t| peaks at the
    # boundary day (t=10).
    rows = []
    for d in range(20):
        day = dt.datetime(2001, 1, 1) + dt.timedelta(days=d)
        rows.append((1, day, 100.0 if d < 10 else 200.0))
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp, o_totalprice double")
    monkeypatch.setattr(lc, "load", lambda spark, sf, t, columns=None: df)
    out = {r["day"].day: r for r in lc.q_cusum_changepoint(spark, "x").collect()}
    flagged = [d for d, r in out.items() if r["is_changepoint"]]
    assert flagged == [10]  # 2001-01-10 is the 10th day (t=10)
    # Sanity on the exact integer form: S_10 * n = n*cum - t*total
    # = 20*100000 - 10*300000 = -1,000,000 cents-scaled.
    assert out[10]["cusum_scaled"] == -1_000_000


def test_triangle_count_hand_graph(spark, monkeypatch):
    import grader_etl_spark.operators.graph as g

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "doc_id_1 long, doc_id_2 long"
    )
    monkeypatch.setattr(g, "q_neardup_jaccard", lambda spark, sf: pairs)
    got = {r["doc_id"]: r for r in g.q_triangle_count(spark, "x").collect()}
    assert (got[1]["degree"], got[1]["triangles"], got[1]["local_cc"]) == (2, 1, 1.0)
    assert (got[3]["degree"], got[3]["triangles"]) == (3, 1)
    assert abs(got[3]["local_cc"] - round(1 / 3, 6)) < 1e-9
    assert (got[4]["degree"], got[4]["triangles"], got[4]["local_cc"]) == (1, 0, 0.0)


def test_quantile_normalize_equalizes_distributions(spark, monkeypatch):
    import grader_etl_spark.operators.corpus_filters as cf

    # Source A: scores 1..4; source B: 101..104. After normalization
    # both should carry the same global values at matched quantiles:
    # rank r of 4 -> global rank ceil(r*8/4) = 2r.
    rows = [(i, "A", i) for i in range(1, 5)] + [(100 + i, "B", 100 + i) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    monkeypatch.setattr(cf, "load", lambda spark, sf, t, columns=None: df)
    out = cf.q_quantile_normalize(spark, "x").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["norm_value"])
    # Global sorted scores: 1,2,3,4,101,102,103,104 -> even ranks: 2,4,102,104
    assert sorted(by_src["A"]) == sorted(by_src["B"]) == [2, 4, 102, 104]


def test_decay_ltv_single_order_weight(spark, monkeypatch):
    import grader_etl_spark.operators.lifecycle as lc

    day = dt.datetime(2001, 9, 1) - dt.timedelta(days=365)
    df = spark.createDataFrame(
        [(7, day, 1000.0)], "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    monkeypatch.setattr(lc, "load", lambda spark, sf, t, columns=None: df)
    r = lc.q_decay_ltv(spark, "x").collect()[0]
    expected = round(1000.0 * round(math.exp(-1.0), 12), 4)
    assert r["decayed_value"] == expected
    assert r["raw_value"] == 1000.0
    assert r["n_orders"] == 1
