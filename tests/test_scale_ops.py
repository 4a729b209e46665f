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
    monkeypatch.setattr(g, "jaccard_pairs_memo", lambda spark, sf: pairs)
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


def test_sample_allocation_sums_exactly(spark, sf_dir, monkeypatch):
    from grader_etl_spark.operators.sampling import ALLOC_TARGET, q_sample_allocation

    rows = q_sample_allocation(spark, sf_dir).collect()
    assert sum(r["quota"] for r in rows) == ALLOC_TARGET
    # proportionality within 1 slot of the unrounded share
    total = sum(r["n_docs"] for r in rows)
    for r in rows:
        exact = ALLOC_TARGET * r["n_docs"] / total
        assert abs(r["quota"] - exact) < 1.0


def test_order_gap_buckets(spark, monkeypatch):
    import datetime as dt

    import grader_etl_spark.operators.lifecycle as lc

    base = dt.datetime(2001, 1, 1)
    rows = [
        (1, base, 1), (1, base + dt.timedelta(days=3), 2),       # gap 3 -> 00-06d
        (1, base + dt.timedelta(days=43), 3),                    # gap 40 -> 30-89d
        (2, base, 4), (2, base + dt.timedelta(days=400), 5),     # gap 400 -> 365d+
    ]
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp, o_orderkey long")
    monkeypatch.setattr(lc, "load", lambda spark, sf, t, columns=None: df)
    got = {r["bucket"]: r for r in lc.q_order_gap_distribution(spark, "x").collect()}
    assert got["00-06d"]["n_gaps"] == 1 and got["00-06d"]["min_gap"] == 3
    assert got["30-89d"]["n_gaps"] == 1 and got["30-89d"]["max_gap"] == 40
    assert got["365d+"]["n_gaps"] == 1
    # shares are rounded to 6 dp each, so the sum can be off by up to
    # |buckets| * 5e-7
    assert abs(sum(r["share"] for r in got.values()) - 1.0) < 3e-6


def test_topn_with_other_rollup(spark, sf_dir):
    from grader_etl_spark.operators.insights import q_topn_with_other

    rows = q_topn_with_other(spark, sf_dir).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    for seg, rs in by_seg.items():
        named = [r for r in rs if r["entity"] != "OTHER"]
        other = [r for r in rs if r["entity"] == "OTHER"]
        assert len(named) <= 5, seg
        assert len(other) <= 1, seg
        if other:
            # every named leader beats the OTHER average member
            avg_other = other[0]["revenue"] / other[0]["n_customers"]
            assert all(r["revenue"] >= avg_other for r in named), seg


def test_bootstrap_ci_brackets_point(spark, sf_dir):
    from grader_etl_spark.operators.bootstrap import q_bootstrap_ci

    r = q_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r["ci_lo"] <= r["point_mean"] <= r["ci_hi"]
    # At n=1500 orders the standard error of the mean is ~sigma/sqrt(n);
    # the 95% band must be finite and not absurdly wide (±20% of mean).
    width = r["ci_hi"] - r["ci_lo"]
    assert 0 < width < 0.4 * r["point_mean"]
    assert r["n_replicates"] == 40


def test_holt_trend_matches_python_recursion(spark, sf_dir):
    from grader_etl_spark.operators.time_windows import q_holt_trend
    import pyspark.sql.functions as F
    from grader_etl_spark.io import load

    daily = (
        load(spark, sf_dir, "events", columns=["ts", "value"])
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("v"))
        .orderBy("day")
        .collect()
    )
    l = b = None
    expect = {}
    for r in daily:
        v = r["v"]
        if l is None:
            l, b = v, 0.0
        else:
            l_new = 0.5 * v + 0.5 * (l + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
        expect[str(r["day"])] = (round(l, 6), round(b, 6))

    got = {r["day"]: (r["level"], r["trend"]) for r in q_holt_trend(spark, sf_dir).collect()}
    assert got == expect


def test_topk_two_phase_plan_and_equality(spark, sf_dir):
    """Phase 1 must rank within (group, salt) — the plan's first
    window sort includes the salt key — and the result must equal the
    naive single-window top-k."""
    import io as _io
    import contextlib

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from grader_etl_spark.io import load
    from grader_etl_spark.operators.windows import TOPK_K, q_topk_two_phase

    got = {
        (r["o_orderpriority"], r["o_orderkey"], r["rk"])
        for r in q_topk_two_phase(spark, sf_dir).collect()
    }
    od = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    want = {
        (r["o_orderpriority"], r["o_orderkey"], r["rk"])
        for r in od.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOPK_K)
        .collect()
    }
    assert got == want

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_topk_two_phase(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Window") >= 2
    assert "salt" in plan
