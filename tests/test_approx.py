"""Error bound for the approximate-distinct scale variant: HLL++ at
the default 1.5% rsd must land within 10% of the exact count on the
fixture (a generous 6-sigma-ish bound — failures mean the sketch is
mis-wired, not unlucky)."""

from __future__ import annotations

import pyspark.sql.functions as F

from grader_etl_spark.io import load
from grader_etl_spark.operators.aggregates import q_approx_distinct


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_unique_users"]
        for r in q_approx_distinct(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load(spark, sf_dir, "events", columns=["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel_err <= 0.10, f"{k}: approx={approx[k]} exact={exact[k]} err={rel_err:.3f}"


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    """GK sketch guarantee: each approx percentile must sit within
    ±1/accuracy rank error of the requested quantile. Checked by
    computing each approximate answer's true rank in the sorted data
    (cheaper and tighter than comparing values, which can diverge
    arbitrarily where the distribution is flat)."""
    from grader_etl_spark.operators.analytics import q_approx_percentiles
    from grader_etl_spark.io import load

    approx = {r["l_returnflag"]: r for r in q_approx_percentiles(spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    groups: dict[str, list[float]] = {}
    for r in li.collect():
        groups.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for flag, vals in groups.items():
        vals.sort()
        n = len(vals)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            got = approx[flag][col]
            rank = sum(1 for v in vals if v <= got)
            assert abs(rank / n - q) <= 1 / 10_000 + 2 / n, (flag, col, rank / n, q)
