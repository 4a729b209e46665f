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
