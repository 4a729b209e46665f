"""Committed slice of the adversarial-MAGNITUDE fuzz shape: money
columns scaled 1e6 (prices ~4e11, group sums ~1e14, squares ~1e24).

The round-4 campaign shape caught EIGHT magnitude-envelope bugs in one
seed (all fixed in-tree): undersized DECIMAL(12,2) casts raising on
both engines (q_pricing_summary), DuckDB multiplying (18,2)x(18,2) in
int64 (q_stats_agg), a (38,8) square overflowing the 38-digit cap
(q_market_concentration), a fixture-envelope positivity shift sending
ln() negative (q_theil_index), native decimal->double casts one ulp
off at ~1e12 (q_decay_ltv / q_yoy_revenue / q_price_realization),
order-dependent double summation feeding a recursion (q_ewma), and —
found while fixing — Spark's BIGINT floor() saturating at 2^63 inside
the shared quantization (now guarded at |x| < 4.5e9 on both engines).

This test pins the fixed set plus the other revenue-aggregating
queries most exposed to the regime, on one seed per run (suite-time
bounded); tools/fuzz_campaign.py cycles the full 265 through the
magnitude shape for wide-net runs.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # the eight fixed by the round-4 magnitude campaign
    "q_pricing_summary",
    "q_stats_agg",
    "q_market_concentration",
    "q_theil_index",
    "q_decay_ltv",
    "q_ewma",
    "q_yoy_revenue",
    "q_price_realization",
    # nearest neighbors of the regime: revenue sums, moments, ratios
    "q_trend_slope",
    "q_bootstrap_ci",
    "q_group_agg",
    "q_daily_report",
    "q_market_share",
    "q_gini_nations",
    "q_holt_trend",
    "q_cusum_changepoint",
    "q_revenue_deciles",
    "q_weighted_quantiles",
    "q_twap",
]


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def magnitude_dir(tmp_path_factory):
    fc = _load("tools/fuzz_campaign.py", "mag_fc")
    base = str(tmp_path_factory.mktemp("magshape"))
    return fc.gen_combined(base, 7013, "magnitude")


@pytest.fixture(scope="module")
def mag_con(magnitude_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{magnitude_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_magnitude_shape_matches_oracle(spark, magnitude_dir, mag_con, name):
    from grader_etl_spark.registry import REGISTRY, load_all_operators

    oc = _load("tools/oracle_check.py", "mag_oc")
    load_all_operators()
    sdf = REGISTRY[name].fn(spark, magnitude_dir).toPandas()
    odf = mag_con.execute(REGISTRY[name].oracle).df()
    problems = oc.compare(name, sdf, odf)
    assert not problems, f"{name} diverged at 1e6-scaled magnitudes: {problems}"
