"""Committed slice of the ZIPF/HOT-KEY fuzz shape: one customer with
~50% of orders (zipf tail behind it), one part/supplier pair dominating
lineitem, one user with ~50% of events, one event_type at ~70%, a part
catalog where ONE brand holds half the rows, and a corpus where one
trigram appears in EVERY document (the degenerate posting list the
PPJoin prefix filter exists for).

The round-5 campaign ran this shape at seeds 8117/3301/4409/5501/6607
(5 x 265 query-vs-oracle comparisons) — zero failures; this test pins
the most-exposed queries on one fixed seed per run (suite-time
bounded): AQE skew-join consumers, window-per-key state machines
(sessions, streaks, paths, entropy), per-key-denominator statistics,
the fuzzy blocking join under a degenerate brand key, and the near-dup
family under the everywhere-shingle. tools/fuzz_campaign.py --shape
zipf cycles the full 265 for wide-net runs.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # skewed-key joins / aggregations
    "q_salted_join_agg",
    "q_key_skew",
    "q_group_agg",
    "q_join_inner",
    "q_topk",
    "q_topk_two_phase",
    "q_heavy_hitters",
    "q_market_concentration",
    # window-per-key state on the hot user
    "q_sessionize",
    "q_session_window",
    "q_max_concurrency",
    "q_longest_streak",
    "q_top_paths",
    "q_markov_transitions",
    "q_user_entropy",
    "q_window_funnel",
    # per-key denominators / distributions
    "q_mode",
    "q_seasonality_dow",
    "q_power_user_curve",
    "q_new_vs_returning",
    # degenerate fuzzy-blocking brand + hot-shingle near-dup
    "q_fuzzy_match",
    "q_entity_resolution",
    "q_brand_affinity",
    "q_neardup_jaccard",
    "q_neardup_prefix",
    "q_containment_dup",
    "q_dedup_components",
    "q_ngram_top",
    "q_heavy_hitters",
]
QUERIES = sorted(set(QUERIES))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def zipf_dir(tmp_path_factory):
    fc = _load("tools/fuzz_campaign.py", "zipf_fc")
    base = str(tmp_path_factory.mktemp("zipfshape"))
    return fc.gen_combined(base, 9203, "zipf")


@pytest.fixture(scope="module")
def zipf_con(zipf_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{zipf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_zipf_shape_matches_oracle(spark, zipf_dir, zipf_con, name):
    from grader_etl_spark.registry import REGISTRY, load_all_operators

    oc = _load("tools/oracle_check.py", "zipf_oc")
    load_all_operators()
    sdf = REGISTRY[name].fn(spark, zipf_dir).toPandas()
    odf = zipf_con.execute(REGISTRY[name].oracle).df()
    problems = oc.compare(name, sdf, odf)
    assert not problems, f"{name} diverged under zipf/hot-key skew: {problems}"
