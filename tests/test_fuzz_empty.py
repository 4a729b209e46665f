"""Committed slice of the EMPTY shape: every fact table truncated to
zero rows (schema intact, real dims) — empty partitions, empty days,
and empty corpora are routine at 100 TB, and zero-row global
aggregates are exactly where the engine edges live.

The round-5 probe found 8 real empty-input failures, all fixed:
Spark 4's ANSI mode THROWS on /0 where DuckDB yields NULL (corpus
datasheet, power analysis, A/B rates → try_divide); Spark's SUM of a
0/1 flag goes NULL on zero rows where COUNT(CASE) stays 0 (A/B
cells); Spark's cube/rollup/grouping-sets emit NO groups from zero
rows while ANSI emits the empty grand-total group (oracles pin the
Spark semantics with a no-op-on-nonempty HAVING count(*)>0); the
bootstrap emits no interval row for an empty population; and the MMR
driver greedy min()'d an empty candidate pool (now picks what exists
and stops). This test pins every fixed query plus a broad smoke over
the aggregate/join/window/text families on the truncated tables.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # the 8 fixed empty-input failures
    "q_ab_test",
    "q_bootstrap_ci",
    "q_corpus_datasheet",
    "q_cube",
    "q_grouping_sets",
    "q_mmr_select",
    "q_power_analysis",
    "q_rollup",
    # zero-row global aggregates / reports
    "q_daily_report",
    "q_conditional_counts",
    "q_pricing_summary",
    "q_stats_agg",
    # joins / windows / sequences over nothing
    "q_join_inner",
    "q_join_outer",
    "q_join_asof",
    "q_window_rank",
    "q_sessionize",
    "q_funnel",
    "q_topk",
    # text / dedup / embedding families over an empty corpus
    "q_text_stats",
    "q_dedup_exact_docs",
    "q_neardup_jaccard",
    "q_dedup_components",
    "q_bpe_train",
    "q_heavy_hitters",
    "q_ann_cosine",
    "q_active_users_hll",
    "q_revenue_deciles_approx",
]
QUERIES = sorted(set(QUERIES))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    fc = _load("tools/fuzz_campaign.py", "empty_fc")
    base = str(tmp_path_factory.mktemp("emptyshape"))
    return fc.gen_combined(base, 4201, "empty")


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{empty_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_empty_tables_match_oracle(spark, empty_dir, empty_con, name):
    from grader_etl_spark.registry import REGISTRY, load_all_operators

    oc = _load("tools/oracle_check.py", "empty_oc")
    load_all_operators()
    sdf = REGISTRY[name].fn(spark, empty_dir).toPandas()
    odf = empty_con.execute(REGISTRY[name].oracle).df()
    problems = oc.compare(name, sdf, odf)
    assert not problems, f"{name} diverged on zero-row fact tables: {problems}"


# Single-row facts: the n-1 = 0 variance denominators, 1x1 contingency
# tables, one-sided ECDFs, all-zero Poisson replicates, and zero MADs
# that ANSI /0 turns into task-killing throws (all now try_divide —
# NULL, the DuckDB answer).
ONE_ROW_QUERIES = sorted(
    {
        "q_bootstrap_ci",
        "q_cramers_v",
        "q_embedding_covariance",
        "q_ks_test",
        "q_mad_outliers",
        "q_stats_agg",
        "q_ab_test",
        "q_spearman_corr",
        "q_trend_slope",
        "q_group_agg",
        "q_percentiles",
    }
)


@pytest.fixture(scope="module")
def one_dir(tmp_path_factory):
    fc = _load("tools/fuzz_campaign.py", "one_fc")
    base = str(tmp_path_factory.mktemp("oneshape"))
    return fc.gen_combined(base, 4203, "one")


@pytest.fixture(scope="module")
def one_con(one_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{one_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", ONE_ROW_QUERIES)
def test_single_row_tables_match_oracle(spark, one_dir, one_con, name):
    from grader_etl_spark.registry import REGISTRY, load_all_operators

    oc = _load("tools/oracle_check.py", "one_oc")
    load_all_operators()
    sdf = REGISTRY[name].fn(spark, one_dir).toPandas()
    odf = one_con.execute(REGISTRY[name].oracle).df()
    problems = oc.compare(name, sdf, odf)
    assert not problems, f"{name} diverged on single-row fact tables: {problems}"
