"""Committed slice of the NULL-propagation fuzz shape: NULLs injected
into documents (text/lang/source/n_chars) AND the real-world-nullable
relational columns (events.value/props/event_type, c_acctbal) — the
fixtures contain zero NULLs anywhere, so these paths are otherwise
untested by the gate.

The round-5 campaign found 18 real bugs on this shape (6 task-killing
kernel crashes, the arg_max-vs-max_by NULL-attribute class, six NULLS
FIRST/LAST sort divergences, two NULL-seed/concat divergences, four
semantic gaps — see BASELINE.md §nulls). This test pins every fixed
query on one fixed seed per run so the fixes are regression-guarded
in-suite; tools/fuzz_campaign.py --shape nulls cycles the full
registry for wide-net runs.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # task-killing kernel crashes (Arrow/pandas kernels on NULL input)
    "q_heavy_hitters",
    "q_multimodal_decode",
    "q_multimodal_decode_arrow",
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_pack_sequences",
    # arg_max/min_by NULL-attribute class
    "q_argmax",
    "q_ohlc_daily",
    # NULLS FIRST/LAST sort divergences
    "q_quantile_normalize",
    "q_quality_percentile_gate",
    "q_score_calibration",
    "q_sample_allocation",
    "q_window_distribution",
    "q_window_rank",
    "q_mode",
    "q_mixture_waterfill",
    # NULL-seed / concat divergences
    "q_dp_counts",
    "q_feature_hash",
    # semantic gaps
    "q_ewma",
    "q_complex_types",
    "q_variant_extract",
    "q_map_algebra",
    "q_quality_classifier",
    "q_repetition_score",
    # broad NULL-propagation smoke over heavy consumers
    "q_group_agg",
    "q_daily_report",
    "q_text_stats",
    "q_dedup_exact_docs",
    "q_sessionize",
    "q_funnel",
]
QUERIES = sorted(set(QUERIES))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    fc = _load("tools/fuzz_campaign.py", "nulls_fc")
    base = str(tmp_path_factory.mktemp("nullshape"))
    return fc.gen_combined(base, 9301, "nulls")


@pytest.fixture(scope="module")
def nulls_con(nulls_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{nulls_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_nulls_shape_matches_oracle(spark, nulls_dir, nulls_con, name):
    from grader_etl_spark.registry import REGISTRY, load_all_operators

    oc = _load("tools/oracle_check.py", "nulls_oc")
    load_all_operators()
    sdf = REGISTRY[name].fn(spark, nulls_dir).toPandas()
    odf = nulls_con.execute(REGISTRY[name].oracle).df()
    problems = oc.compare(name, sdf, odf)
    assert not problems, f"{name} diverged under injected NULLs: {problems}"
