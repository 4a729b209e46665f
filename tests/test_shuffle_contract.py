"""Shuffle-volume CONTRACT: the constant-shuffle class stays constant.

The round-4 audit (BASELINE.md, tools/shuffle_audit.py) classified 82
queries as constant-shuffle — their exchange bytes carry O(groups) or
O(k), not O(rows), which is precisely the property that lets them
survive a 100 TB input. Nothing structural stops a future edit (a
dropped map-side partial agg, a broadcast demoted to shuffle join, an
explode moved before an aggregate) from silently converting one to
linear: the result would still be CORRECT, every oracle row would stay
green, and only the 100 TB run would notice. This test pins a
representative subset of the class as an executable contract — bytes
ratio at 10× input must stay ~flat — plus two zero-shuffle
representatives that must stay zero.

Shuffle bytes are deterministic run-to-run (unlike wall time), so the
bound can be tight; 2.5 allows the partition-count constants the
audit observed without admitting anything linear (the linear class
measures 6-12× at this scale pair).
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SMALL = "/root/testdata/sf0.01"
_BIG = "/root/testdata/sf0.1"

# Constant-shuffle representatives, one per family shape: global agg
# over decimal sums, moment sketch, two-phase top-k, vocabulary-bounded
# CMS grid, |sources|-row mixture tail, broadcast-joined dim, top-k
# heavy hitters, confusion matrix over a fixed label space, shard
# balance audit. Measured ratios at round 5: 0.99-1.04.
# (q_active_users_hll was considered and NOT pinned: its exchange is
# CAPPED at days x 512 register partials per map task, but the fixture
# scales sit below that saturation point, so the 10x ratio still
# measures ~3x while growing toward the cap — bounded, not yet flat.)
CONSTANT = [
    "q_pricing_summary",
    "q_stats_agg",
    "q_topk_two_phase",
    "q_count_min",
    "q_mixture_rates",
    "q_join_broadcast",
    "q_heavy_hitters",
    "q_lang_confusion",
    "q_shard_balance",
]
# Pure map-side plans: any exchange at all is a regression.
ZERO_SHUFFLE = ["q_project_rename", "q_cast_bool"]

_RATIO_BOUND = 2.5


def _audit_mod():
    spec = importlib.util.spec_from_file_location(
        "shuffle_audit", os.path.join(_REPO, "tools", "shuffle_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def measurements(spark):
    sa = _audit_mod()
    from grader_etl_spark.registry import load_all_operators

    load_all_operators()
    names = CONSTANT + ZERO_SHUFFLE
    small = sa.audit(spark, names, _SMALL)
    big = sa.audit(spark, names, _BIG)
    return small, big


@pytest.mark.parametrize("name", CONSTANT)
def test_constant_shuffle_class_stays_constant(measurements, name):
    small, big = measurements
    b_small, b_big = small[name]["bytes"], big[name]["bytes"]
    assert b_small > 0, f"{name}: expected a (constant) shuffle, measured none"
    ratio = b_big / b_small
    assert ratio < _RATIO_BOUND, (
        f"{name}: shuffle bytes grew {ratio:.2f}x for 10x input "
        f"({b_small} -> {b_big} B) — the constant-shuffle contract is broken; "
        "look for a lost map-side partial agg or a demoted broadcast"
    )


def test_no_display_class_f_round_survives():
    """Native ROUND(double, n>0) is measured cross-engine-divergent on
    ~1% of half-boundary inputs (functions/quantize.py module doc), so
    display rounding must go through floor_quantize. The inventory
    tool classifies every F.round site; a DISPLAY-class site
    reappearing is a correctness regression waiting for a fuzz seed.
    No Spark needed — this is a source-level contract."""
    sa = _audit_mod  # noqa: F841  (same loader pattern)
    spec = importlib.util.spec_from_file_location(
        "round_inventory", os.path.join(_REPO, "tools", "round_inventory.py")
    )
    ri = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ri)
    display = [r for r in ri.sites() if r[2] == "DISPLAY"]
    assert not display, (
        "display-class F.round sites found (use "
        "grader_etl_spark.functions.quantize.floor_quantize + the SQL CASE "
        f"twin instead): {display}"
    )


@pytest.mark.parametrize("name", ZERO_SHUFFLE)
def test_zero_shuffle_class_stays_zero(measurements, name):
    small, big = measurements
    assert small[name]["bytes"] == 0 and big[name]["bytes"] == 0, (
        f"{name}: a pure map-side plan now shuffles "
        f"({small[name]} / {big[name]})"
    )
