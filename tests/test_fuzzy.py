"""Length-band blocking in the fuzzy pair memo is lossless and
duplicate-free: the banded equi-join must produce EXACTLY the pair
set of the plain brand-blocked join it prunes."""

from __future__ import annotations

import pyspark.sql.functions as F

import grader_etl_spark.operators.fuzzy as fz
from grader_etl_spark.io import load


def _plain_pairs(spark, sf_dir):
    """The pre-banding reference plan: brand-only blocking, length
    filter applied after the join."""
    cols = ["p_partkey", "p_brand", "p_name"]
    a = load(spark, sf_dir, "part", columns=cols).alias("a")
    b = load(spark, sf_dir, "part", columns=cols).alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 4)
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist >= 0)
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            dist.cast("long").alias("edit_dist"),
        )
    )


def test_banded_pairs_identical_to_plain_blocking(spark, sf_dir):
    banded = [
        (r["key_a"], r["key_b"], r["edit_dist"])
        for r in fz._blocked_levenshtein_pairs(spark, sf_dir).collect()
    ]
    plain = [
        (r["key_a"], r["key_b"], r["edit_dist"])
        for r in _plain_pairs(spark, sf_dir).collect()
    ]
    # No duplicates from the 3-band explode (each pair matches on
    # exactly one of b's exploded bands) ...
    assert len(banded) == len(set(banded))
    # ... and no pair lost or gained: |len diff| <= 4 implies the
    # bands (width 5) differ by at most 1, which the explode covers.
    assert set(banded) == set(plain)
    assert plain, "fixture produced no fuzzy pairs — test is vacuous"


def test_band_width_invariant():
    # The losslessness argument requires band width > edit threshold:
    # |len diff| <= 4 < _LEN_BAND guarantees adjacent-band coverage.
    assert fz._LEN_BAND > 4
