"""functions/literals.py: the JSON-literal fast path must be an EXACT
stand-in for element-wise ``F.array(*[F.lit(x) ...])`` — the LSH
planes, IVF centroids, and bloom bitmap all ride it, and their DuckDB
oracles assume every double survives the repr → Jackson round-trip
bit-for-bit.
"""

from __future__ import annotations

import math
import random
import struct

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from grader_etl_spark.functions.literals import lit_doubles, lit_longs, lit_strings


def _round_trip(spark, xs):
    return spark.range(1).select(lit_doubles(xs).alias("a")).collect()[0]["a"]


@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=30, deadline=None)
def test_doubles_round_trip_exactly(spark, xs):
    got = _round_trip(spark, xs)
    assert [struct.pack("<d", g) for g in got] == [struct.pack("<d", x) for x in xs]


def test_adversarial_doubles_round_trip(spark):
    xs = [
        0.0,
        -0.0,
        5e-324,  # smallest subnormal
        2.2250738585072014e-308,  # smallest normal
        1.7976931348623157e308,  # largest finite
        1 / 3,
        0.1,
        -math.pi,
        123456789.123456789,
    ] + [random.Random(3).uniform(-1e6, 1e6) for _ in range(20)]
    got = _round_trip(spark, xs)
    assert [struct.pack("<d", g) for g in got] == [struct.pack("<d", x) for x in xs]


def test_matches_elementwise_lits_and_folds(spark):
    """Same values AND the same folded literal in the optimized plan —
    no per-row from_json evaluation left behind."""
    xs = [0.1, -2.5, 3e-7, 9.99]
    df = spark.range(1).select(
        lit_doubles(xs).alias("a"),
        F.array(*[F.lit(x) for x in xs]).alias("b"),
    )
    row = df.collect()[0]
    assert row["a"] == row["b"]
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "from_json" not in plan and "fromjson" not in plan.lower()


def test_longs_and_strings(spark):
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 42]
    got = spark.range(1).select(lit_longs(longs).alias("a")).collect()[0]["a"]
    assert got == longs
    strs = ["", "a b", "ünïcode", 'quo"te', "back\\slash", "tab\there"]
    got = spark.range(1).select(lit_strings(strs).alias("a")).collect()[0]["a"]
    assert got == strs
