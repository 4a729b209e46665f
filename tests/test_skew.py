"""salted_join correctness: identical multisets to the plain join on
skewed data, null keys, and left-join semantics."""

from __future__ import annotations

from collections import Counter

import pytest

from grader_etl_spark.operators.skew import salted_join

BIG = [(1, "a")] * 50 + [(2, "b")] * 3 + [(None, "n")] * 2 + [(9, "x")]
SMALL = [(1, "one"), (2, "two"), (3, "three")]


def _counter(rows):
    return Counter(tuple(r) for r in rows)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, how):
    big = spark.createDataFrame(BIG, "k int, payload string")
    small = spark.createDataFrame(SMALL, "k int, name string")
    plain = big.join(small, on="k", how=how).select("k", "payload", "name")
    salted = salted_join(big, small, on="k", how=how).select("k", "payload", "name")
    assert _counter(salted.collect()) == _counter(plain.collect())


def test_salted_join_rejects_unsound_types(spark):
    big = spark.createDataFrame(BIG, "k int, payload string")
    small = spark.createDataFrame(SMALL, "k int, name string")
    with pytest.raises(ValueError):
        salted_join(big, small, on="k", how="full")
