"""Winnowing fingerprint parity against a pure-Python reference
(md5_32 — the cross-engine hash the DuckDB oracle replays too), plus
the winnowing guarantee: documents sharing a long substring share a
fingerprint."""

from __future__ import annotations

import pyspark.sql.functions as F

from grader_etl_spark.functions.hashing import md5_32_py
from grader_etl_spark.operators.text_analysis import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def py_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    grams = [md5_32_py(text[i : i + k]) for i in range(len(text) - k + 1)]
    wins = [min(grams[j : j + w]) for j in range(len(grams) - w + 1)]
    return sorted(set(wins))


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "short",  # shorter than k -> no grams
    "exactly8",  # exactly k chars -> 1 gram, shorter than w -> no window... see below
    "a" * 20,  # degenerate repeats
]


def test_winnow_matches_python_reference(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), "i int, text string")
    got = {
        r["i"]: list(r["fp"])
        for r in df.select("i", winnow_fingerprints(F.col("text")).alias("fp")).collect()
    }
    for i, text in enumerate(TEXTS):
        assert got[i] == py_winnow(text), f"text {i}: {got[i]} != {py_winnow(text)}"


def test_shared_substring_shares_fingerprint(spark):
    shared = "this exact sentence appears verbatim in both documents"
    d1 = "prefix one blah blah " + shared + " and a suffix"
    d2 = "totally other opening words here " + shared + " closing differently"
    df = spark.createDataFrame([(1, d1), (2, d2)], "i int, text string")
    fps = {
        r["i"]: set(r["fp"])
        for r in df.select("i", winnow_fingerprints(F.col("text")).alias("fp")).collect()
    }
    # winnowing theorem: any shared substring of length >= k+w-1 (11)
    # guarantees at least one shared fingerprint.
    assert fps[1] & fps[2]