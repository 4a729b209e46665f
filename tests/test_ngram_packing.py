"""Edge cases for the n-gram frequency table and the packing planner:
short documents must not emit phantom grams, and bucket/bin math must
agree with a Python reference."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grader_etl_spark.operators.text_analysis import (
    NGRAM_TOP_K,
    PACK_BUCKET,
    PACK_CONTEXT,
    q_ngram_top,
    q_packing_plan,
)


def _grams(words: list[str], k: int) -> list[str]:
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def test_ngram_counts_match_python_reference(spark, tmp_path, monkeypatch):
    texts = [
        "a b c a b",       # repeats: bigram "a b" twice
        "single",          # 1 word: no bigrams/trigrams
        "two words",       # 2 words: no trigrams
        "a b c a b c d",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    import grader_etl_spark.operators.text_analysis as ta

    monkeypatch.setattr(ta, "load", lambda spark, sf, t, columns=None: docs)
    got = {
        (r["n"], r["gram"]): r["freq"] for r in q_ngram_top(spark, "ignored").collect()
    }
    want: dict[tuple[int, str], int] = {}
    for t in texts:
        ws = t.split()
        for k in (1, 2, 3):
            for g in _grams(ws, k):
                want[(k, g)] = want.get((k, g), 0) + 1
    # Few enough distinct grams that top-50 covers everything.
    assert len(want) <= NGRAM_TOP_K * 3
    assert got == want


def test_packing_plan_matches_python_reference(spark, monkeypatch):
    texts = ["w " * n for n in (1, 63, 64, 65, 511, 512, 513, 2000)]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    import grader_etl_spark.operators.text_analysis as ta

    monkeypatch.setattr(ta, "load", lambda spark, sf, t, columns=None: docs)
    rows = {r["bucket_lo"]: r for r in q_packing_plan(spark, "ignored").collect()}
    buckets: dict[int, list[int]] = {}
    for t in texts:
        n = len(t.split())
        lo = min(n // PACK_BUCKET, PACK_CONTEXT // PACK_BUCKET) * PACK_BUCKET
        buckets.setdefault(lo, []).append(n)
    assert set(rows) == set(buckets)
    for lo, ns in buckets.items():
        r = rows[lo]
        assert r["n_docs"] == len(ns)
        assert r["total_tokens"] == sum(ns)
        assert r["bins_if_unpacked"] == sum(math.ceil(n / PACK_CONTEXT) for n in ns)
        assert r["bins_lower_bound"] == math.ceil(sum(ns) / PACK_CONTEXT)
