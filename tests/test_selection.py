"""Invariant tests for the selection/release operators (selection.py):
DSIR importance direction, duplicated-span detection against a brute
Python reference, Wilson-bound algebra, and the DP noise table."""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, source string, text string, n_chars long")


def test_dsir_prefers_target_like_docs(spark, monkeypatch):
    import grader_etl_spark.operators.selection as sel

    # Target = lang 'en'. Build a vocabulary split: 'en' docs use
    # {alpha beta gamma}, others use {uno dos tres}. A new mixed doc
    # leaning 'en'-vocab must outrank one leaning off-target vocab.
    rows = []
    for i in range(10):
        rows.append((i, "en", "s", "alpha beta gamma alpha beta", 0))
    for i in range(10, 20):
        rows.append((i, "es", "s", "uno dos tres uno dos", 0))
    rows.append((100, "es", "s", "alpha beta gamma", 0))  # en-like content, es label
    rows.append((101, "en", "s", "uno dos tres", 0))      # off-target content, en label
    monkeypatch.setattr(
        sel, "load", lambda spark, sf, t, columns=None: _docs(spark, rows).select(columns)
    )
    got = {r["doc_id"]: r["dsir_weight"] for r in sel.q_dsir_select(spark, "x").collect()}
    # Content, not the label, drives the weight.
    assert got[100] > got[101]
    assert got[0] > got[10]
    # Weights are per-token means: every en-vocab doc shares one value.
    assert got[0] == got[5]


def test_dup_span_matches_brute_force(spark, monkeypatch):
    import grader_etl_spark.operators.selection as sel

    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "a copied prefix the quick brown fox jumps over the lazy dog and more",
        3: "completely unrelated words with no overlap at all here",
        4: "short text",  # < 5 tokens -> no shingles
    }
    rows = [(k, "en", "s", v, 0) for k, v in texts.items()]
    monkeypatch.setattr(
        sel, "load", lambda spark, sf, t, columns=None: _docs(spark, rows).select(columns)
    )

    # Brute-force reference: 5-gram shingles, dup = in >= 2 docs,
    # longest consecutive dup run + 4 tokens.
    shingles = {}
    for d, t in texts.items():
        toks = re.findall(r"[a-z]+", t.lower())
        shingles[d] = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
    from collections import Counter

    owner = Counter()
    for d, sh in shingles.items():
        for s in set(sh):
            owner[s] += 1
    expect = {}
    for d, sh in shingles.items():
        flags = [owner[s] >= 2 for s in sh]
        if not any(flags):
            continue
        best = run = 0
        for f in flags:
            run = run + 1 if f else 0
            best = max(best, run)
        expect[d] = (sum(flags), best + 4)

    got = {
        r["doc_id"]: (r["n_dup_shingles"], r["max_dup_token_span"])
        for r in sel.q_dup_span(spark, "x").collect()
    }
    assert got == expect
    assert 3 not in got and 4 not in got


def test_wilson_bound_shrinks_small_samples(spark, monkeypatch):
    import grader_etl_spark.operators.selection as sel

    rows = []
    # source 'big': 180/200 good; source 'tiny': 2/2 good.
    for i in range(200):
        rows.append((i, "en", "big", "", 300 if i < 180 else 100))
    for i in range(200, 202):
        rows.append((i, "en", "tiny", "", 300))
    monkeypatch.setattr(
        sel, "load", lambda spark, sf, t, columns=None: _docs(spark, rows).select(columns)
    )
    got = {r["source"]: r for r in sel.q_wilson_quality(spark, "x").collect()}
    assert got["tiny"]["n_good"] == 2 and got["big"]["n_good"] == 180
    # Wilson lower bound penalizes n=2 despite phat=1.0.
    assert got["big"]["wilson_lb"] > got["tiny"]["wilson_lb"]
    for r in got.values():
        assert 0.0 <= r["wilson_lb"] <= r["n_good"] / r["n_docs"]


def test_dp_threshold_table_is_valid_inverse_cdf():
    from grader_etl_spark.operators.selection import _DP_ALPHA, _DP_TABLE

    ks = [k for k, _ in _DP_TABLE]
    assert ks == list(range(-12, 13))
    # Thresholds strictly increase (as hex strings, minus the catch-all).
    hexes = [t for _, t in _DP_TABLE[:-1]]
    assert hexes == sorted(hexes) and _DP_TABLE[-1][1] == "g"
    # Bucket widths reproduce the two-sided geometric pmf to ~1e-4.
    prev = 0
    total = sum(
        (1 - _DP_ALPHA) / (1 + _DP_ALPHA) * _DP_ALPHA ** abs(k) for k in range(-12, 13)
    )
    for k, t in _DP_TABLE[:-1]:
        cur = int(t, 16)
        width = (cur - prev) / 2**32
        want = (1 - _DP_ALPHA) / (1 + _DP_ALPHA) * _DP_ALPHA ** abs(k) / total
        assert math.isclose(width, want, abs_tol=1e-4), k
        prev = cur


def test_dp_counts_noise_bounded_and_deterministic(spark, sf_dir):
    import grader_etl_spark.operators.selection as sel

    a = {(r["lang"], r["source"]): r for r in sel.q_dp_counts(spark, sf_dir).collect()}
    b = {(r["lang"], r["source"]): r for r in sel.q_dp_counts(spark, sf_dir).collect()}
    assert a.keys() == b.keys()
    for key, r in a.items():
        assert -12 <= r["noise"] <= 12
        assert r["n_released"] == max(r["n_true"] + r["noise"], 0)
        assert b[key]["noise"] == r["noise"]  # hash-seeded: stable across runs


def test_mmr_matches_python_greedy(spark, monkeypatch):
    import grader_etl_spark.operators.selection as sel

    # 2-D unit vectors by angle from the query: a tight cluster at
    # 10-12° and a diverse point at -30°. At λ=0.5 the redundancy
    # penalty (1-cos1° vs 1-cos40°) must beat the small relevance gap,
    # so the second pick is the -30° point, not a cluster near-dup.
    import math as m

    angles = {0: 0.0, 1: 10.0, 2: 11.0, 3: -30.0, 4: 12.0, 5: 85.0}
    vecs = {k: (m.cos(m.radians(a)), m.sin(m.radians(a))) for k, a in angles.items()}
    rows = [(k, list(v), 0) for k, v in vecs.items()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(sel, "load", lambda spark, sf, t, columns=None: df.select(columns))
    monkeypatch.setattr(sel, "MMR_K", 3)
    monkeypatch.setattr(sel, "MMR_LAMBDA", 0.5)

    got = [(r["rank"], r["vec_id"]) for r in sel.q_mmr_select(spark, "x").collect()]

    # Python greedy reference (float32 inputs widened to float64,
    # sequential dot like the Spark fold — tiny dims, so exact).
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (m.sqrt(sum(x * x for x in a)) * m.sqrt(sum(x * x for x in b)))

    q = vecs[0]
    cand = sorted(
        ((cos(q, v), k) for k, v in vecs.items() if k != 0), key=lambda t: (-t[0], t[1])
    )
    rel = {k: c for c, k in cand}
    sel_ids = [cand[0][1]]
    while len(sel_ids) < 3:
        best = max(
            (
                (0.5 * rel[k] - 0.5 * max(cos(vecs[k], vecs[s]) for s in sel_ids), -k, k)
                for k in rel
                if k not in sel_ids
            ),
        )
        sel_ids.append(best[2])
    assert [v for _, v in got] == sel_ids
    assert got[0][1] == 1  # most relevant first
    assert got[1][1] == 3  # diversity beats cluster redundancy at λ=0.5


def test_quality_budget_curve_monotone(spark, sf_dir):
    from grader_etl_spark.operators.selection import q_quality_budget_curve

    rows = q_quality_budget_curve(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cums = [r["cum_tokens"] for r in rows]
    assert cums == sorted(cums)  # cumulative is monotone
    assert rows[-1]["cum_share"] == 1.0
    assert sum(r["decile_tokens"] for r in rows) == rows[-1]["cum_tokens"]


def test_corpus_datasheet_consistency(spark, sf_dir):
    from grader_etl_spark.operators.selection import q_corpus_datasheet

    r = q_corpus_datasheet(spark, sf_dir).collect()[0]
    assert r["n_unique_docs"] <= r["n_docs"]
    assert 0.0 <= r["dup_rate"] < 1.0
    assert r["vocab_size"] <= r["n_tokens"]
    assert r["n_langs"] >= 1 and r["n_sources"] >= 1
    assert abs(r["mean_doc_tokens"] - round(r["n_tokens"] / r["n_docs"], 2)) < 1e-9


def test_quality_classifier_gate_is_integer_consistent(spark, sf_dir):
    import grader_etl_spark.operators.selection as sel

    rows = sel.q_quality_classifier(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (r["logit_int"] > 0)
        assert 0.0 <= r["score"] <= 1.0
        # sigmoid(z) > 1/2 iff z > 0 — the float display agrees with
        # the integer decision away from the rounding boundary.
        if abs(r["logit_int"]) > 10:
            assert (r["score"] > 0.5) == r["keep"]


def test_quality_classifier_matches_pure_python(spark, sf_dir):
    import grader_etl_spark.operators.selection as sel
    from grader_etl_spark.functions.hashing import md5_32_py
    from grader_etl_spark.io import load

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents", columns=["doc_id", "text"]).collect()
    }
    got = {r["doc_id"]: r["logit_int"] for r in sel.q_quality_classifier(spark, sf_dir).collect()}
    for doc_id, text in docs.items():
        z = 0
        for t in text.strip().split():
            b = md5_32_py(f"f:{t}") % sel.QC_DIM
            z += md5_32_py(f"w:{b}") % sel.QC_WEIGHT_RANGE - sel.QC_WEIGHT_RANGE // 2
        assert got[doc_id] == z, doc_id
