"""Misra-Gries heavy hitters: superset guarantee on a long-tail
vocabulary (shrink path exercised) + end-to-end exactness against a
Python count."""

from __future__ import annotations

import collections
import random

import pandas as pd

import grader_etl_spark.operators.sketches as sk


def _mg_run(token_lists, budget, batch=3):
    fold = sk.misra_gries_candidates(budget)
    batches = [
        pd.DataFrame({"toks": token_lists[i : i + batch]})
        for i in range(0, len(token_lists), batch)
    ]
    (out,) = list(fold(iter(batches)))
    return set(out["term"])


def test_mg_kernel_superset_guarantee_on_long_tail():
    rng = random.Random(7)
    # 3 true heavies + a 500-term tail: vocabulary >> budget, so the
    # shrink branch runs many times.
    stream = ["hot1"] * 400 + ["hot2"] * 300 + ["hot3"] * 200
    stream += [f"tail{i}" for i in range(500) for _ in (0, 1)]  # 2 each
    rng.shuffle(stream)
    docs = [stream[i : i + 10] for i in range(0, len(stream), 10)]

    budget = 20
    cands = _mg_run(docs, budget)
    n = len(stream)
    exact = collections.Counter(stream)
    for term, c in exact.items():
        if c * (budget + 1) > n:  # freq > n/(k+1) must survive
            assert term in cands, term
    assert len(cands) <= budget


def test_heavy_hitters_end_to_end_exact(spark, monkeypatch):
    rows = [
        (1, "a a a a a a b b b c"),
        (2, "a a b b c d e f g h"),
        (3, "a b c i j k l m n o"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(sk, "load", lambda spark, sf, t, columns=None: docs)
    got = [(r["term"], r["freq"], r["rank"]) for r in sk.q_heavy_hitters(spark, "x").collect()]

    exact = collections.Counter(" ".join(t for _, t in rows).split())
    n = sum(exact.values())
    want = sorted(
        ((t, c) for t, c in exact.items() if c * sk.HH_K > n),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == [(t, c, i + 1) for i, (t, c) in enumerate(want)]


def test_count_min_one_sided_and_exact_probe(spark, sf_dir):
    rows = {r["term"]: r for r in sk.q_count_min(spark, sf_dir).collect()}
    assert set(rows) == set(sk.CMS_PROBES)
    for term, r in rows.items():
        # CM guarantee: never an undercount.
        assert r["cm_est"] >= r["exact_freq"], term
        assert r["overcount"] == r["cm_est"] - r["exact_freq"]
    # The absent probe really is absent from the corpus.
    assert rows["zz_absent_term"]["exact_freq"] == 0


def test_count_min_matches_pure_python(spark, sf_dir):
    """Replay the sketch in pure Python on the same tokens: the grid,
    the estimates, everything is integer-deterministic."""
    import collections

    from grader_etl_spark.functions.hashing import md5_lane_py
    from grader_etl_spark.io import load

    texts = [r["text"] for r in load(spark, sf_dir, "documents", columns=["text"]).collect()]
    toks = [t for x in texts for t in x.strip().split()]
    grid: collections.Counter = collections.Counter()
    for t in toks:
        for j in range(sk.CMS_D):
            grid[(j, md5_lane_py(t, j) % sk.CMS_W)] += 1
    exact = collections.Counter(toks)
    got = {r["term"]: r for r in sk.q_count_min(spark, sf_dir).collect()}
    for term in sk.CMS_PROBES:
        want_est = min(grid[(j, md5_lane_py(term, j) % sk.CMS_W)] for j in range(sk.CMS_D))
        assert got[term]["cm_est"] == want_est, term
        assert got[term]["exact_freq"] == exact[term]
