"""Dual-path parity: every threshold-gated driver shortcut must agree
with its distributed fallback.

Round 3 put driver-side fast paths behind explicit size bounds (BPE
merge rounds, the k-core peel, the connected-components tail). At test
scale the data always fits under the bounds, so without these tests
the distributed code paths would never execute — and a regression
there would first surface on a corpus too big to debug comfortably.
Each test forces the distributed path by shrinking the bound to zero
and asserts byte-identical results against the default driver path.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from grader_etl_spark.operators import graph, trainprep
from grader_etl_spark.operators.graph import (
    _np_min_labels,
    components_from_pairs,
)
from grader_etl_spark.operators.trainprep import bpe_train


def _vocab_df(spark):
    rows = [("abab", 3), ("ab", 2), ("banana", 4), ("bandana", 1), ("cab", 5)]
    return spark.createDataFrame(rows, "word string, cnt long").select(
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
        "cnt",
    )


def test_bpe_train_driver_and_distributed_agree(spark, monkeypatch):
    df = _vocab_df(spark)
    driver = bpe_train(df, 4)
    monkeypatch.setattr(trainprep, "BPE_DRIVER_VOCAB_MAX", 0)
    distributed = bpe_train(_vocab_df(spark), 4)
    assert driver == distributed
    assert len(driver) == 4


def test_kcore_driver_and_distributed_agree(spark, sf_dir, monkeypatch):
    from grader_etl_spark.operators.graph import q_kcore

    def rows(df):
        return sorted((r["doc_id"], r["core_degree"]) for r in df.collect())

    driver = rows(q_kcore(spark, sf_dir))
    monkeypatch.setattr(graph, "_KCORE_DRIVER_EDGES_MAX", 0)
    distributed = rows(q_kcore(spark, sf_dir))
    assert driver == distributed


def test_components_tail_and_contraction_agree(spark):
    rng = random.Random(7)
    ids = list(range(60))
    pairs = sorted(
        {tuple(sorted(rng.sample(ids, 2))) for _ in range(80)}
    )
    pdf = spark.createDataFrame(pairs, "a long, b long")

    def comp_map(df):
        return {r["id"]: r["component"] for r in df.collect()}

    fast = comp_map(components_from_pairs(pdf, "a", "b"))
    # tail_threshold=0 forbids the driver paths entirely: the loop
    # contracts until the edge set is empty, purely distributed.
    slow = comp_map(components_from_pairs(pdf, "a", "b", tail_threshold=0))
    assert fast == slow
    assert len(fast) > 0


def test_np_min_labels_matches_union_find():
    """Vectorized min-label propagation == dict union-find on random
    graphs (including chains, the pointer-jumping worst case)."""
    import numpy as np

    rng = random.Random(13)
    for trial in range(20):
        n = rng.randint(2, 120)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(1, 3 * n))
        ]
        # long chain appended: worst case for propagation depth
        edges += [(i, i + 1) for i in range(0, n - 1, 1)] if trial % 4 == 0 else []
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        a = np.array([x for x, _ in edges])
        b = np.array([y for _, y in edges])
        ids, lab = _np_min_labels(a, b)

        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for x, y in edges:
            rx, ry = find(x), find(y)
            if rx != ry:
                lo, hi = (rx, ry) if rx < ry else (ry, rx)
                parent[hi] = lo
        expect = {v: find(v) for v in set(a.tolist()) | set(b.tolist())}
        got = {int(ids[i]): int(ids[lab[i]]) for i in range(len(ids))}
        assert got == expect, f"trial {trial}"
