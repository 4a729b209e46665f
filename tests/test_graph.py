"""Connected-components propagation: fixpoint correctness on shapes
where a single propagation round is NOT enough (chains), plus the
end-to-end dedup-cluster invariants on the documents fixture.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from grader_etl_spark.operators.graph import (
    _star_components,
    connected_components,
    q_dedup_components,
)


def _cc(spark, vertex_ids, edge_pairs, fn=connected_components, **kw):
    vertices = spark.createDataFrame([(v,) for v in vertex_ids], "id long")
    sym = [(a, b) for a, b in edge_pairs] + [(b, a) for a, b in edge_pairs]
    edges = spark.createDataFrame(sym or [(None, None)], "src long, dst long").filter(
        F.col("src").isNotNull()
    )
    rows = fn(vertices, edges, **kw).collect()
    return {r.id: r.component for r in rows}


import pytest


@pytest.mark.parametrize("tail", [100_000, 0])
def test_chain_needs_multiple_rounds(spark, tail):
    # 1-2-3-4-5 chain: label 1 must travel 4 hops; a one-round
    # implementation would leave 5 labeled 3. tail=100k exercises the
    # driver union-find finish, tail=0 the distributed contraction.
    got = _cc(
        spark, [1, 2, 3, 4, 5, 9], [(1, 2), (2, 3), (3, 4), (4, 5)], tail_threshold=tail
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 9: 9}


@pytest.mark.parametrize("tail", [100_000, 0])
def test_two_clusters_and_isolates(spark, tail):
    got = _cc(
        spark, [1, 2, 3, 10, 11, 20], [(2, 3), (1, 3), (10, 11)], tail_threshold=tail
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_no_edges(spark):
    got = _cc(spark, [7, 8], [])
    assert got == {7: 7, 8: 8}


def test_star_components_basic(spark):
    # Same shapes as the min-label tests, through the star path only.
    got = _cc(
        spark, [1, 2, 3, 10, 11, 20], [(2, 3), (1, 3), (10, 11)], fn=_star_components
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
    assert _cc(spark, [7, 8], [], fn=_star_components) == {7: 7, 8: 8}


def test_deep_chain_falls_back_to_star(spark):
    # A 120-node chain sheds O(1) edges per contraction round, so the
    # shrink-stall detector must hand off to the alternating-star path
    # (not spin or raise) and still reach the fixpoint. tail_threshold=0
    # keeps the driver union-find out of the way.
    n = 120
    got = _cc(
        spark,
        list(range(n)),
        [(i, i + 1) for i in range(n - 1)],
        max_rounds=4,
        tail_threshold=0,
    )
    assert got == {i: 0 for i in range(n)}


def test_star_components_deep_chain_direct(spark):
    # Star rounds are diameter-independent: a 300-node chain converges
    # well inside the default round budget.
    n = 300
    got = _cc(
        spark, list(range(n)), [(i, i + 1) for i in range(n - 1)], fn=_star_components
    )
    assert got == {i: 0 for i in range(n)}


def test_components_from_pairs_tolerates_dupes_and_loops(spark):
    from grader_etl_spark.operators.graph import components_from_pairs

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)], "a long, b long"
    )
    rows = components_from_pairs(pairs, "a", "b").collect()
    got = {r.id: r.component for r in rows}
    # Self-loop (3,3) contributes no edge; 3 is absent from the
    # edge-touched output (callers anti-join singletons).
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


def test_dedup_components_invariants(spark, sf_dir):
    comp = q_dedup_components(spark, sf_dir)
    rows = comp.collect()
    labels = {r.doc_id: r.component_id for r in rows}
    # Every doc labeled exactly once; every label is a real doc id and
    # the minimum of its own cluster.
    assert len(labels) == len(rows)
    by_comp: dict[int, list[int]] = {}
    for d, c in labels.items():
        by_comp.setdefault(c, []).append(d)
    for c, members in by_comp.items():
        assert min(members) == c


def test_dedup_keeper_picks_best_quality_member(spark, sf_dir):
    from grader_etl_spark.operators.graph import q_dedup_components, q_dedup_keeper
    import pyspark.sql.functions as F
    from grader_etl_spark.io import load

    comp = {r["doc_id"]: r["component_id"] for r in q_dedup_components(spark, sf_dir).collect()}
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
    score = {
        r["doc_id"]: r["s"]
        for r in load(spark, sf_dir, "documents", columns=["doc_id", "text"])
        .select("doc_id", F.size(F.array_distinct(toks)).alias("s"))
        .collect()
    }
    from collections import defaultdict

    clusters = defaultdict(list)
    for d, c in comp.items():
        clusters[c].append(d)
    expect = {
        c: min(members, key=lambda d: (-score[d], d))
        for c, members in clusters.items()
        if len(members) >= 2
    }
    got = {r["component_id"]: r["keeper_doc_id"] for r in q_dedup_keeper(spark, sf_dir).collect()}
    assert got == expect
    for r in q_dedup_keeper(spark, sf_dir).collect():
        assert r["cluster_size"] >= 2


def test_kcore_converged_and_matches_python_peel(spark, sf_dir):
    """The pinned-round peel must have reached the fixpoint, and the
    core must equal a pure-Python sequential peel (peeling is
    order-independent)."""
    import collections

    from grader_etl_spark.operators.graph import KCORE_K, q_kcore
    from grader_etl_spark.operators.llm_dedup import q_neardup_jaccard

    edges = [
        (r["doc_id_1"], r["doc_id_2"])
        for r in q_neardup_jaccard(spark, sf_dir).select("doc_id_1", "doc_id_2").collect()
    ]
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # Sequential peel to fixpoint.
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < KCORE_K]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    want = {v: len(ns) for v, ns in adj.items() if ns}
    got = {r["doc_id"]: r["core_degree"] for r in q_kcore(spark, sf_dir).collect()}
    assert got == want


def test_ordered_triangle_count_equals_id_ordered(spark, sf_dir):
    """Degree-ordered orientation must find the identical per-node
    triangle counts as the id-ordered compact-forward version."""
    from grader_etl_spark.operators.graph import q_triangle_count, q_triangle_count_ordered

    a = {
        (r["doc_id"], r["degree"], r["triangles"])
        for r in q_triangle_count(spark, sf_dir).select("doc_id", "degree", "triangles").collect()
    }
    b = {
        (r["doc_id"], r["degree"], r["triangles"])
        for r in q_triangle_count_ordered(spark, sf_dir).collect()
    }
    assert a == b and a
