"""Connected-components propagation: fixpoint correctness on shapes
where a single propagation round is NOT enough (chains), plus the
end-to-end dedup-cluster invariants on the documents fixture.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from grader_etl_spark.operators.graph import connected_components, q_dedup_components


def _cc(spark, vertex_ids, edge_pairs):
    vertices = spark.createDataFrame([(v,) for v in vertex_ids], "id long")
    sym = [(a, b) for a, b in edge_pairs] + [(b, a) for a, b in edge_pairs]
    edges = spark.createDataFrame(sym or [(None, None)], "src long, dst long").filter(
        F.col("src").isNotNull()
    )
    rows = connected_components(vertices, edges).collect()
    return {r.id: r.component for r in rows}


def test_chain_needs_multiple_rounds(spark):
    # 1-2-3-4-5 chain: label 1 must travel 4 hops; a one-round
    # implementation would leave 5 labeled 3.
    got = _cc(spark, [1, 2, 3, 4, 5, 9], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 9: 9}


def test_two_clusters_and_isolates(spark):
    got = _cc(spark, [1, 2, 3, 10, 11, 20], [(2, 3), (1, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_no_edges(spark):
    got = _cc(spark, [7, 8], [])
    assert got == {7: 7, 8: 8}


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
