"""K-means invariants: deterministic assignments, assignment
optimality (each vector's recorded distance equals the true min over
final centroids), and non-increasing inertia across iterations."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from grader_etl_spark.io import load
from grader_etl_spark.operators.clustering import K, assign, kmeans

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    return load(spark, SF, "embeddings", columns=["vec_id", "embedding"])


def test_assignments_deterministic_and_in_range(spark):
    emb = _vectors(spark)
    a1, c1 = kmeans(emb, k=K, iterations=3)
    a2, c2 = kmeans(emb, k=K, iterations=3)
    assert c1 == c2
    r1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    r2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert r1 == r2
    assert set(r1.values()) <= set(range(K))
    assert len(r1) == emb.count()


def test_assignment_is_argmin(spark):
    emb = _vectors(spark).limit(50)
    assigned, centroids = kmeans(emb, k=4, iterations=2)
    rows = assigned.select("vec_id", "embedding", "cluster", "sq_dist").collect()
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in centroids]
        best = min(range(len(dists)), key=lambda i: (dists[i], i))
        assert r["cluster"] == best
        assert math.isclose(r["sq_dist"], dists[best], rel_tol=1e-9, abs_tol=1e-9)


def test_inertia_non_increasing(spark):
    emb = _vectors(spark)
    inertias = []
    for iters in (1, 2, 4):
        assigned, _ = kmeans(emb, k=K, iterations=iters)
        inertias.append(assigned.agg(F.sum("sq_dist")).collect()[0][0])
    # Lloyd's never increases the objective (tiny float slack).
    assert inertias[1] <= inertias[0] + 1e-6
    assert inertias[2] <= inertias[1] + 1e-6
