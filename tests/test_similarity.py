"""ANN quality gate: the LSH-bucketed variant's recall against the
exact brute-force top-k baseline (both over the embeddings fixture).

Random-hyperplane LSH with 4 planes keeps only same-bucket candidates
(1/16 of the corpus on average); for genuinely-near neighbors the
collision probability is much higher (1 - theta/pi per plane), so
top-k recall must beat the random-bucket floor by a wide margin.
"""

from __future__ import annotations

from grader_etl_spark.operators.similarity import q_ann_cosine, q_ann_lsh


def _topk(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_lsh_recall_vs_exact(spark, sf_dir):
    exact = _topk(q_ann_cosine(spark, sf_dir))
    approx = _topk(q_ann_lsh(spark, sf_dir))
    assert set(exact) == set(approx.keys() | exact.keys())  # every query answered by exact
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # Random bucketing would give ~1/16 ≈ 0.06; require far better.
    assert recall >= 0.4, f"LSH top-k recall {recall:.2f} < 0.4"


def test_lsh_results_are_true_cosines(spark, sf_dir):
    """Every LSH hit's cosine must equal the exact cosine for that pair
    (the re-rank is exact; only the candidate set is approximate)."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in q_ann_cosine(spark, sf_dir).collect()
    }
    for r in q_ann_lsh(spark, sf_dir).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(r["cosine"] - exact[key]) < 1e-12


def test_ivf_recall_vs_exact(spark, sf_dir):
    from grader_etl_spark.operators.similarity import IVF_NPROBE, q_ann_ivf
    from grader_etl_spark.operators.clustering import K

    exact = _topk(q_ann_cosine(spark, sf_dir))
    approx = _topk(q_ann_ivf(spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # Probing nprobe/K of the corpus at random would give ~nprobe/K;
    # near neighbors concentrate in the query's own cell, so demand
    # far better than the 2/8 floor.
    floor = IVF_NPROBE / K
    assert recall >= max(0.5, 1.5 * floor), f"IVF top-k recall {recall:.2f} too low"


def test_ann_recall_audit_bounds(spark, sf_dir):
    from grader_etl_spark.operators.similarity import N_QUERIES, TOP_K, q_ann_recall

    rows = q_ann_recall(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert r["k"] == TOP_K
        assert 0 <= r["n_hit"] <= r["k"]
        assert abs(r["recall"] - r["n_hit"] / r["k"]) < 1e-9
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    assert mean_recall >= 0.5, mean_recall
