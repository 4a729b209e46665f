"""Registry contract smoke: every registered query executes at
sf0.001 with a stable non-empty schema, and the oracle coverage is
exactly as declared (only the 4 float-iterative pipelines — k-means
and its IVF/recall consumers, plus the eigendecomposition PCA — are
rows-only; every sketch with an integer-deterministic core is
value-oracled).
"""

from __future__ import annotations

import pytest

from grader_etl_spark.registry import REGISTRY, all_oracles, all_queries

ROWS_ONLY_BY_DESIGN = {
    # Float-order-sensitive pipelines (cross-engine IEEE reduction
    # order) — every integer-deterministic pipeline is value-oracled
    # via the md5_32 cross-engine hash (functions/hashing.py).
    "q_kmeans_embeddings",  # iterative Lloyd's; invariants in test_clustering.py
    "q_ann_ivf",  # k-means cell layout; recall in test_similarity.py
    # Driver-side eigh of the d×d covariance; eigendecomposition isn't
    # SQL — semantics pinned vs numpy's full PCA in test_pca.py.
    "q_pca_project",
    # Inherits q_ann_ivf's float-order sensitivity (it IS the audit of
    # that path); mean-recall floor in test_similarity.py.
    "q_ann_recall",
    # (q_ann_lsh and q_bpe_train graduated to value oracles: exact
    # dyadic plane literals / unrolled integer merge rounds.)
}


def test_oracle_coverage_is_total_except_approximate():
    qs = all_queries()
    oracles = all_oracles()
    assert set(qs) - set(oracles) == ROWS_ONLY_BY_DESIGN


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_executes(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    df.limit(5).collect()  # plan executes end-to-end
