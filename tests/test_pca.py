"""PCA semantics pins: the distributed covariance partials must agree
with numpy's covariance, and the projection must carry the variance
ordering and orthonormal-axis properties numpy's full PCA has on the
same fixture data (the sf0.01 DuckDB oracle covers the covariance
matrix; projection is rows-only by design — eigendecomposition isn't
SQL)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _fixture_matrix(sf_dir: str) -> np.ndarray:
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return np.vstack(pdf["embedding"].to_numpy()).astype("float64")


def test_covariance_matches_numpy(spark, sf_dir):
    from grader_etl_spark.operators.pca import covariance_frame

    x = _fixture_matrix(sf_dir)
    expected = np.cov(x, rowvar=False, bias=True)  # population, like the op
    got = covariance_frame(spark, sf_dir).select("i", "j", "cov").collect()
    for r in got[:500] + got[-500:]:
        assert abs(r["cov"] - expected[r["i"], r["j"]]) < 1e-9, (r["i"], r["j"])


def test_pca_projection_properties(spark, sf_dir):
    from grader_etl_spark.operators.pca import q_pca_project

    x = _fixture_matrix(sf_dir)
    rows = q_pca_project(spark, sf_dir).orderBy("vec_id").collect()
    pc1 = np.array([r["pc1"] for r in rows])
    pc2 = np.array([r["pc2"] for r in rows])
    # Variance ordering: PC1 >= PC2 >= the best single coordinate axis
    # can only be beaten by PC1/PC2 (top-2 eigenvalues dominate).
    coord_vars = np.cov(x, rowvar=False, bias=True).diagonal()
    assert pc1.var() >= pc2.var() > 0
    assert pc1.var() >= coord_vars.max() - 1e-9
    # PC1/PC2 match numpy's top-2 eigenvalues of the same covariance.
    vals = np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False, bias=True)))[::-1]
    assert abs(pc1.var() - vals[0]) / vals[0] < 1e-3
    assert abs(pc2.var() - vals[1]) / vals[1] < 1e-3
    # The two scores are uncorrelated (orthogonal axes).
    denom = np.sqrt(pc1.var() * pc2.var())
    assert abs(np.cov(pc1, pc2, bias=True)[0, 1]) / denom < 1e-6
