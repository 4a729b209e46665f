"""Distributed PCA over the embedding corpus: covariance/correlation
matrix estimation and principal-component projection — the
dimensionality lens beside clustering (clustering.py) and ANN
(similarity.py): is the 64-dim embedding space really using its
dimensions, and what does the corpus look like along its top axes?

Scale design (100 TB discipline): the naive covariance plan explodes
every vector into d(d+1)/2 pair terms and shuffles n·d²/2 rows — fine
for an oracle, wrong at scale. The implementation instead collects
SECOND-MOMENT PARTIALS per Arrow batch with numpy (one d×d syrk per
batch inside mapInPandas), so the shuffle carries ≤ partitions ×
d(d+1)/2 tiny (i, j, partial_sum) rows regardless of corpus size; the
first moment rides a plain posexplode partial-agg (n·d rows, map-side
combined). Eigendecomposition happens driver-side on the d×d matrix —
bounded by the embedding dimension, never the data (the k-means
centroid-collect class) — and the projection broadcasts the
eigenvector literals back into a codegen'd zip_with/aggregate fold.

The DuckDB oracle runs the naive pairwise expansion, proving the
partial-collection plan loses nothing (rounded 6 dp: float sums,
different association order).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load, valid_vectors, VALID_EMBEDDINGS_SQL
from grader_etl_spark.registry import memo_checkpoint, query
from grader_etl_spark.functions.quantize import floor_quantize

EMB_DIM = 64


def _second_moment_partials(emb: DataFrame) -> DataFrame:
    """Per-Arrow-batch upper-triangle Gram partials: for each batch,
    X.T @ X computed once in numpy, emitted as (i, j, sxy) rows with
    i <= j. Output volume = batches × d(d+1)/2, independent of n."""
    import numpy as np

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = np.triu_indices(EMB_DIM)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
            g = x.T @ x
            yield pd.DataFrame({"i": iu[0], "j": iu[1], "sxy": g[iu]})

    return emb.select("embedding").mapInPandas(gram, "i int, j int, sxy double")


# Covariance memo (keyed by session + corpus dir — a checkpointed
# frame dies with its session, so a session restart rebuilds instead
# of replaying a dead handle): the d(d+1)/2-row frame is a
# derived artifact shared by the covariance report and the PCA
# projection, and referenced three times inside one query (cov, its
# diagonal, the diagonal's alias) — without materialization each
# reference re-runs the full-corpus Gram pass. 2080 rows at d=64, so
# the checkpoint is free at any corpus size.
_COV_CACHE: dict[tuple, DataFrame] = {}


def covariance_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle (i ≤ j) covariance and correlation of the
    embedding coordinates, full precision (callers round);
    session-memoized and checkpointed per corpus."""
    key = (spark, sf_dir)
    if key in _COV_CACHE:
        return _COV_CACHE[key]
    out = memo_checkpoint(_covariance_frame(spark, sf_dir))
    _COV_CACHE[key] = out
    return out


def _covariance_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    sxy = _second_moment_partials(emb).groupBy("i", "j").agg(F.sum("sxy").alias("sxy"))
    e = emb.select(F.posexplode("embedding").alias("i", "x")).select(
        "i", F.col("x").cast("double").alias("x")
    )
    m = e.groupBy("i").agg(F.sum("x").alias("sx"), F.count("*").alias("n"))
    m1 = m.select(F.col("i").alias("i1"), F.col("sx").alias("sx_i"), "n")
    m2 = m.select(F.col("i").alias("i2"), F.col("sx").alias("sx_j"))
    cov = (
        sxy.join(F.broadcast(m1), sxy.i == m1.i1)
        .join(F.broadcast(m2), sxy.j == m2.i2)
        .select(
            "i",
            "j",
            (
                F.col("sxy") / F.col("n")
                - (F.col("sx_i") / F.col("n")) * (F.col("sx_j") / F.col("n"))
            ).alias("cov"),
        )
    )
    diag = cov.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("d_i"), F.col("cov").alias("var_i")
    )
    d2 = diag.select(F.col("d_i").alias("d_j"), F.col("var_i").alias("var_j"))
    return (
        cov.join(F.broadcast(diag), cov.i == diag.d_i)
        .join(F.broadcast(d2), cov.j == d2.d_j)
        .select(
            "i",
            "j",
            "cov",
            # try_divide: zero-variance dims (n=1 corpus) have no corr
            F.try_divide(F.col("cov"), F.sqrt(F.col("var_i") * F.col("var_j"))).alias("corr"),
        )
    )


@query(
    "q_embedding_covariance",
    oracle=f"""
WITH e AS (
  SELECT vec_id, i, CAST(embedding AS DOUBLE[])[i + 1] AS x
  FROM {VALID_EMBEDDINGS_SQL}, (SELECT unnest(range(0, {EMB_DIM})) AS i)
), g AS (
  SELECT a.i AS i, b.i AS j,
         SUM(a.x * b.x) AS sxy, COUNT(*) AS n
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
), m AS (
  SELECT i, SUM(x) AS sx FROM e GROUP BY 1
), cov AS (
  SELECT g.i, g.j,
         g.sxy / g.n - (mi.sx / g.n) * (mj.sx / g.n) AS cov
  FROM g JOIN m mi ON mi.i = g.i JOIN m mj ON mj.i = g.j
)
SELECT c.i, c.j,
       CASE WHEN abs(c.cov) < 4.5e9 THEN floor((c.cov) * 1e6 + 0.5) / 1e6 ELSE (c.cov) END AS cov,
       CASE WHEN abs(c.cov / SQRT(di.cov * dj.cov)) < 4.5e9 THEN floor((c.cov / SQRT(di.cov * dj.cov)) * 1e6 + 0.5) / 1e6 ELSE (c.cov / SQRT(di.cov * dj.cov)) END AS corr
FROM cov c
JOIN cov di ON di.i = c.i AND di.j = c.i
JOIN cov dj ON dj.i = c.j AND dj.j = c.j
""",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding coordinate covariance + correlation matrix, upper
    triangle (d(d+1)/2 = 2080 rows at d=64). Implementation collects
    numpy Gram partials per Arrow batch (see module docstring) — the
    oracle's naive n·d²/2 pairwise expansion is what this plan
    REFUSES to shuffle. Population covariance; both moments reduce
    before any join; the mean/diagonal joins broadcast 64-row frames.
    Rounded 6 dp (float partials merge in engine-specific order)."""
    c = covariance_frame(spark, sf_dir)
    return c.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        floor_quantize("cov", 6).alias("cov"),
        floor_quantize("corr", 6).alias("corr"),
    )


@query("q_pca_project")  # rows-only: eigenvector sign/order is not SQL-expressible
def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto its corpus's top-2 principal
    components. The d×d covariance (from covariance_frame) is
    collected driver-side — 2080 values, bounded by d, never by n —
    eigendecomposed with numpy, and the two leading eigenvectors are
    broadcast back as array literals; each projection is then a
    codegen'd zip_with multiply + aggregate fold per row, map-side,
    zero shuffle.

    Sign convention: each eigenvector is flipped so its
    largest-magnitude coordinate is positive (eigh's sign is
    arbitrary), making outputs stable across runs. No DuckDB oracle —
    eigendecomposition isn't SQL — so the driver records rows-only;
    tests/test_pca.py pins the semantics: PC variance ordering,
    orthonormality, and agreement with numpy's full PCA on the same
    data."""
    import numpy as np

    rows = covariance_frame(spark, sf_dir).select("i", "j", "cov").collect()
    c = np.zeros((EMB_DIM, EMB_DIM))
    for r in rows:
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1]
    pcs = []
    for k in range(2):
        v = vecs[:, order[k]]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        pcs.append([float(x) for x in v])

    emb = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]))
    x = F.col("embedding").cast("array<double>")

    def project(vec: list[float]) -> F.Column:
        prods = F.zip_with(x, F.lit(vec), lambda a, b: a * b)
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)

    return emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        floor_quantize(project(pcs[0]), 6).alias("pc1"),
        floor_quantize(project(pcs[1]), 6).alias("pc2"),
    )
