"""Grouped-map custom operators (``applyInPandas`` — SURVEY.md §2.9
ext): per-group vectorized Python where column algebra genuinely runs
out — here, per-label embedding centroids and each vector's distance
to its group centroid (the IVF-cell statistics of a vector index
build).

Scale shape: one shuffle on the group key, then each group is handed
to Python as ONE Arrow batch and processed with numpy at C speed.
Groups must fit in a worker's memory — true for IVF cells / label
partitions by construction; a skewed group would be salted upstream.
The same quantity is also expressible as explode + window-avg in pure
SQL (that is what the DuckDB oracle does), but the grouped-map form
is the template every custom numerical kernel (PCA whitening,
per-group quantile clipping, Mahalanobis scoring) follows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load
from grader_etl_spark.registry import query

_OUT_SCHEMA = "vec_id bigint, label int, dist_to_centroid double"


def centroid_distances(emb: DataFrame, key: str = "label") -> DataFrame:
    """Per-key centroid, then each member's L2 distance to it."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["v"].to_numpy())  # (n, dim) float64
        centroid = mat.mean(axis=0)
        dist = np.sqrt(((mat - centroid) ** 2).sum(axis=1))
        return pd.DataFrame(
            {"vec_id": pdf["vec_id"], "label": pdf[key], "dist_to_centroid": dist}
        )

    return emb.groupBy(key).applyInPandas(kernel, schema=_OUT_SCHEMA)


@query(
    "q_centroid_distance",
    oracle="""
WITH dims AS (
  SELECT vec_id, label, d.i AS dim, d.x AS x
  FROM embeddings,
       LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                       generate_subscripts(embedding, 1) AS i) d
),
cent AS (
  SELECT label, dim, AVG(x) AS cx
  FROM dims GROUP BY label, dim
)
SELECT d.vec_id,
       d.label,
       ROUND(sqrt(SUM((d.x - c.cx) * (d.x - c.cx))), 6) AS dist_to_centroid
FROM dims d JOIN cent c ON d.label = c.label AND d.dim = c.dim
GROUP BY d.vec_id, d.label
""",
)
def q_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-label centroid + member distances,
    numpy-vectorized per Arrow batch; oracle recomputes via explode +
    group-by in pure SQL. Distances are rounded to 6 dp on both sides —
    numpy's pairwise summation and DuckDB's sequential SUM differ at
    ~1e-15 relative, far below the rounding grain."""
    emb = load(spark, sf_dir, "embeddings", columns=["vec_id", "label", "embedding"]).select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return centroid_distances(emb).withColumn(
        "dist_to_centroid", F.round("dist_to_centroid", 6)
    )
