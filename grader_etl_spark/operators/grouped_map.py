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

from grader_etl_spark.io import load, valid_vectors, VALID_EMBEDDINGS_SQL
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize

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
    oracle=f"""
WITH dims AS (
  SELECT vec_id, label, d.i AS dim, d.x AS x
  FROM {VALID_EMBEDDINGS_SQL},
       LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                       generate_subscripts(embedding, 1) AS i) d
),
cent AS (
  SELECT label, dim, AVG(x) AS cx
  FROM dims GROUP BY label, dim
)
SELECT d.vec_id,
       d.label,
       CASE WHEN abs(sqrt(SUM((d.x - c.cx) * (d.x - c.cx)))) < 4.5e9 THEN floor((sqrt(SUM((d.x - c.cx) * (d.x - c.cx)))) * 1e6 + 0.5) / 1e6 ELSE (sqrt(SUM((d.x - c.cx) * (d.x - c.cx)))) END AS dist_to_centroid
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
    emb = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])).select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return centroid_distances(emb).withColumn(
        "dist_to_centroid", floor_quantize("dist_to_centroid", 6)
    )


PACK_BUDGET = 1024  # chars per packed training sequence

_PACK_SCHEMA = "source string, doc_id bigint, n_chars bigint, pack_id bigint, pack_fill bigint"


def pack_greedy(docs: DataFrame, budget: int = PACK_BUDGET, key: str = "source") -> DataFrame:
    """Greedy sequential bin packing of documents into fixed-budget
    training sequences, per group: walk docs in doc_id order, start a
    new pack whenever the next doc would overflow the budget."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, fills = [], []
        pack_id, fill = 0, 0
        first = True
        for n in pdf["n_chars"]:
            n = int(n)
            if first:
                fill = n
                first = False
            elif fill + n <= budget:
                fill += n
            else:
                pack_id += 1
                fill = n
            pack_ids.append(pack_id)
            fills.append(fill)
        return pd.DataFrame(
            {
                "source": pdf[key],
                "doc_id": pdf["doc_id"],
                "n_chars": pdf["n_chars"],
                "pack_id": pack_ids,
                "pack_fill": fills,
            }
        )

    return docs.groupBy(key).applyInPandas(kernel, schema=_PACK_SCHEMA)


@query(
    "q_pack_sequences",
    oracle=f"""
WITH RECURSIVE ordered AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents WHERE n_chars IS NOT NULL
),
packed AS (
  SELECT source, doc_id, n_chars, rn,
         CAST(0 AS BIGINT) AS pack_id, n_chars AS pack_fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.doc_id, o.n_chars, o.rn,
         CASE WHEN p.pack_fill + o.n_chars <= {PACK_BUDGET}
              THEN p.pack_id ELSE p.pack_id + 1 END,
         CASE WHEN p.pack_fill + o.n_chars <= {PACK_BUDGET}
              THEN p.pack_fill + o.n_chars ELSE o.n_chars END
  FROM packed p JOIN ordered o ON o.source = p.source AND o.rn = p.rn + 1
)
SELECT source, doc_id, n_chars, pack_id, pack_fill FROM packed
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (pretraining batch prep): greedily pack each
    source's documents, in stable doc_id order, into ≤{PACK_BUDGET}-char
    sequences — the running-fill reset makes this inherently
    sequential per group, so it is the canonical applyInPandas custom
    stateful operator: one shuffle on the group key, one Arrow batch
    and a tight Python loop per group. The oracle replays the same
    recursion as a DuckDB recursive CTE, so even this non-relational
    operator is value-checked, not just row-counted. At 100 TB the
    group key is (source, shard) so each packed stream stays
    worker-sized; packs never span groups by design.

    NULL contract: a doc with NULL n_chars cannot be budgeted, so the
    packer excludes it on BOTH sides (the recursive oracle would
    otherwise poison every later pack_fill with NULL)."""
    docs = load(spark, sf_dir, "documents", columns=["source", "doc_id", "n_chars"]).filter(
        F.col("n_chars").isNotNull()
    )
    return pack_greedy(docs)
