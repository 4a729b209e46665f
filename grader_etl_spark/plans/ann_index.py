"""IVF ANN index as a STORED artifact: build once, serve by partition
pruning — the executable form of the swap documented on q_ann_ivf
("at scale the cell is a write-time partition key so probing IS
partition pruning").

`q_ann_ivf` trains and searches inside one query (the correctness
harness). Production splits the roles:

- **build_index**: train the coarse quantizer (clustering.kmeans —
  driver-numpy over a bounded deterministic sample), assign every
  vector its cell in one distributed codegen pass, and WRITE the
  corpus ``partitionBy("cell")`` with one file per cell, plus a tiny
  ``_centroids`` parquet. The cell is now a DIRECTORY.
- **search**: load the |k|-row centroid table, pick each query's
  nprobe nearest cells driver-side (k·dim floats — bounded), and scan
  ONLY those cell directories (`cell IN (...)` is partition pruning:
  the scan never opens the other cells' files — asserted via
  ``inputFiles()`` in tests), then exact-cosine re-rank within the
  probed cells.

At 100 TB the build is a periodic offline job and the serve cost is
(nprobe / k) of the corpus per query batch — the IO asymmetry that
makes IVF an INDEX rather than a filter. Rebuild cadence vs insert
rate is the operational knob; fresh vectors land in an unindexed
delta partition and are brute-forced alongside (the classic
IVF+delta serving layout), which composes here as a unionByName of
`search` results with `similarity.brute_force_topk` over the delta.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load, valid_vectors
from grader_etl_spark.operators.clustering import assign, kmeans
from grader_etl_spark.operators.llm_dedup import dot, with_norm

N_CELLS = 8


def build_index(spark: SparkSession, sf_dir: str, index_path: str, k: int = N_CELLS) -> None:
    """Train the quantizer, assign cells, write the cell-partitioned
    corpus + centroid table."""
    vecs = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    assigned, centroids = kmeans(vecs, k=k, cache_key=(sf_dir, "ann_index"))
    (
        assigned.select("vec_id", "embedding", "cluster")
        .withColumnRenamed("cluster", "cell")
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(os.path.join(index_path, "vectors"))
    )
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(cent_rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(index_path, "_centroids"))


def search(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    nprobe: int = 2,
    topk: int = 5,
) -> DataFrame:
    """Probe each query's nprobe nearest cells (driver-side over the
    k-row centroid table), scan ONLY those cells, exact re-rank.
    ``queries``: (vec_id, embedding). Returns (query_id, neighbor_id,
    rank, cosine)."""
    import numpy as np

    from pyspark.sql import Window

    cent = {
        r["cell"]: np.asarray(r["centroid"])
        for r in spark.read.parquet(os.path.join(index_path, "_centroids")).collect()
    }
    q_rows = [
        (r["vec_id"], np.asarray([float(x) for x in r["embedding"]]))
        for r in queries.select("vec_id", "embedding").collect()
    ]
    probed: set[int] = set()
    for _, v in q_rows:
        d2 = {c: float(((v - cv) ** 2).sum()) for c, cv in cent.items()}
        probed.update(sorted(d2, key=lambda c: (d2[c], c))[:nprobe])

    corpus = spark.read.parquet(os.path.join(index_path, "vectors")).filter(
        F.col("cell").isin(sorted(probed))
    )
    c = with_norm(
        corpus.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    ).alias("c")
    q = with_norm(
        queries.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    ).alias("q")
    cos = dot(F.col("q.v"), F.col("c.v")) / (F.col("q.norm") * F.col("c.norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
    )
