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
- **serve**: the full serving layout — `search`'s pruned-cell scan
  UNIONED with a brute-force pass over the small UNINDEXED DELTA
  (vectors ingested since the last build), one global re-rank per
  query. Fresh vectors are findable immediately, before any reindex;
  the delta side costs |delta|·|queries| dot products, bounded by the
  rebuild cadence, while the indexed side still prunes. The delta must
  be DISJOINT from the indexed corpus by construction (it is "rows
  written after the build watermark") — serve does not dedupe.

At 100 TB the build is a periodic offline job and the serve cost is
(nprobe / k) of the corpus per query batch — the IO asymmetry that
makes IVF an INDEX rather than a filter. Rebuild cadence vs insert
rate is the operational knob.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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


def extend_index(spark: SparkSession, index_path: str, delta: DataFrame):
    """Fold an unindexed delta INTO the stored index without
    retraining — the rebuild increment between ``serve``'s delta-union
    stopgap and a full ``build_index``: assign each fresh vector its
    cell with the EXISTING centroids (the same distributed codegen
    ``assign`` kernel the build uses), then MERGE the assigned rows
    into the cell-partitioned corpus keyed on vec_id
    (``plans/merge.merge_into``) — only the cells that actually
    receive fresh vectors are rewritten (copy-on-write partition
    swaps; untouched cell files stay byte-identical, pytest-pinned),
    the centroid table is untouched, and serving drops back to pure
    pruned-cell search with no delta union.

    Re-ingested vec_ids UPDATE their stored embedding; the new
    embedding can land in a different cell, so the merge runs in
    moved-key discovery mode (one key-only corpus scan) — the old row
    never survives as a duplicate. Centroids DRIFT as the corpus
    grows: the retrain-drift probe (tests/test_ann_index.py) measures
    the recall gap vs a full retrain on a shifted delta, and
    BASELINE.md records when the gap warrants ``build_index``.

    Returns the MergeStats (inserted/updated/cells rewritten)."""
    from grader_etl_spark.plans.merge import merge_into

    cent_rows = sorted(
        spark.read.parquet(os.path.join(index_path, "_centroids")).collect(),
        key=lambda r: r["cell"],
    )
    centroids = [list(r["centroid"]) for r in cent_rows]
    fresh = valid_vectors(delta.select("vec_id", "embedding"))
    assigned = assign(fresh, centroids).select(
        "vec_id", "embedding", F.col("cluster").cast("int").alias("cell")
    )
    return merge_into(
        spark, os.path.join(index_path, "vectors"), assigned,
        keys=["vec_id"], partition_col="cell",
        prune_with_source_partitions=False,
    )


def _probed_corpus(
    spark: SparkSession, index_path: str, queries: DataFrame, nprobe: int
) -> DataFrame:
    """The pruned-cell scan: pick each query's nprobe nearest cells
    driver-side over the |k|-row centroid table (bounded), filter the
    cell-partitioned corpus to their union — `cell IN (...)` reaches
    the scan as a PartitionFilter."""
    import numpy as np

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
    return spark.read.parquet(os.path.join(index_path, "vectors")).filter(
        F.col("cell").isin(sorted(probed))
    )


def _score(corpus: DataFrame, queries: DataFrame) -> DataFrame:
    """Exact cosine of every (query, corpus) pair, queries broadcast:
    (query_id, neighbor_id, cosine). try_divide — a zero-norm vector
    has NULL cosine (ranked last), never an ANSI throw."""
    c = with_norm(
        corpus.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    ).alias("c")
    q = with_norm(
        queries.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    ).alias("q")
    cos = F.try_divide(dot(F.col("q.v"), F.col("c.v")), F.col("q.norm") * F.col("c.norm"))
    return c.join(F.broadcast(q), F.col("q.vec_id") != F.col("c.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        cos.alias("cosine"),
    )


def _rank_topk(scored: DataFrame, topk: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= topk
    )


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
    return _rank_topk(
        _score(_probed_corpus(spark, index_path, queries, nprobe), queries), topk
    )


def serve(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    delta: DataFrame | None = None,
    nprobe: int = 2,
    topk: int = 5,
) -> DataFrame:
    """IVF + delta serving: union the pruned-cell candidates with a
    brute-force pass over the small unindexed ``delta`` (vectors
    ingested since the last build — fresh vectors are findable BEFORE
    any reindex), then ONE global per-query re-rank. The indexed side
    keeps its PartitionFilters (the union is above both scans); the
    delta side is a broadcast-query cross-score bounded by |delta|.
    ``delta``: (vec_id, embedding), disjoint from the indexed corpus.
    Returns (query_id, neighbor_id, rank, cosine)."""
    scored = _score(_probed_corpus(spark, index_path, queries, nprobe), queries)
    if delta is not None:
        # the defensive vector gate applies to fresh ingest too — an
        # embedding model's failure rows arrive via the delta first
        fresh = valid_vectors(delta.select("vec_id", "embedding"))
        scored = scored.unionByName(_score(fresh, queries))
    return _rank_topk(scored, topk)
