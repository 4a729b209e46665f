"""Stored IVF index: probing scans ONLY the probed cells' files, and
recall vs brute force clears the floor."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from grader_etl_spark.io import load
from grader_etl_spark.operators.similarity import brute_force_topk
from grader_etl_spark.plans.ann_index import N_CELLS, build_index, search


def test_index_search_prunes_partitions_and_recalls(spark, sf_dir, tmp_path):
    index = str(tmp_path / "ivf")
    build_index(spark, sf_dir, index)

    # One file per cell directory.
    vec_root = os.path.join(index, "vectors")
    cells = [d for d in os.listdir(vec_root) if d.startswith("cell=")]
    assert 1 < len(cells) <= N_CELLS

    emb = load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # Partition pruning: a single-query nprobe=1 search must plan a
    # cell PartitionFilter (the AQE wrapper hides leaf metrics, so
    # assert the filter reached the scan's partition level) AND its
    # results must come from exactly one cell.
    one = search(spark, index, emb.filter(F.col("vec_id") == 0), nprobe=1, topk=5)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    cell_of = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(os.path.join(index, "vectors"))
        .select("vec_id", "cell")
        .collect()
    }
    one_neighbors = [r["neighbor_id"] for r in one.collect()]
    assert one_neighbors
    assert len({cell_of[n] for n in one_neighbors}) == 1

    queries = emb.filter(F.col("vec_id") < 5)
    res = search(spark, index, queries, nprobe=2, topk=5)
    got = {(r["query_id"], r["neighbor_id"]) for r in res.collect()}

    # Recall floor vs exact brute force over the same corpus.
    e = load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall


def test_serve_unions_delta_and_keeps_pruning(spark, sf_dir, tmp_path):
    """IVF+delta serving layout: (a) the indexed side still plans a
    cell PartitionFilter under the union, (b) recall vs exact brute
    force clears the IVF-only floor, (c) a FRESH vector (in the delta,
    absent from the index) is findable before any reindex."""
    from grader_etl_spark.plans.ann_index import serve

    emb = load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]

    # Build the index on the corpus MINUS the last 5 vectors; those 5
    # become the unindexed delta (plus one synthetic fresh vector that
    # exactly duplicates query 0 — cosine 1.0, must surface as top-1).
    indexed_dir = str(tmp_path / "indexed_sf")
    import os as _os
    import shutil

    _os.makedirs(indexed_dir, exist_ok=True)
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{indexed_dir}/{t}.parquet")
    emb.filter(F.col("vec_id") <= max_id - 5).write.mode("overwrite").parquet(
        f"{indexed_dir}/embeddings.parquet"
    )
    index = str(tmp_path / "ivf_delta")
    build_index(spark, indexed_dir, index)

    q0_vec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    fresh_id = max_id + 1000
    fresh = spark.createDataFrame(
        [(int(fresh_id), [float(x) for x in q0_vec])],
        "vec_id bigint, embedding array<float>",
    )
    delta = emb.filter(F.col("vec_id") > max_id - 5).unionByName(fresh)

    queries = emb.filter(F.col("vec_id") < 5)
    res = serve(spark, index, queries, delta=delta, nprobe=2, topk=5)

    # (a) PartitionFilters survive the union.
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    rows = res.collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}

    # (c) the fresh exact-duplicate of query 0 is its top-1 neighbor.
    top1_q0 = [r for r in rows if r["query_id"] == 0 and r["rank"] == 1]
    assert top1_q0 and top1_q0[0]["neighbor_id"] == fresh_id
    assert abs(top1_q0[0]["cosine"] - 1.0) < 1e-9

    # (b) recall vs exact brute force over indexed+delta clears the
    # IVF-only floor (fresh vector included in the exact corpus).
    full = emb.unionByName(fresh).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(full, full.filter(F.col("vec_id") < 5), k=5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall
