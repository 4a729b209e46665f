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


def _indexed_subset_dir(spark, sf_dir, tmp_path, emb, max_keep):
    """An sf_dir clone whose embeddings table stops at vec_id <=
    max_keep — the pre-delta corpus build_index trains on."""
    import shutil

    d = str(tmp_path / "indexed_sf")
    os.makedirs(d, exist_ok=True)
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    emb.filter(F.col("vec_id") <= max_keep).write.mode("overwrite").parquet(
        f"{d}/embeddings.parquet"
    )
    return d


def _cell_file_state(index):
    out = {}
    root = os.path.join(index, "vectors")
    for d in os.listdir(root):
        if d.startswith("cell="):
            for n in os.listdir(os.path.join(root, d)):
                if n.endswith(".parquet"):
                    p = os.path.join(root, d, n)
                    s = os.stat(p)
                    out[f"{d}/{n}"] = (s.st_mtime_ns, s.st_size)
    return out


def test_extend_index_folds_delta_into_touched_cells_only(spark, sf_dir, tmp_path):
    """Round-7 incremental IVF maintenance: extend_index assigns the
    delta with the EXISTING centroids and merges it cell-partitioned —
    (a) only receiving cells are rewritten (untouched cell files
    byte-identical), (b) after the fold, plain search (NO delta union)
    finds the fresh vector, (c) recall after extend >= recall of the
    delta-union serve over the same corpus."""
    from grader_etl_spark.plans.ann_index import extend_index, serve

    emb = load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    indexed_dir = _indexed_subset_dir(spark, sf_dir, tmp_path, emb, max_id - 5)
    index = str(tmp_path / "ivf_ext")
    build_index(spark, indexed_dir, index)
    before = _cell_file_state(index)

    q0_vec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    fresh_id = max_id + 1000
    fresh = spark.createDataFrame(
        [(int(fresh_id), [float(x) for x in q0_vec])],
        "vec_id bigint, embedding array<float>",
    )
    delta = emb.filter(F.col("vec_id") > max_id - 5).unionByName(fresh)
    queries = emb.filter(F.col("vec_id") < 5)

    # the pre-fold baseline this extend must not regress
    serve_rows = serve(spark, index, queries, delta=delta, nprobe=2, topk=5).collect()

    stats = extend_index(spark, index, delta)
    assert stats.inserted == 6 and stats.deleted == 0

    after = _cell_file_state(index)
    untouched = {f for f in before if before[f] == after.get(f)}
    assert untouched, "extend rewrote every cell"
    assert len(after) >= len(before)

    # (b) plain pruned-cell search, no delta: fresh duplicate is top-1
    res_rows = search(spark, index, queries, nprobe=2, topk=5).collect()
    top1_q0 = [r for r in res_rows if r["query_id"] == 0 and r["rank"] == 1]
    assert top1_q0 and top1_q0[0]["neighbor_id"] == fresh_id
    assert abs(top1_q0[0]["cosine"] - 1.0) < 1e-9

    # (c) recall(after extend) >= recall(delta-union serve), both vs
    # exact brute force over the SAME corpus (indexed + delta)
    from grader_etl_spark.operators.similarity import brute_force_topk

    full = emb.unionByName(fresh).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(full, full.filter(F.col("vec_id") < 5), k=5).collect()
    }
    rec_ext = len({(r["query_id"], r["neighbor_id"]) for r in res_rows} & exact) / len(exact)
    rec_srv = len({(r["query_id"], r["neighbor_id"]) for r in serve_rows} & exact) / len(exact)
    assert rec_ext >= rec_srv, (rec_ext, rec_srv)

    # idempotent refold: same delta again leaves the corpus row-set
    # unchanged (whole-row update of identical rows)
    rows1 = {tuple(r) for r in spark.read.parquet(os.path.join(index, "vectors"))
             .select("vec_id", "cell").collect()}
    extend_index(spark, index, delta)
    rows2 = {tuple(r) for r in spark.read.parquet(os.path.join(index, "vectors"))
             .select("vec_id", "cell").collect()}
    assert rows1 == rows2


def test_extend_vs_retrain_drift_probe(spark, sf_dir, tmp_path):
    """The operational knob extend_index documents. A delta whose
    distribution has DRIFTED (every component shifted +2) assigns
    wholesale into its nearest OLD cell, overloading it; a full
    retrain redistributes centroids over the new mass. At this scale
    RECALL never drops (the drifted queries' nearest centroid is
    exactly the overloaded cell — measured 1.000 both ways), so the
    honest drift cost is the IO asymmetry: the fraction of the corpus
    a probe must scan. The probe pins both — recall stays at the
    exact-retrain level, and the extended index's nprobe=1 scan
    fraction strictly exceeds the retrained one (measured 0.559 vs
    0.500 — BASELINE.md records the rebuild-cadence guidance)."""
    import shutil

    from grader_etl_spark.operators.similarity import brute_force_topk
    from grader_etl_spark.plans.ann_index import _probed_corpus, extend_index

    emb = load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    shifted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: (x + F.lit(2.0)).cast("float")).alias("embedding"),
    )

    # extended path: train on the original corpus, fold the drifted delta
    index = str(tmp_path / "ivf_drift")
    build_index(spark, sf_dir, index)
    extend_index(spark, index, shifted)

    # retrained path: full build over original + drifted
    combined_dir = str(tmp_path / "combined_sf")
    os.makedirs(combined_dir, exist_ok=True)
    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem", "events", "documents"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{combined_dir}/{t}.parquet")
    emb.unionByName(shifted).write.mode("overwrite").parquet(
        f"{combined_dir}/embeddings.parquet"
    )
    index2 = str(tmp_path / "ivf_retrained")
    build_index(spark, combined_dir, index2)

    queries = shifted.filter(F.col("vec_id") < 100005)  # 5 drifted queries
    full = emb.unionByName(shifted).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            full, full.filter(F.col("vec_id").between(100000, 100004)), k=5
        ).collect()
    }

    def recall(ix):
        got = {(r["query_id"], r["neighbor_id"])
               for r in search(spark, ix, queries, nprobe=2, topk=5).collect()}
        return len(got & exact) / len(exact)

    rec_ext, rec_ret = recall(index), recall(index2)
    assert rec_ret >= rec_ext - 1e-9, (rec_ext, rec_ret)
    assert rec_ret >= 0.6, rec_ret

    # the drift cost: probe-scan fraction (corpus rows a nprobe=1
    # search must score) — extend overloads the receiving cell,
    # retrain redistributes it
    total = emb.count() * 2
    frac_ext = _probed_corpus(spark, index, queries, 1).count() / total
    frac_ret = _probed_corpus(spark, index2, queries, 1).count() / total
    assert frac_ext > frac_ret, (frac_ext, frac_ret)
    print(f"drift probe: recall ext={rec_ext:.3f} ret={rec_ret:.3f}; "
          f"nprobe=1 scan fraction ext={frac_ext:.3f} ret={frac_ret:.3f}")
