"""Versioned corpus release: content-addressed no-op re-release, one
file per (split, shard) leaf, manifest↔data reconciliation, and
read-back equality with the curated set.
"""

from __future__ import annotations

import glob
import json
import os

import pyspark.sql.functions as F

from grader_etl_spark.io import load
from grader_etl_spark.plans.curation import curate
from grader_etl_spark.plans.release import release


def test_release_is_content_addressed_and_reconciles(spark, sf_dir, tmp_path):
    out = str(tmp_path / "releases")

    rec1 = release(spark, sf_dir, out).collect()[0]
    assert rec1["wrote"] is True

    vdir = os.path.join(out, f"v{rec1['version']}")
    assert os.path.isdir(vdir)

    # Manifest reconciles with the record and with the data on disk.
    with open(os.path.join(vdir, "_manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["version"] == rec1["version"]
    assert sum(s["n_docs"] for s in manifest["shards"]) == rec1["n_docs"]
    assert len(manifest["shards"]) == rec1["n_leaves"]

    back = spark.read.parquet(vdir)
    assert back.count() == rec1["n_docs"]
    per_leaf = {
        (r["split"], r["shard"]): r["n"]
        for r in back.groupBy("split", "shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for s in manifest["shards"]:
        assert per_leaf[(s["split"], s["shard"])] == s["n_docs"]

    # One parquet file per leaf directory (the data-loader contract).
    for s in manifest["shards"]:
        leaf = os.path.join(vdir, f"split={s['split']}", f"shard={s['shard']}")
        files = [p for p in glob.glob(os.path.join(leaf, "*.parquet"))]
        assert len(files) == 1, leaf

    # Read-back docs == curated docs exactly.
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    curated_ids = {r["doc_id"] for r in curate(docs).collect()}
    assert {r["doc_id"] for r in back.collect()} == curated_ids

    # Second release of identical content: same version, no write.
    before = sorted(glob.glob(os.path.join(vdir, "**", "*"), recursive=True))
    rec2 = release(spark, sf_dir, out).collect()[0]
    assert rec2["version"] == rec1["version"]
    assert rec2["wrote"] is False
    assert sorted(glob.glob(os.path.join(vdir, "**", "*"), recursive=True)) == before
    # Still exactly one version directory.
    assert len([d for d in os.listdir(out) if d.startswith("v")]) == 1
