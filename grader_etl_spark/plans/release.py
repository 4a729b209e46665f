"""Versioned corpus RELEASE — the capstone composition of the
training-data pipeline: curate → split → shard → write → manifest,
content-addressed so re-releasing the same corpus is a no-op.

The reference's terminal stage is an emailed one-row report
(/root/reference/main.py:291-345); a training-data engine's terminal
stage is a REPRODUCIBLE dataset artifact. This plan produces one:

- **curate**: plans.curation.curate — quality gate → exact dedup →
  near-dup prune (each stage already oracle-checked on its own).
- **split**: the q_train_split hash rule (~90/5/5 by doc_id md5
  range) — a doc's split never changes as the corpus grows.
- **shard**: the q_corpus_shards hash assignment; writer path is
  repartition(split, shard) with one file per (split, shard) leaf —
  the data-loader contract (no small files, stable addressing).
- **manifest**: per-(split, shard) doc/token counts plus an md5 over
  the shard's SORTED doc_id list, combined into one corpus-level
  version hash. Hashing is hierarchical — shard digests first, then
  a digest of digests — so no global sort ever happens: the shard
  digest sorts only its own id list (bounded by shard size), the
  combine sorts |shards| rows.

The version hash is the directory name (``v<12 hex>``): same curated
content + same params ⇒ same version ⇒ the writer skips the copy
entirely (idempotent re-release). Changing any upstream stage
changes the hash, so a release can never silently overwrite a
different corpus. tests/test_release.py pins: no-op re-release,
one file per leaf, manifest↔data reconciliation, and read-back
equality with the curated set.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.functions.hashing import md5_32
from grader_etl_spark.io import load
from grader_etl_spark.operators.sharding import N_SHARDS
from grader_etl_spark.plans.curation import curate

# q_train_split's md5-hex range rule (sampling.py): first 2 hex chars
# of md5(doc_id) — [00,e6) train (~90%), [e6,f3) val, [f3,ff] test.
# Identical expression so the release's splits ARE q_train_split's.
_SPLIT_EXPR = "substring(md5(CAST(doc_id AS STRING)), 1, 2)"


def _with_split_and_shard(docs: DataFrame) -> DataFrame:
    two = F.expr(_SPLIT_EXPR)
    return docs.withColumn(
        "split",
        F.when(two < "e6", "train").when(two < "f3", "val").otherwise("test"),
    ).withColumn(
        "shard", (md5_32(F.concat(F.lit("shard:"), F.col("doc_id"))) % N_SHARDS).cast("int")
    )


def build_manifest(curated: DataFrame) -> DataFrame:
    """Per-(split, shard) manifest rows: doc count, token count, and
    the shard digest (md5 of the comma-joined ascending doc_id list)."""
    return (
        _with_split_and_shard(curated)
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))).alias(
                "shard_digest"
            ),
        )
    )


def corpus_version(manifest_rows: list) -> str:
    """Digest of shard digests, ordered by (split, shard) — stable
    under any partitioning of the upstream computation."""
    h = hashlib.md5()
    for r in sorted(manifest_rows, key=lambda r: (r["split"], r["shard"])):
        h.update(f"{r['split']}/{r['shard']}:{r['shard_digest']};".encode())
    return h.hexdigest()[:12]


def release(spark: SparkSession, sf_dir: str, out_root: str) -> DataFrame:
    """Run the full release. Returns the one-row release record:
    version, whether this call wrote it (vs found it), and corpus
    totals. The written layout is
    ``{out_root}/v{version}/split=.../shard=NN/part-*.parquet`` plus
    ``_manifest.json`` at the version root."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    curated_ids = curate(docs)  # (doc_id, n_words)
    curated = curated_ids.join(docs, "doc_id")

    manifest = build_manifest(curated_ids)
    mrows = manifest.collect()  # |splits|×|shards| rows — bounded
    version = corpus_version(mrows)
    vdir = os.path.join(out_root, f"v{version}")

    wrote = False
    if not os.path.isdir(vdir):
        wrote = True
        out = _with_split_and_shard(curated).repartition("split", "shard")
        (
            out.sortWithinPartitions("doc_id")
            .write.partitionBy("split", "shard")
            .mode("errorifexists")
            .parquet(vdir)
        )
        with open(os.path.join(vdir, "_manifest.json"), "w") as f:
            json.dump(
                {
                    "version": version,
                    "shards": [
                        {
                            "split": r["split"],
                            "shard": r["shard"],
                            "n_docs": r["n_docs"],
                            "n_tokens": r["n_tokens"],
                            "digest": r["shard_digest"],
                        }
                        for r in sorted(mrows, key=lambda r: (r["split"], r["shard"]))
                    ],
                },
                f,
                indent=1,
            )
    return spark.createDataFrame(
        [
            (
                version,
                wrote,
                int(sum(r["n_docs"] for r in mrows)),
                int(sum(r["n_tokens"] for r in mrows)),
                len(mrows),
            )
        ],
        "version string, wrote boolean, n_docs long, n_tokens long, n_leaves int",
    )
