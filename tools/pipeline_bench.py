"""End-to-end pipeline bench: the composed training-data run a
pipeline owner actually schedules — intake → quality gate → exact
dedup → near-dup prune → shard/split stats → versioned release
(parquet write + manifest) — with per-stage wall seconds.

Two views are reported:

* **staged**: every stage boundary persisted and forced with a
  count, so each wall is that stage's INCREMENTAL work (and the row
  funnel comes for free).
* **composed**: one cold `release()` call end-to-end into a fresh
  directory — the single number to schedule, including the write.

Run standalone (`python tools/pipeline_bench.py`) or from bench.py
(which folds the result into BENCH_FULL.json / the summary line).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grader_etl_spark.io import load  # noqa: E402
from grader_etl_spark.plans.curation import exact_dedup, neardup_prune, quality_gate  # noqa: E402
from grader_etl_spark.plans.release import build_manifest, release  # noqa: E402


def run_pipeline_bench(spark, sf_dir: str) -> dict:
    """Returns {"stages": {name: sec}, "rows": {name: n},
    "composed_sec": sec, "total_staged_sec": sec}."""
    stages: dict[str, float] = {}
    rows: dict[str, int] = {}

    def mark(name: str, df, t0: float) -> None:
        rows[name] = df.count()
        stages[name] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    docs = load(
        spark, sf_dir, "documents", columns=["doc_id", "text", "lang", "source"]
    ).persist()
    mark("intake", docs, t0)

    t0 = time.perf_counter()
    gated = quality_gate(docs).persist()
    mark("quality_gate", gated, t0)

    t0 = time.perf_counter()
    keepers = exact_dedup(gated)  # persists internally
    mark("exact_dedup", keepers, t0)

    t0 = time.perf_counter()
    curated = neardup_prune(keepers).persist()
    mark("neardup_prune", curated, t0)

    t0 = time.perf_counter()
    manifest = build_manifest(curated).persist()
    mark("shard_manifest", manifest, t0)

    tmp = tempfile.mkdtemp(prefix="pipeline_bench_release_")
    try:
        t0 = time.perf_counter()
        rel = release(spark, sf_dir, os.path.join(tmp, "staged")).collect()[0]
        stages["release_write"] = round(time.perf_counter() - t0, 3)
        rows["release_docs"] = rel["n_docs"]

        for df in (docs, gated, keepers, curated, manifest):
            df.unpersist()
        spark.catalog.clearCache()

        # Composed cold run: one call, fresh output dir, no warm stages.
        t0 = time.perf_counter()
        release(spark, sf_dir, os.path.join(tmp, "composed")).collect()
        composed = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.clearCache()

    return {
        "stages": stages,
        "rows": rows,
        "composed_sec": composed,
        "total_staged_sec": round(sum(stages.values()), 3),
    }


def main() -> None:
    from grader_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="grader-etl-spark-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM so stage walls measure the pipeline, not startup.
    load(spark, sf_dir, "documents", columns=["doc_id"]).count()
    print(json.dumps(run_pipeline_bench(spark, sf_dir), indent=1))


if __name__ == "__main__":
    main()
