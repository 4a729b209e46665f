"""SparkSession factory.

One place to pin the execution profile so every test / bench / driver
entry point runs with the same, scale-minded defaults:

- AQE on (runtime re-planning: skew joins, broadcast demotion,
  partition coalescing) — the single most important knob for the
  100 TB target where static planning guesses wrong.
- UTC session timezone. The reference mixes three clocks (UTC fetch
  window, Postgres-local CURRENT_DATE, OS-local strftime — see
  /root/reference/main.py:104,281,62); we pin one and take report
  dates as explicit parameters, which also makes DuckDB oracles
  deterministic.
- Arrow enabled for pandas interchange (vectorized UDF path).
- Shuffle partitions sized from the env (local runs want ~cores, a
  real cluster wants thousands; never hardcode for one profile).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def _shuffle_partitions(cpus: int) -> int:
    """Shuffle-partition count: ~cores locally, overridable upward via
    SPARK_GRAFT_SHUFFLE for cluster-like profiles (a 1000-executor job
    runs thousands of shuffle partitions; the high-partition oracle run
    in BASELINE.md §robustness executes the suite at 2048 to prove
    results are partition-count-invariant UPWARD, not just downward)."""
    try:
        ov = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "0"))
    except ValueError:
        ov = 0
    return ov if ov > 0 else max(cpus, 8)


def stream_shuffle_partitions(cpus: int | None = None) -> int:
    """State-store partition count for STREAMING queries, decoupled
    from the batch shuffle width. Every micro-batch pays one state
    task (store open, update, commit, checkpoint) PER PARTITION, so
    the count should track expected state volume and ingest
    throughput, not host core count: at the bench's file-source
    micro-batches the former 32 (=cores) state partitions made the
    per-batch state machinery the wall (measured 4.7× on the tumbling
    daily report: 48.8 s → 10.4 s for the 20-batch replay at 8
    partitions). Env override SPARK_GRAFT_STREAM_SHUFFLE for
    deployments with real state volume; the count is baked into each
    query's checkpoint by Spark, so existing checkpoints keep their
    recorded width on restart."""
    try:
        ov = int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "0"))
    except ValueError:
        ov = 0
    return ov if ov > 0 else max(8, (cpus or _cpus()) // 4)


@contextmanager
def stream_start_conf(spark: SparkSession):
    """Scope `spark.sql.shuffle.partitions` down to the streaming
    width while a streaming query is STARTED (the conf is captured
    into the query's checkpoint at start; batch queries planned after
    the context exits see the session default again)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(stream_shuffle_partitions())
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _advisory_default(master: str) -> str:
    """Default AQE advisory post-shuffle partition size, derived from
    the execution profile instead of a flat constant (round-8 advice:
    a production deploy that forgets SPARK_GRAFT_ADVISORY must not
    inherit the bench-host tune). local[*] masters get 4m — this
    host's bench shuffles are MB-scale, where 64m coalesces CPU-heavy
    stages (per-pair verify kernels, decimal moment partials) to a
    SINGLE task. Any non-local master gets Spark's own 64m default,
    the volume-respecting production setting (guide §2.2/§9);
    SPARK_GRAFT_ADVISORY overrides either way."""
    return "4m" if master.startswith("local") else "64m"


def get_spark(app_name: str = "grader-etl-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) the session with the engine's standard config."""
    cpus = _cpus()
    # SPARK_GRAFT_AQE=0 turns adaptive execution off — used by the
    # execution-profile invariance probe (BASELINE.md: results must
    # be identical with and without runtime re-planning) and as an
    # operational escape hatch.
    aqe = os.environ.get("SPARK_GRAFT_AQE", "1") not in ("0", "false")
    master_url = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master_url)
        # --- planner / runtime -------------------------------------------
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the advisory target size when coalescing instead of
        # maximizing parallelism (the Spark docs' recommended setting:
        # "it's recommended to set this config to false and respect the
        # configured target size"). With parallelismFirst=true every
        # MB-scale exchange fans out to minPartitionSize-bounded
        # micro-tasks whose scheduling overhead dominates small stages
        # (measured ~0.1 s/query across the suite's tail at sf0.1).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # Advisory post-shuffle partition size. Scale-dependent knob,
        # env-parameterised (optimization guide §2.2/§9): production
        # clusters want 64-256m so reducers get real volume; this
        # host's bench shuffles are MB-scale, where 64m would coalesce
        # CPU-heavy stages (per-pair verify kernels, decimal moment
        # partials, window sorts) to a SINGLE task — a bytes-based
        # heuristic blind to per-row cost. The default is derived from
        # the master (_advisory_default: 4m local, 64m otherwise) so an
        # unconfigured cluster deploy never inherits the bench tune.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY") or _advisory_default(master_url),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(_shuffle_partitions(cpus)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        # --- semantics ----------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark's
        # vectorized reader; read as long and convert in io.load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- python interchange ------------------------------------------
        # Lets Python Data Source readers (sources/rest_datasource.py)
        # receive day-range predicates in pushFilters() and plan fewer
        # fetch partitions.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- local-mode memory hygiene -----------------------------------
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
