"""Query registry — the correctness contract in one place.

Every operator declared done in SURVEY.md §2 registers here with:

- ``fn(spark, sf_dir) -> DataFrame``  — the PySpark implementation
- ``oracle``                          — the ANSI-SQL twin DuckDB runs on
  the same parquet tables (or ``None`` for non-SQL-expressible ops,
  which the driver downgrades to a rows-only check)

``__spark_entry__.py`` exposes exactly this registry to the driver.

Column-name discipline: the driver's comparator sorts columns by name
before hashing values, so every computed column is aliased to the
same name on both sides. Value discipline: oracle-checked queries
prefer exactly-representable outputs (counts, decimals, strings,
pinned dates); double sums are cast to DECIMAL first on both sides so
the aggregate is order-independent and bit-equal.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of query ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so registrations run."""
    # Imported lazily to avoid import cycles (operators import `query`).
    from grader_etl_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        arrays,
        asof,
        behavior,
        bloom,
        bootstrap,
        clustering,
        corpus_filters,
        dedup,
        fuzzy,
        governance,
        graph,
        grouped_map,
        insights,
        joins,
        lifecycle,
        llm_dedup,
        multimodal,
        pca,
        projections,
        sampling,
        selection,
        setops,
        sharding,
        similarity,
        sketches,
        skew,
        statistics,
        text_analysis,
        time_windows,
        tpch_extra,
        tpch_final,
        tpch_more,
        trainprep,
        unpivot,
        validation,
        windows,
    )
    from grader_etl_spark.plans import curation  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all_operators()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    load_all_operators()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


# Backing-RDD ids of every memo localCheckpoint created this session,
# recorded by memo_checkpoint() so clear_session_memos(spark) can
# unpersist the blocks DETERMINISTICALLY (a long-lived service must not
# wait on JVM GC to reclaim per-corpus-version checkpoint storage).
# Keyed as (applicationId, rdd_id): RDD ids restart near 0 after a
# SparkContext restart, so a bare id recorded under a dead context
# would collide with a NEW session's unrelated persistent RDDs and
# clear_session_memos(spark) would force-unpersist frames it doesn't
# own. The appId scopes each recorded id to the context that made it.
_MEMO_RDD_IDS: set[tuple[str, int]] = set()


def memo_checkpoint(df: DataFrame) -> DataFrame:
    """Checkpoint a session-memo frame and record the backing RDD id
    (scoped to the owning SparkContext's applicationId). Every
    ``*_CACHE`` builder routes its checkpoint through here — the memo
    dicts hold the DataFrames; this tracks the storage."""
    out = df.localCheckpoint()
    try:
        app_id = df.sparkSession.sparkContext.applicationId
        _MEMO_RDD_IDS.add((app_id, out._jdf.queryExecution().analyzed().rdd().id()))
    except Exception:
        pass  # non-JVM plan shape: blocks fall back to GC reclamation
    return out


def clear_session_memos(spark: SparkSession | None = None) -> None:
    """Drop every session memo (the module-level ``*_CACHE`` dicts —
    shingle index, pair/signature memos, components, trade edges,
    curation stages, covariance, centroids). Callers that need a query
    to re-pay its memo-build cost (bench stall retries,
    isolation-sensitive tests, corpus-version rollover in a long-lived
    service) clear these. With a ``spark`` handle, the localCheckpoint
    blocks behind the memos are also unpersisted immediately (blocking)
    instead of waiting for JVM garbage collection — storage is freed
    the moment the memo is dropped, verified by tests/test_memos.py
    against ``getPersistentRDDs``."""
    import sys

    for mod_name, mod in list(sys.modules.items()):
        if not mod_name.startswith("grader_etl_spark"):
            continue
        for attr in dir(mod):
            if attr.endswith("_CACHE"):
                obj = getattr(mod, attr)
                if isinstance(obj, dict):
                    obj.clear()
    if spark is None:
        # The frames holding these checkpoints are gone either way —
        # forget the ids too (the old session's blocks fall back to GC
        # reclamation) so nothing stale survives a context restart.
        _MEMO_RDD_IDS.clear()
        return
    try:
        app_id = spark.sparkContext.applicationId
        owned = {rid for aid, rid in _MEMO_RDD_IDS if aid == app_id}
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() in owned:
                kv._2().unpersist(True)
        # Drop everything: the current context's ids were just released
        # and ids from dead contexts are unreleasable by definition.
        _MEMO_RDD_IDS.clear()
    except Exception:
        pass  # best-effort storage release; the memo dicts are already gone
