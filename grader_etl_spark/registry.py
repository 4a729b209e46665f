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

import os
import re
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

_CAST_OPEN = re.compile(r"CAST\s*\(", re.IGNORECASE)
_AS_DOUBLE_TAIL = re.compile(r"\s+AS\s+DOUBLE\s*$", re.IGNORECASE)
_VARCHAR_CAST = re.compile(r"CAST\s*\(.*AS\s+VARCHAR\s*\)$", re.IGNORECASE | re.DOTALL)


def _stable_double_casts(sql: str) -> str:
    """Rewrite every oracle ``CAST(expr AS DOUBLE)`` to route through
    VARCHAR: ``CAST(CAST(expr AS VARCHAR) AS DOUBLE)``.

    DuckDB's direct DECIMAL→DOUBLE cast is DOUBLE-ROUNDED (int128 →
    double, then a second rounding at the /10^scale division): measured
    4,583 / 20,000 one-ulp mismatches vs the correctly-rounded
    conversion on 15-24-significant-digit decimals, while Spark's
    BigDecimal path matched python strtod on all 20,000 (round 6 —
    surfaced by the zipf+magnitude composed fuzz as a 1-ulp
    ``part_value`` flip at 1.9e12, exactly one double-spacing). The
    VARCHAR route (exact decimal digits → correctly-rounded parse) is
    bit-identical to Spark's conversion on every sampled value, and is
    the IDENTITY for DOUBLE inputs (shortest-roundtrip print) and for
    BIGINT/HUGEINT (exact digits). Rewriting at registration keeps the
    519 cast sites across 150 oracles on one definition.

    Exclusions from the varchar route (direct cast preserved): a bare
    ``x`` operand — the ``list_transform`` element variable, always
    FLOAT32 in this engine, where the DIRECT cast is exact widening on
    both engines and the varchar route would instead re-round through
    the float's shortest decimal repr — and any operand ending in an
    explicit ``/*exact*/`` marker comment (the opt-out for a future
    FLOAT lambda variable with another name; relying on the name alone
    would silently re-round it).

    Scanner hardening (round 7): parentheses inside single-quoted SQL
    string literals (with ``''`` escapes) don't count toward depth,
    and an unbalanced CAST raises at REGISTRATION instead of silently
    producing a mangled rewrite; tests/test_registry_smoke.py
    additionally EXPLAINs every registered oracle against DuckDB."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        m = _CAST_OPEN.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i : m.start()])
        depth, k = 0, m.end() - 1
        while k < n:
            ch = sql[k]
            if ch == "'":
                # skip the quoted literal ('' is the escaped quote)
                k += 1
                while k < n:
                    if sql[k] == "'":
                        if k + 1 < n and sql[k + 1] == "'":
                            k += 2
                            continue
                        break
                    k += 1
                if k >= n:
                    raise ValueError(
                        "unterminated string literal inside CAST while "
                        f"rewriting oracle SQL near: {sql[m.start():m.start()+80]!r}"
                    )
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if k >= n or depth != 0:
            raise ValueError(
                "unbalanced parentheses inside CAST while rewriting "
                f"oracle SQL near: {sql[m.start():m.start()+80]!r}"
            )
        inner = _stable_double_casts(sql[m.end() : k])
        tail = _AS_DOUBLE_TAIL.search(inner)
        if tail is not None:
            expr = inner[: tail.start()]
            es = expr.strip()
            if es == "x" or es.endswith("/*exact*/") or _VARCHAR_CAST.fullmatch(es):
                out.append(f"CAST({inner})")
            else:
                out.append(f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)")
        else:
            out.append(f"CAST({inner})")
        i = k + 1
    return "".join(out)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of query ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=None if oracle is None else _stable_double_casts(oracle),
            doc=fn.__doc__ or "",
        )
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
# Reliable-checkpoint FILE paths per memo, same appId scoping: unlike
# localCheckpoint blocks (freed by unpersist), reliable checkpoints
# live as files under the checkpoint dir and must be deleted there.
_MEMO_CKPT_FILES: set[tuple[str, str]] = set()
# EVERY reliable-checkpoint file of the session, memo or not: the
# per-round checkpoints inside iterative operators (graph contraction,
# BPE merges, MMR rounds) are dead once their query's action returns,
# but Spark never deletes reliable-checkpoint files while the context
# lives (cleanCheckpoints is GC-driven and off by default) — without
# explicit tracking a long-lived session grows its checkpoint dir by
# one file set per registry lap, forever (found by tools/soak.py:
# post-evict bytes 21007 -> 42014 -> 63021 over three laps).
# clear_session_memos — the corpus-rollover point, after which no
# earlier frame is recomputed by contract — deletes them all.
_SESSION_CKPT_FILES: set[tuple[str, str]] = set()


def checkpoint_frame(df: DataFrame, eager: bool = True) -> DataFrame:
    """The ONE lineage-truncation point for every iterative / memoized
    frame in the engine (memo builders, graph contraction rounds, BPE
    merge rounds, MMR selection rounds).

    Default: ``localCheckpoint`` — executor-local blocks, no
    distributed-FS round trip; right for local[‍N] where executors
    cannot be lost. With ``SPARK_GRAFT_CHECKPOINT_DIR`` set the frame
    takes a RELIABLE ``checkpoint()`` into that directory instead —
    the cluster profile, because a localCheckpoint block dies with its
    executor and kills every consumer of the memo mid-job; on a
    1000-executor cluster executor loss is routine, so iterative
    lineage must truncate into durable storage (HDFS/S3). The env var
    is read per call, and ``setCheckpointDir`` is applied once per
    SparkContext (re-setting it would mint a fresh UUID subdir per
    call and scatter the files)."""
    ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if not ckpt_dir:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(ckpt_dir)
    out = df.checkpoint(eager=eager)
    try:
        rdd = out._jdf.queryExecution().analyzed().rdd()
        ckpt_file = rdd.getCheckpointFile()
        if ckpt_file.isDefined():
            _SESSION_CKPT_FILES.add((sc.applicationId, ckpt_file.get()))
    except Exception:
        pass  # non-JVM plan shape: the file falls back to context-exit cleanup
    return out


def memo_checkpoint(df: DataFrame) -> DataFrame:
    """Checkpoint a session-memo frame and record the backing storage
    (RDD id, plus the checkpoint file for the reliable profile), both
    scoped to the owning SparkContext's applicationId. Every
    ``*_CACHE`` builder routes its checkpoint through here — the memo
    dicts hold the DataFrames; this tracks the storage."""
    out = checkpoint_frame(df)
    try:
        app_id = df.sparkSession.sparkContext.applicationId
        rdd = out._jdf.queryExecution().analyzed().rdd()
        _MEMO_RDD_IDS.add((app_id, rdd.id()))
        ckpt_file = rdd.getCheckpointFile()
        if ckpt_file.isDefined():
            _MEMO_CKPT_FILES.add((app_id, ckpt_file.get()))
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
    against ``getPersistentRDDs`` — and EVERY reliable-checkpoint file
    written this session (memo or per-round iterative) is deleted:
    after rollover no earlier frame is recomputed by contract, so the
    files are dead storage Spark itself never reclaims while the
    context lives (tools/soak.py pins zero lap-over-lap growth)."""
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
        _MEMO_CKPT_FILES.clear()
        _SESSION_CKPT_FILES.clear()
        return
    try:
        app_id = spark.sparkContext.applicationId
        owned = {rid for aid, rid in _MEMO_RDD_IDS if aid == app_id}
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() in owned:
                kv._2().unpersist(True)
        # Reliable-checkpoint files (cluster profile) are storage, not
        # block-manager blocks: delete them through the Hadoop FS API so
        # eviction works on any scheme (file:/, hdfs:/, s3a:/), only for
        # paths recorded under THIS context.
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        jvm = spark.sparkContext._jvm
        for aid, path in list(_MEMO_CKPT_FILES | _SESSION_CKPT_FILES):
            if aid != app_id:
                continue
            try:
                jpath = jvm.org.apache.hadoop.fs.Path(path)
                jpath.getFileSystem(hconf).delete(jpath, True)
            except Exception:
                pass  # already gone / permission: dicts are dropped regardless
        # Drop everything: the current context's ids were just released
        # and ids from dead contexts are unreleasable by definition.
        _MEMO_RDD_IDS.clear()
        _MEMO_CKPT_FILES.clear()
        _SESSION_CKPT_FILES.clear()
    except Exception:
        pass  # best-effort storage release; the memo dicts are already gone
