"""Copy-on-write MERGE INTO for partitioned parquet tables.

The reference's only conflict semantic is per-row ``INSERT ... ON
CONFLICT DO NOTHING`` (/root/reference/main.py:202), which
``ParquetStore.idempotent_append`` renders as a set-based anti-join.
A transactional table format (Delta/Iceberg) generalizes that to
MERGE — update/delete/insert in one keyed statement. delta-spark is
not in this container, but MERGE is a *semantic*, not a package: this
plan implements it directly on plain parquet, copy-on-write, the same
way the formats do under the hood —

1. **Prune**: only partitions that can contain matched rows are read
   or rewritten. With the standard upsert layout (the partition value
   is a function of the key, e.g. ``event_date = date(event_ts)``),
   those are exactly the source's partition values — a driver-sized
   list. If keys can MOVE between partitions, ``prune_with_source_
   partitions=False`` additionally discovers the partitions holding
   current matches with one key-only scan (broadcast source, column-
   pruned to the keys + partition column).
2. **Compose**: per touched partition, the post-merge content is an
   anti/semi-join algebra over (target_touched, source) — never a
   row-at-a-time loop, never a full-table rewrite.
3. **Stage**: the rewritten partitions are written to a sibling
   staging directory first (Spark's whole write machinery, normal
   task retries). The live table is not touched yet.
4. **Swap**: after the staging write fully succeeds, a JOURNAL file
   is fsync'd and each touched partition directory is swapped in with
   two atomic renames (old → trash, staged → live). Untouched
   partitions are never listed, read, or rewritten — their files stay
   byte-identical.

Crash contract: the journal is written only AFTER staging is
complete, so recovery is always ROLL-FORWARD — the swap loop is
idempotent (every step is guarded by existence checks), and
``recover()`` simply re-runs it. A crash before the journal exists
leaves only garbage staging dirs, which recovery sweeps. Durability
ordering is enforced with directory fsyncs: the journal's dirent is
fsync'd before the first rename (so no persisted rename can exist
without a recoverable journal), and every rename is fsync'd before
the journal is unlinked in ``_finish`` (so a missing journal proves
the commit fully persisted and the trash/staging leftovers really
are garbage — without that barrier a power loss could persist the
renames but drop the journal dirent, and the journal-less sweep
would delete the only copy of retired partitions).

Reader consistency: each commit's LAST step atomically publishes a
versioned manifest (``plans/manifest.py``) naming every partition
dir + content nonce; ``manifest.read_table``/``snapshot`` verify it
and therefore see old-or-new, never a torn mid-swap listing. (Plain
``spark.read.parquet(path)`` still works and keeps the round-6
documented mid-swap window; the manifest readers close it.)

Concurrency: writers serialize on the same advisory ``_store_lock``
as idempotent_append, so merge/append/merge interleavings see each
other's commits.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.plans import manifest as _manifest
from grader_etl_spark.plans.manifest import _fsync_dir
from grader_etl_spark.plans.pipeline import _store_lock

# Partition directory-name rendition we accept without owning Hive's
# full escaping table: dates, ints, plain tokens. Everything Hive
# percent-escapes on disk (':' in timestamps, '/', '%', '#', ...)
# is refused rather than half-implemented — a value whose dirname we
# would compute differently from the writer silently no-ops merges.
_SAFE_PARTITION_VALUE = re.compile(r"^[A-Za-z0-9_.\-T ]+$")

_BROADCAST_ROWS = 1_000_000  # source side under this → explicit broadcast


@dataclass(frozen=True)
class MergeStats:
    inserted: int
    updated: int
    deleted: int
    partitions_rewritten: int
    noop: bool = False


def _journal_path(path: str) -> str:
    return path.rstrip("/") + ".merge-journal"


def _partition_dirs(root: str, partition_col: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    pref = f"{partition_col}="
    return sorted(
        d for d in os.listdir(root)
        if d.startswith(pref) and os.path.isdir(os.path.join(root, d))
    )


def _dirname_for(partition_col: str, value) -> str:
    # Spark/Hive writes booleans lowercase (pt=true); str(True) is not
    # the on-disk rendition and would silently miss every dir.
    s = "true" if value is True else "false" if value is False else str(value)
    if not _SAFE_PARTITION_VALUE.match(s):
        raise ValueError(
            f"partition value {s!r} needs Hive percent-escaping; "
            "merge_into only handles plain-token partition values"
        )
    return f"{partition_col}={s}"


def _apply_swaps(path: str, journal: dict, on_step=None) -> None:
    """The roll-forward-idempotent swap loop: every step checks state
    before acting, so re-running after a crash at ANY point completes
    the same commit exactly once. The live dir is only retired while
    its STAGED replacement still exists — once staged has moved in, a
    re-run must leave the committed data alone (a partition that was
    new in this merge has no trash copy to restore it from).
    ``on_step`` is a pre-rename hook (crash-injection tests)."""
    staging, trash = journal["staging"], journal["trash"]
    os.makedirs(path, exist_ok=True)  # table creation commits through here too
    os.makedirs(trash, exist_ok=True)
    step = on_step or (lambda: None)
    for d in journal["swap"]:
        live, staged, kept = os.path.join(path, d), os.path.join(staging, d), os.path.join(trash, d)
        if os.path.isdir(staged):
            if os.path.isdir(live) and not os.path.isdir(kept):
                step()
                os.rename(live, kept)
            step()
            os.rename(staged, live)
    for d in journal["delete"]:
        live, kept = os.path.join(path, d), os.path.join(trash, d)
        if os.path.isdir(live) and not os.path.isdir(kept):
            step()
            os.rename(live, kept)


def _publish_from_journal(path: str, journal: dict) -> None:
    """Publish the post-commit manifest recorded in the journal — runs
    after the swap loop on both the happy path and roll-forward
    recovery (idempotent: same version, same content). Journals
    written before manifests existed lack the key and skip."""
    man = journal.get("manifest")
    if man:
        _manifest.publish(path, man["partitions"], man["version"])


def _finish(path: str, journal: dict) -> None:
    # Durability barrier: every rename's dirent change must persist
    # BEFORE the journal unlink does — otherwise a power loss could
    # leave "journal gone, renames not", and the journal-less sweep
    # below would rmtree trash dirs holding the only copy of retired
    # partitions (the round-6 ADVICE data-loss route).
    for d in (path, journal["staging"], journal["trash"]):
        if os.path.isdir(d):
            _fsync_dir(d)
    os.remove(_journal_path(path))
    parent = os.path.dirname(_journal_path(path)) or "."
    _fsync_dir(parent)
    shutil.rmtree(journal["trash"], ignore_errors=True)
    shutil.rmtree(journal["staging"], ignore_errors=True)


def recover(path: str) -> bool:
    """Complete an interrupted merge (roll forward) and sweep orphan
    staging dirs. Returns True if a journaled commit was completed.
    Called automatically at the top of every merge_into (already under
    the store lock); this standalone entry point takes the same lock,
    so an operator running it cannot sweep the staging dir of a merge
    that is mid-flight in another process."""
    with _store_lock(path):
        return _recover_unlocked(path)


def _recover_unlocked(path: str) -> bool:
    jp = _journal_path(path)
    finished = False
    if os.path.exists(jp):
        with open(jp) as f:
            journal = json.load(f)
        _apply_swaps(path, journal)
        _publish_from_journal(path, journal)
        _finish(path, journal)
        finished = True
    # staging/trash dirs without a journal: a crash BEFORE commit —
    # the live table was never touched, the leftovers are garbage.
    parent, base = os.path.split(path.rstrip("/"))
    if os.path.isdir(parent or "."):
        for d in os.listdir(parent or "."):
            if d.startswith(base + ".merge-staging-") or d.startswith(base + ".merge-trash-"):
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    return finished


def _cluster_output(df: DataFrame, keys: list[str], partition_col: str,
                    files_per_partition: int) -> DataFrame:
    """Cluster a write so each output partition lands in AT MOST
    ``files_per_partition`` files. Without this, every touched
    partition fragments into up-to-shuffle-partitions files PER MERGE
    — at a daily merge cadence that is the small-file explosion
    compaction exists to undo. Clustering key = the partition value
    (one task owns whole partitions) plus, when >1 is asked for, a
    deterministic key-hash salt that fans a hot partition across up
    to that many tasks (an upper bound — AQE is free to coalesce
    below it when the partition is small, which is exactly the
    adaptive behavior we want)."""
    if files_per_partition <= 1:
        return df.repartition(F.col(partition_col))
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(files_per_partition))
    return df.repartition(F.col(partition_col), salt)


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    *,
    keys: list[str],
    partition_col: str,
    when_matched: str | None = "update",
    when_not_matched: str | None = "insert",
    prune_with_source_partitions: bool = True,
    files_per_partition: int = 1,
    _crash_after_swaps: int | None = None,
) -> MergeStats:
    """MERGE ``source`` into the parquet table at ``path``.

    * ``when_matched``: "update" (whole-row replace), "delete", or
      None (keep target row — with insert this is exactly
      idempotent_append's ON CONFLICT DO NOTHING).
    * ``when_not_matched``: "insert" or None.
    * Duplicate keys in ``source`` raise (Delta parity: a multi-match
      merge is ambiguous). Re-running the same merge is idempotent.
    * ``_crash_after_swaps``: test hook — abort mid-commit after N
      directory swaps to exercise the journal recovery.
    """
    if when_matched not in ("update", "delete", None):
        raise ValueError(f"when_matched={when_matched!r}")
    if when_not_matched not in ("insert", None):
        raise ValueError(f"when_not_matched={when_not_matched!r}")
    if not keys:
        raise ValueError("keys must be non-empty")
    if partition_col not in source.columns:
        raise ValueError(f"source lacks partition column {partition_col!r}")

    src = source.persist()
    try:
        n_src = src.count()
        if n_src == 0:
            return MergeStats(0, 0, 0, 0, noop=True)
        dup = src.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(f"source has duplicate merge keys, e.g. {dup[0]}")
        if src.filter(F.col(partition_col).isNull()).limit(1).collect():
            # Refused on EVERY branch (including table creation): Spark
            # writes NULL as __HIVE_DEFAULT_PARTITION__ while
            # isin([None]) matches nothing at merge time — rows landed
            # under a null partition would be unreachable by every
            # later merge, and a replayed create batch would flip from
            # success to error, breaking replay idempotence.
            raise ValueError(
                "NULL partition values are not mergeable; coalesce "
                f"{partition_col!r} to an explicit sentinel first"
            )
        bsrc = F.broadcast(src) if n_src <= _BROADCAST_ROWS else src
        with _store_lock(path):
            return _merge_locked(
                spark, path, src, bsrc, n_src,
                keys=keys, partition_col=partition_col,
                when_matched=when_matched, when_not_matched=when_not_matched,
                prune_with_source_partitions=prune_with_source_partitions,
                files_per_partition=files_per_partition,
                _crash_after_swaps=_crash_after_swaps,
            )
    finally:
        src.unpersist()


def _merge_locked(
    spark: SparkSession,
    path: str,
    src: DataFrame,
    bsrc: DataFrame,
    n_src: int,
    *,
    keys: list[str],
    partition_col: str,
    when_matched: str | None,
    when_not_matched: str | None,
    prune_with_source_partitions: bool,
    files_per_partition: int,
    _crash_after_swaps: int | None,
) -> MergeStats:
    """The critical section: recovery of any interrupted commit, the
    snapshot reads, the staging write, and the journaled swap all
    happen under ONE hold of the advisory lock — a concurrent writer
    can neither read a half-committed table nor double-apply a
    journal."""
    _recover_unlocked(path)

    table_exists = os.path.isdir(path) and bool(_partition_dirs(path, partition_col))
    if not table_exists:
        foreign = os.path.isdir(path) and any(
            n.endswith(".parquet")
            or ("=" in n and os.path.isdir(os.path.join(path, n)))
            for n in os.listdir(path)
        )
        if foreign:
            # parquet files (unpartitioned table) or some OTHER col=
            # partition dirs: the target is a DIFFERENT table. Falling
            # through to the create branch would silently OVERWRITE it
            # — refuse instead.
            raise ValueError(
                f"{path} holds parquet data not partitioned by "
                f"{partition_col!r}; merge_into refuses to overwrite it"
            )
        if when_not_matched != "insert":
            return MergeStats(0, 0, 0, 0, noop=True)
        # Table creation commits through the SAME staging + journal +
        # swap path as updates: a crash mid-write must leave either no
        # table or the whole first batch — never a half-written live
        # table the next merge would treat as fully existing.
        first = _cluster_output(src, keys, partition_col, files_per_partition)
        staged, deleted = _stage_and_commit(
            spark, path, first, partition_col,
            touched=set(), existing_dirs=set(),
            _crash_after_swaps=_crash_after_swaps,
        )
        return MergeStats(n_src, 0, 0, staged)

    src_values = [r[0] for r in src.select(partition_col).distinct().collect()]
    touched = {_dirname_for(partition_col, v): v for v in src_values}
    target_all = spark.read.parquet(path)
    if set(src.columns) != set(target_all.columns):
        extra = set(src.columns) - set(target_all.columns)
        missing = set(target_all.columns) - set(src.columns)
        raise ValueError(
            "merge source schema must match target columns "
            f"(whole-row update semantics); extra={sorted(extra)} "
            f"missing={sorted(missing)} — evolve the table first "
            "(plans/evolution.py) if the widening is intended"
        )
    _check_types(src, target_all, partition_col)
    if not prune_with_source_partitions:
        # keys may have moved partitions: also rewrite partitions
        # holding CURRENT matches (key-only scan, broadcast probe).
        moved = (
            target_all.select(partition_col, *keys)
            .join(bsrc.select(*keys), on=keys, how="left_semi")
            .select(partition_col).distinct().collect()
        )
        for r in moved:
            touched[_dirname_for(partition_col, r[0])] = r[0]
    existing_dirs = set(_partition_dirs(path, partition_col))
    touched = {d: v for d, v in touched.items()
               if d in existing_dirs or when_not_matched == "insert"}

    tgt = target_all.filter(
        F.col(partition_col).isin([v for v in touched.values()])
    )
    matched_src = src.join(tgt.select(*keys), on=keys, how="left_semi")
    n_matched = matched_src.count()
    n_ins = (n_src - n_matched) if when_not_matched == "insert" else 0
    n_upd = n_matched if when_matched == "update" else 0
    n_del = n_matched if when_matched == "delete" else 0
    if n_ins == 0 and n_upd == 0 and n_del == 0:
        return MergeStats(0, 0, 0, 0, noop=True)

    if when_matched == "update" and when_not_matched == "insert":
        result = tgt.join(bsrc.select(*keys), on=keys, how="left_anti").unionByName(src)
    else:
        keep = (
            tgt.join(bsrc.select(*keys), on=keys, how="left_anti")
            if when_matched in ("update", "delete") else tgt
        )
        parts = [keep]
        if when_matched == "update":
            parts.append(matched_src)
        if when_not_matched == "insert":
            parts.append(src.join(tgt.select(*keys), on=keys, how="left_anti"))
        result = parts[0]
        for p in parts[1:]:
            result = result.unionByName(p)

    result = _cluster_output(result, keys, partition_col, files_per_partition)
    staged, deleted = _stage_and_commit(
        spark, path, result, partition_col,
        touched=set(touched), existing_dirs=existing_dirs,
        _crash_after_swaps=_crash_after_swaps,
    )
    return MergeStats(n_ins, n_upd, n_del, staged + deleted)


def _check_types(src: DataFrame, target: DataFrame, partition_col: str) -> None:
    """Type gate beyond the name-set check: a silently mismatched
    column either fails later inside unionByName with an opaque error
    or union-coerces into a surprise type. Non-partition columns must
    match exactly. The partition column is exempt when EITHER side is
    string — Spark's partition inference reads string-valued dirs back
    as date/int/string depending on content (booleans come back as the
    on-disk strings 'true'/'false'), and the string<->inferred pairs
    coerce consistently with ``_dirname_for``'s rendition; anything
    else (e.g. date vs int) is a real mismatch."""
    src_t, tgt_t = dict(src.dtypes), dict(target.dtypes)
    bad = {
        c: (src_t[c], tgt_t[c])
        for c in src_t
        if c != partition_col and c in tgt_t and src_t[c] != tgt_t[c]
    }
    if bad:
        raise ValueError(
            f"merge source column types differ from target: {bad} — "
            "cast the source (or evolve the table, plans/evolution.py) first"
        )
    ps, pt = src_t[partition_col], tgt_t.get(partition_col)
    if pt is not None and ps != pt and "string" not in (ps, pt):
        raise ValueError(
            f"partition column {partition_col!r} type mismatch: "
            f"source {ps} vs target {pt} — partition pruning would "
            "compare differently-typed values; cast the source first"
        )


def _current_partition_nonces(path: str) -> tuple[int, dict[str, str]]:
    """(current manifest version, {leaf dir: content nonce}) from
    DISK, stamping any unmarked legacy dir — the before-image the
    post-commit manifest is derived from. Caller holds the lock."""
    cur = _manifest.load_manifest(path)
    version = cur["version"] if cur else 0
    parts: dict[str, str] = {}
    for d in _manifest.leaf_dirs(path):
        abs_ = os.path.join(path, d)
        nonce = _manifest.dir_nonce(abs_)
        if nonce is None:
            nonce = _manifest.new_nonce()
            _manifest.mark_dir(abs_, nonce)
        parts[d] = nonce
    return version, parts


def _stage_and_commit(
    spark: SparkSession,
    path: str,
    result: DataFrame,
    partition_col: str,
    *,
    touched: set[str],
    existing_dirs: set[str],
    _crash_after_swaps: int | None,
) -> tuple[int, int]:
    """Write ``result`` to a sibling staging dir, stamp content
    nonces, journal the swap + the post-commit manifest, apply the
    swaps, publish the manifest, clean up. Shared by the update path
    and table creation. Returns (partitions swapped, partitions
    deleted). Caller holds the store lock."""
    nonce = uuid.uuid4().hex[:12]
    staging = path.rstrip("/") + f".merge-staging-{nonce}"
    trash = path.rstrip("/") + f".merge-trash-{nonce}"
    result.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    staged_dirs = set(_partition_dirs(staging, partition_col))
    staged_nonces = {}
    for d in staged_dirs:
        n = _manifest.new_nonce()
        _manifest.mark_dir(os.path.join(staging, d), n)
        staged_nonces[d] = n
    # a touched partition absent from staging was emptied
    # (delete mode) — its live dir must be retired too.
    deletes = sorted(d for d in touched if d in existing_dirs and d not in staged_dirs)
    version, parts = _current_partition_nonces(path)
    post = {
        d: n for d, n in parts.items() if d not in staged_dirs and d not in set(deletes)
    }
    post.update(staged_nonces)
    journal = {
        "staging": staging,
        "trash": trash,
        "swap": sorted(staged_dirs),
        "delete": deletes,
        "manifest": {"version": version + 1, "partitions": post},
    }
    jp = _journal_path(path)
    with open(jp, "w") as f:
        json.dump(journal, f)
        f.flush()
        os.fsync(f.fileno())
    # The journal's dirent must be durable BEFORE the first rename:
    # otherwise a power loss can persist renames while losing the
    # journal, and the journal-less sweep would delete the trash dirs
    # holding the only copy of retired partitions.
    _fsync_dir(os.path.dirname(jp) or ".")
    if _crash_after_swaps is not None:
        _apply_swaps_with_crash(path, journal, _crash_after_swaps)
    _apply_swaps(path, journal)
    _publish_from_journal(path, journal)
    _finish(path, journal)
    # same-session readers may hold cached file listings for the
    # swapped directories; invalidate so their next plan re-lists.
    spark.catalog.refreshByPath(path)
    return len(staged_dirs), len(deletes)


class _InjectedCrash(RuntimeError):
    pass


def _apply_swaps_with_crash(path: str, journal: dict, after: int) -> None:
    """Test hook: run the REAL swap loop, dying before the (after+1)-th
    rename — the journal stays on disk for recover(). Shares
    _apply_swaps so the crash tests always exercise the production
    rename sequence."""
    done = 0

    def step():
        nonlocal done
        done += 1
        if done > after:
            raise _InjectedCrash(f"injected crash after {after} renames")

    _apply_swaps(path, journal, on_step=step)
    raise _InjectedCrash("injected crash after all renames, before finish")
