"""Atomic versioned manifest — snapshot-consistent reads on plain parquet.

``plans/merge.py``'s copy-on-write commit swaps partition directories
one rename at a time; a reader that LISTS the table mid-swap can see
partition A new and partition B old (the gap merge.py documented in
round 6). Delta/Iceberg close that window with a transaction log; this
module is the single-filesystem rendition of exactly that piece:

- every committed table version is described by ``_manifest.json``
  INSIDE the table directory (underscore-prefixed: invisible to
  Spark's file index and to the oracle's ``*/*.parquet`` globs),
  naming every partition leaf directory plus a 12-hex CONTENT NONCE;
- each leaf directory carries its nonce as an empty marker file
  ``_content-<nonce>`` (same underscore rule), rewritten whenever the
  directory's content changes;
- the manifest is published with ONE atomic rename (tmp + fsync +
  rename + parent-dir fsync) as the LAST step of every commit, so the
  manifest on disk always describes a fully-committed version.

Reader protocol (``read_table`` / ``snapshot``): load the manifest,
require (a) no pending merge journal, (b) the set of leaf directories
on disk to EQUAL the manifest's set, and (c) every directory's marker
to match its manifest nonce. Any violation means a commit is in
flight or died mid-swap — complete it (``merge.recover``, which takes
the store lock and therefore also waits out a LIVE writer) and
re-verify. A verified read therefore plans against a committed
version: old or new, never mixed.

``read_table`` gives plan-time consistency (the listing Spark plans
from is a committed version; a writer that commits DURING the job can
still rename files out from under in-flight tasks — the residual any
in-place layout shares). ``snapshot`` holds the store lock across the
caller's action for full read-your-committed-state isolation — the
mode the cross-process soak reader uses. On a real cluster the lock
hold is the deliberate trade vs a transaction log with immutable
data files (Delta/Iceberg, not installable here): swap this module,
keep the callers.

Verification is pure-filesystem (no SparkSession needed) so a sidecar
process — a monitor, the soak reader — can take consistent counts
with DuckDB alone: ``verified_parquet_files``.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

MANIFEST_NAME = "_manifest.json"
_MARKER_PREFIX = "_content-"
_PART_DIR = re.compile(r"^[^=/]+=[^/]*$")


class TableInconsistentError(RuntimeError):
    """``_verify_under_lock`` exhausted roll-forward, adoption, and
    journal-less healing UNDER THE LOCK and the table still does not
    verify — a terminal diagnostic, not a transient race. Distinct
    from the lock-acquisition ``TimeoutError`` so ``ensure_consistent``
    surfaces it immediately instead of spinning its retry loop for the
    full timeout and masking the real failure (ADVICE r7)."""


def new_nonce() -> str:
    return uuid.uuid4().hex[:12]


def _fsync_dir(dirpath: str) -> None:
    fd = os.open(dirpath, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST_NAME)


def leaf_dirs(path: str) -> list[str]:
    """Relative paths of every partition LEAF directory under ``path``
    (hive layout, any nesting depth: ``day=d1`` or ``day=d1/src=a``).
    A ``col=value`` directory with no ``col=value`` children is a leaf
    — including torn intermediates like ``day=d.__old__`` left by an
    in-flight rewrite, which is exactly what verification must see."""
    out: list[str] = []

    def walk(rel: str) -> None:
        abs_ = os.path.join(path, rel) if rel else path
        try:
            names = os.listdir(abs_)
        except FileNotFoundError:
            return
        subs = [
            n for n in names
            if _PART_DIR.match(n) and os.path.isdir(os.path.join(abs_, n))
        ]
        if rel and not subs:
            out.append(rel)
            return
        for n in subs:
            walk(os.path.join(rel, n))

    walk("")
    return sorted(out)


def dir_nonce(leaf_abs: str) -> str | None:
    try:
        names = os.listdir(leaf_abs)
    except FileNotFoundError:
        return None
    for n in sorted(names):
        if n.startswith(_MARKER_PREFIX):
            return n[len(_MARKER_PREFIX):]
    return None


def mark_dir(leaf_abs: str, nonce: str, durable: bool = True) -> None:
    """Stamp ``leaf_abs`` with content nonce ``nonce`` (drop any stale
    marker first). ``durable`` fsyncs the directory so the marker
    survives power loss before the journal that references it."""
    for n in os.listdir(leaf_abs):
        if n.startswith(_MARKER_PREFIX):
            os.remove(os.path.join(leaf_abs, n))
    open(os.path.join(leaf_abs, _MARKER_PREFIX + nonce), "w").close()
    if durable:
        _fsync_dir(leaf_abs)


def load_manifest(path: str) -> dict | None:
    try:
        with open(manifest_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def publish(path: str, partitions: dict[str, str], version: int) -> None:
    """Atomically publish ``{version, partitions}`` as the table's
    current manifest: tmp file + fsync + rename + parent-dir fsync —
    readers see the old manifest or the new one, never a torn write."""
    os.makedirs(path, exist_ok=True)
    final = manifest_path(path)
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"version": version, "partitions": partitions}, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)
    _fsync_dir(path)


def next_version(path: str) -> int:
    man = load_manifest(path)
    return (man["version"] + 1) if man else 1


def mismatches(path: str) -> list[str]:
    """Why the on-disk state does NOT match the published manifest —
    empty list == verified committed version. Pure filesystem."""
    out: list[str] = []
    from grader_etl_spark.plans.merge import _journal_path  # cycle-free: names only

    if os.path.exists(_journal_path(path)):
        out.append("pending merge journal")
    man = load_manifest(path)
    if man is None:
        out.append("no manifest published")
        return out
    disk = set(leaf_dirs(path))
    listed = set(man["partitions"])
    for d in sorted(listed - disk):
        out.append(f"missing partition dir {d}")
    for d in sorted(disk - listed):
        out.append(f"unlisted partition dir {d}")
    for d in sorted(listed & disk):
        got = dir_nonce(os.path.join(path, d))
        if got != man["partitions"][d]:
            out.append(f"nonce mismatch in {d}: manifest {man['partitions'][d]} disk {got}")
    return out


def _adopt_unlocked(path: str) -> None:
    """Bring a legacy table (written before manifests existed) under
    manifest management: stamp every unmarked leaf, publish version 1.
    Caller holds the store lock."""
    parts: dict[str, str] = {}
    for d in leaf_dirs(path):
        abs_ = os.path.join(path, d)
        nonce = dir_nonce(abs_)
        if nonce is None:
            nonce = new_nonce()
            mark_dir(abs_, nonce)
        parts[d] = nonce
    publish(path, parts, next_version(path))


def dir_mtimes(path: str) -> dict[str, int]:
    """Leaf-dir mtimes (ns) — the before-image for
    ``republish_changed``. A POSIX directory's mtime advances when an
    entry is added/removed, which is exactly 'this partition's file
    set changed'."""
    out = {}
    for d in leaf_dirs(path):
        out[d] = os.stat(os.path.join(path, d)).st_mtime_ns
    return out


def republish_changed(path: str, before: dict[str, int]) -> None:
    """Re-stamp every leaf dir that is new or whose file set changed
    since ``before`` (add-only appends, partition drops, in-place
    rewrites), then publish the next manifest version. Caller holds
    the store lock. Cost: one stat per partition + one marker write
    per TOUCHED partition — metadata-only, independent of data bytes."""
    man = load_manifest(path)
    parts = dict(man["partitions"]) if man else {}
    for d in list(parts):
        if not os.path.isdir(os.path.join(path, d)):
            del parts[d]
    for d in leaf_dirs(path):
        abs_ = os.path.join(path, d)
        changed = (
            d not in before
            or os.stat(abs_).st_mtime_ns != before[d]
            or d not in parts
            or dir_nonce(abs_) != parts.get(d)
        )
        if changed:
            nonce = new_nonce()
            mark_dir(abs_, nonce)
            parts[d] = nonce
        else:
            parts[d] = dir_nonce(abs_) or parts[d]
    publish(path, parts, next_version(path))


def ensure_consistent(path: str, timeout: float = 120.0) -> None:
    """Block until ``path`` verifies as a committed version: roll any
    crashed commit forward, adopt a legacy table, heal journal-less
    drift, and wait out a live writer (the lock acquisition waits).
    Raises TimeoutError with the outstanding mismatches if the table
    never settles."""
    from grader_etl_spark.plans.pipeline import _store_lock

    deadline = time.monotonic() + timeout
    while True:
        if not mismatches(path):
            return
        # Taking the lock waits out a live writer's in-flight commit;
        # under it, _verify_under_lock rolls forward / adopts / heals.
        try:
            with _store_lock(path, timeout=max(1.0, deadline - time.monotonic())):
                _verify_under_lock(path)
            return
        except TableInconsistentError:
            raise  # terminal: healing under the lock failed — surface it now
        except (TimeoutError, RuntimeError):
            pass  # lock held by a live writer; re-check below
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"table at {path} did not settle to a committed version: "
                + "; ".join(mismatches(path))
            )
        time.sleep(0.05)


def _journal_path_of(path: str) -> str:
    from grader_etl_spark.plans.merge import _journal_path

    return _journal_path(path)


def read_table(spark, path: str, timeout: float = 120.0):
    """Plan a read against a VERIFIED committed version of the table
    (old or new, never a torn mid-swap listing). Same-session cached
    listings are invalidated first so the plan re-lists."""
    ensure_consistent(path, timeout=timeout)
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def _verify_under_lock(path: str) -> None:
    """Caller holds the store lock: roll a crashed commit forward,
    adopt a legacy table, HEAL a journal-less drift, then require a
    verified committed version. No live writer can interleave, so one
    pass settles or raises.

    The heal step: every engine rewrite (merge, retention, erasure,
    compaction) commits through the journal, so a mismatch WITHOUT a
    journal can only be a crashed add-only append (files landed, the
    manifest republish didn't run) or an out-of-band writer — in both
    cases the on-disk state IS the table, and re-stamping + publishing
    from disk restores verifiability instead of blocking every reader
    until the next unrelated commit."""
    bad = mismatches(path)
    if bad and os.path.exists(_journal_path_of(path)):
        from grader_etl_spark.plans.merge import _recover_unlocked

        _recover_unlocked(path)
        bad = mismatches(path)
    if bad and load_manifest(path) is None:
        _adopt_unlocked(path)
        bad = mismatches(path)
    if bad and not os.path.exists(_journal_path_of(path)):
        republish_changed(path, {})
        bad = mismatches(path)
    if bad:
        raise TableInconsistentError(
            f"table at {path} inconsistent under lock: " + "; ".join(bad)
        )


class snapshot:
    """``with snapshot(spark, path) as df:`` — hold the store lock
    across the caller's action so no writer can swap partitions out
    from under the running job. The strict reader mode; writers queue
    behind it (documented single-FS trade vs a transaction log over
    immutable files). The store lock is NOT reentrant: do not call
    merge/retention/compaction on the same table inside the block —
    they would queue behind this snapshot until its lock timeout."""

    def __init__(self, spark, path: str, timeout: float = 120.0):
        self.spark, self.path, self.timeout = spark, path, timeout

    def __enter__(self):
        from grader_etl_spark.plans.pipeline import _store_lock

        self._lock = _store_lock(self.path, timeout=self.timeout)
        self._lock.__enter__()
        try:
            _verify_under_lock(self.path)
            self.spark.catalog.refreshByPath(self.path)
            return self.spark.read.parquet(self.path)
        except BaseException:
            self._lock.__exit__(None, None, None)
            raise

    def __exit__(self, *exc):
        return self._lock.__exit__(*exc)


class locked_parquet_files:
    """``with locked_parquet_files(path) as files:`` — hold the store
    lock, verify the committed version, yield its parquet file list.
    Pure filesystem (no SparkSession): a sidecar process — a monitor,
    the soak reader — takes consistent counts with DuckDB alone, as
    long as its read finishes inside the ``with`` block."""

    def __init__(self, path: str, timeout: float = 120.0):
        self.path, self.timeout = path, timeout

    def __enter__(self) -> list[str]:
        from grader_etl_spark.plans.pipeline import _store_lock

        self._lock = _store_lock(self.path, timeout=self.timeout)
        self._lock.__enter__()
        try:
            _verify_under_lock(self.path)
            files: list[str] = []
            for d in leaf_dirs(self.path):
                abs_ = os.path.join(self.path, d)
                for n in sorted(os.listdir(abs_)):
                    if n.endswith(".parquet"):
                        files.append(os.path.join(abs_, n))
            return files
        except BaseException:
            self._lock.__exit__(None, None, None)
            raise

    def __exit__(self, *exc):
        return self._lock.__exit__(*exc)
