"""Long-lived-session soak: a production pipeline owner keeps ONE
SparkSession alive for days and runs the registry repeatedly
(per-corpus-version laps, memo eviction at rollover). The per-call
eviction contract is pytest-pinned (tests/test_memos.py); this driver
pins the SESSION-LIFETIME contract: after N full laps with eviction
between laps, nothing grows —

- block-manager state: ``getPersistentRDDs`` count returns to the
  post-eviction baseline after every lap (localCheckpoint profile);
- checkpoint storage: the reliable-checkpoint dir's byte size returns
  to baseline after every lap (cluster profile,
  SPARK_GRAFT_CHECKPOINT_DIR set);
- tracker state: the registry's _MEMO_RDD_IDS / _MEMO_CKPT_FILES sets
  are empty after eviction (no id leak across laps).

Usage:
    python tools/soak.py [--laps 3] [--sf /root/testdata/sf0.01]
                         [--profile local|reliable|both]

Prints one JSON line per lap and a final PASS/FAIL verdict; exit 1 on
any growth. Results belong in BASELINE.md's robustness section.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


_MERGE_DIR: str | None = None


def _merge_lap(spark, sf_dir: str, lap: int) -> None:
    """Session-lifetime exercise of the copy-on-write merge: one
    upsert per lap into one long-lived table. Leaked state would show
    up as persistent-RDD growth (merge persists its source) or as
    orphan .merge-staging/.merge-trash siblings (asserted empty by
    the growth checks via the post-evict RDD count, and here
    directly)."""
    import pyspark.sql.functions as F

    from grader_etl_spark.io import load
    from grader_etl_spark.plans.merge import merge_into

    global _MERGE_DIR
    if _MERGE_DIR is None:
        _MERGE_DIR = tempfile.mkdtemp(prefix="soak_merge_")
    table = os.path.join(_MERGE_DIR, "t")
    src = (
        load(spark, sf_dir, "orders")
        .limit(500)
        .select(
            "o_orderkey",
            F.lit(f"lap{lap}").alias("v"),
            (F.col("o_orderkey") % 7).cast("string").alias("pt"),
        )
    )
    merge_into(spark, table, src, keys=["o_orderkey"], partition_col="pt")
    parent = os.path.dirname(table)
    orphans = [d for d in os.listdir(parent) if ".merge-" in d]
    assert not orphans, f"merge left orphan commit state: {orphans}"


def soak(spark, sf_dir: str, laps: int, ckpt_dir: str | None) -> list[dict]:
    from grader_etl_spark import registry
    from grader_etl_spark.registry import REGISTRY, clear_session_memos

    names = sorted(REGISTRY)
    records = []
    for lap in range(1, laps + 1):
        t0 = time.perf_counter()
        for name in names:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _merge_lap(spark, sf_dir, lap)
        wall = round(time.perf_counter() - t0, 1)
        peak_rdds = _n_persistent(spark)
        peak_ckpt = _dir_bytes(ckpt_dir) if ckpt_dir else 0
        # corpus-version rollover: evict every session memo
        clear_session_memos(spark)
        spark.catalog.clearCache()
        rec = {
            "lap": lap,
            "wall_sec": wall,
            "peak_persistent_rdds": peak_rdds,
            "post_evict_persistent_rdds": _n_persistent(spark),
            "peak_ckpt_bytes": peak_ckpt,
            "post_evict_ckpt_bytes": _dir_bytes(ckpt_dir) if ckpt_dir else 0,
            "tracker_rdd_ids": len(registry._MEMO_RDD_IDS),
            "tracker_ckpt_files": len(registry._MEMO_CKPT_FILES),
            "tracker_session_ckpts": len(registry._SESSION_CKPT_FILES),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    return records


def check(records: list[dict], ckpt_dir: str | None) -> list[str]:
    problems = []
    base = records[0]
    for r in records[1:]:
        # post-eviction block-manager state must not grow lap-over-lap
        if r["post_evict_persistent_rdds"] > base["post_evict_persistent_rdds"]:
            problems.append(
                f"lap {r['lap']}: post-evict persistent RDDs grew "
                f"{base['post_evict_persistent_rdds']} -> {r['post_evict_persistent_rdds']}"
            )
        if ckpt_dir and r["post_evict_ckpt_bytes"] > base["post_evict_ckpt_bytes"]:
            problems.append(
                f"lap {r['lap']}: post-evict checkpoint bytes grew "
                f"{base['post_evict_ckpt_bytes']} -> {r['post_evict_ckpt_bytes']}"
            )
    for r in records:
        if r["tracker_rdd_ids"] or r["tracker_ckpt_files"] or r.get("tracker_session_ckpts"):
            problems.append(f"lap {r['lap']}: memo tracker sets not empty after eviction")
    return problems


# ---------------------------------------------------------------------------
# reader/writer soak (--mode readers): a SEPARATE reader process takes
# repeated consistent counts (manifest.locked_parquet_files + DuckDB —
# no SparkSession) while this process merges lap after lap. Invariants
# the reader checks on EVERY read:
#   - both partitions carry the same max lap stamp (one merge updates
#     both in one commit — a torn p0-new/p1-old read breaks this);
#   - row count == 11 + max_lap (lap 0 creates the 10 fixed keys + 1;
#     each later lap upserts the same 10 and inserts exactly one new).
# Any mixed or uncommitted state fails loudly. Before the round-7
# manifest commit this soak FAILS mid-swap by design; it now pins the
# closed window.
# ---------------------------------------------------------------------------


def _check_committed_state(rows: list[tuple], check: str) -> tuple[bool, dict]:
    """Invariants every COMMITTED table state must satisfy.

    ``legacy`` (one writer): both partitions carry the same max lap
    stamp and count == 11 + max_lap.

    ``writers`` (main locked writer + a second OPTIMISTIC writer
    process): the main writer's invariant holds restricted to its key
    space (k < 1000), and the second writer's commits are atomic —
    its lap counter row (k=1000, day=p2) agrees with its per-lap
    inserts (1001+lap into p2 every lap; 2000+lap into the CONTENDED
    p0 on odd laps). A torn or lost optimistic commit breaks one of
    these counts."""
    if check == "legacy":
        day_max: dict[str, int] = {}
        for _k, lap, day in rows:
            day_max[day] = max(day_max.get(day, -1), lap)
        laps = set(day_max.values())
        ok = len(laps) == 1 and len(rows) == 11 + max(laps)
        return ok, {"count": len(rows), "laps": sorted(laps)}
    main = [(k, lap, day) for k, lap, day in rows if k < 1000]
    day_max = {}
    for _k, lap, day in main:
        day_max[day] = max(day_max.get(day, -1), lap)
    main_laps = {m for d, m in day_max.items() if d in ("p0", "p1")}
    ok = len(main_laps) == 1 and len(main) == 11 + max(main_laps)
    w2 = [(k, lap, day) for k, lap, day in rows if k >= 1000]
    info = {"count": len(rows), "main_laps": sorted(main_laps)}
    if w2:
        counter = [lap for k, lap, d in w2 if k == 1000 and d == "p2"]
        p2_ins = [(k, d) for k, lap, d in w2 if 1000 < k < 2000]
        p0_ins = [(k, lap, d) for k, lap, d in w2 if k >= 2000]
        ok = ok and len(counter) == 1
        if counter:
            l2 = counter[0]
            ok = ok and len(p2_ins) == l2 + 1
            ok = ok and all(d == "p2" for _k, d in p2_ins)
            ok = ok and len(p0_ins) == (l2 + 1) // 2
            ok = ok and all(d == "p0" for _k, _l, d in p0_ins)
            info["w2_lap"] = l2
    return ok, info


def _reader_child(table: str, stop_file: str, check: str = "legacy") -> int:
    import duckdb

    from grader_etl_spark.plans.manifest import locked_parquet_files

    n_reads = 0
    while not os.path.exists(stop_file):
        try:
            with locked_parquet_files(table) as files:
                rows = duckdb.sql(
                    "SELECT k, lap, day FROM read_parquet(?, hive_partitioning=1)",
                    params=[files],
                ).fetchall()
        except FileNotFoundError:
            continue  # table not created yet
        ok, info = _check_committed_state(rows, check)
        print(json.dumps({**info, "ok": ok}), flush=True)
        if not ok:
            return 1
        n_reads += 1
        time.sleep(0.02)
    print(json.dumps({"reads": n_reads}), flush=True)
    return 0 if n_reads > 0 else 1


def _writer2_child(table: str, laps: int) -> int:
    """The second writer: OPTIMISTIC merges from a separate process.
    Even laps touch only its private partition p2 (disjoint — should
    commit concurrently with the main writer); odd laps also insert
    into the main writer's contended p0 (overlap — the conflict check
    makes somebody retry). Prints total commit retries observed."""
    from grader_etl_spark.plans.merge import merge_into
    from grader_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="grader-etl-spark-soak-writer2")
    spark.sparkContext.setLogLevel("ERROR")
    retries = 0
    for lap in range(laps):
        rows = [(1000, lap, "p2"), (1001 + lap, lap, "p2")]
        if lap % 2 == 1:
            rows.append((2000 + lap, lap, "p0"))
        src = spark.createDataFrame(rows, "k int, lap int, day string")
        st = merge_into(spark, table, src, keys=["k"], partition_col="day",
                        optimistic=True, max_commit_retries=50)
        retries += st.commit_retries
    print(json.dumps({"writer2_laps": laps, "writer2_retries": retries}), flush=True)
    return 0


def reader_writer_soak(laps: int, writers: bool = False) -> int:
    import subprocess

    from grader_etl_spark.plans.merge import merge_into
    from grader_etl_spark.session import get_spark

    spark = get_spark(app_name="grader-etl-spark-rw-soak")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="soak_rw_")
    table = os.path.join(root, "t")
    stop_file = os.path.join(root, "STOP")

    def lap_src(lap: int):
        rows = [(i, lap, "p0") for i in range(5)] + [(i, lap, "p1") for i in range(5, 10)]
        rows.append((100 + lap, lap, "p0" if lap % 2 else "p1"))
        return spark.createDataFrame(rows, "k int, lap int, day string")

    merge_into(spark, table, lap_src(0), keys=["k"], partition_col="day")
    check = "writers" if writers else "legacy"
    reader = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--mode", "reader-child",
         "--table", table, "--stop-file", stop_file, "--check", check],
        stdout=subprocess.PIPE, text=True, cwd=_REPO,
    )
    writer2 = None
    if writers:
        # second writer: a separate process running OPTIMISTIC merges —
        # disjoint (its own p2) on even laps, contending for p0 on odd
        # laps — while this process keeps its locked laps going.
        writer2 = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--mode", "writer2-child",
             "--table", table, "--laps", str(laps)],
            stdout=subprocess.PIPE, text=True, cwd=_REPO,
        )
    w2_out = None
    try:
        for lap in range(1, laps + 1):
            # fan merges across up to 3 files per partition so the
            # periodic in-place compaction below has real work; the
            # reader's row-set invariant is blind to file layout, so a
            # consistent read must hold across BOTH mutation kinds
            merge_into(spark, table, lap_src(lap), keys=["k"], partition_col="day",
                       files_per_partition=3)
            if lap % 5 == 0:
                from grader_etl_spark.plans.compaction import compact_partitions

                compact_partitions(spark, table)
        if writer2 is not None:
            w2_out, _ = writer2.communicate(timeout=600)
    finally:
        if writer2 is not None and writer2.returncode is None:
            writer2.kill()
        open(stop_file, "w").close()
    out, _ = reader.communicate(timeout=120)
    lines = [json.loads(ln) for ln in out.splitlines() if ln.strip()]
    reads = [ln for ln in lines if "count" in ln]
    bad = [ln for ln in reads if not ln["ok"]]
    verdict = {
        "mode": check if writers else "readers",
        "writer_laps": laps,
        "reader_reads": len(reads),
        "inconsistent_reads": len(bad),
        "reader_exit": reader.returncode,
    }
    ok = reader.returncode == 0 and not bad and len(reads) > 0
    if writers:
        w2 = json.loads(w2_out.strip().splitlines()[-1]) if w2_out else {}
        verdict.update(w2)
        verdict["writer2_exit"] = writer2.returncode
        ok = ok and writer2.returncode == 0
        # end-state: every row from BOTH writers present, committed,
        # verified, no staging residue
        from grader_etl_spark.plans import manifest as M

        spark.catalog.refreshByPath(table)
        final = {(r.k, r.lap, r.day) for r in spark.read.parquet(table).collect()}
        missing = []
        for lap in range(laps):
            if (1001 + lap, lap, "p2") not in final:
                missing.append(1001 + lap)
            if lap % 2 == 1 and (2000 + lap, lap, "p0") not in final:
                missing.append(2000 + lap)
        verdict["lost_writer2_rows"] = missing
        verdict["manifest_mismatches"] = M.mismatches(table)
        orphans = [
            d for d in os.listdir(root)
            if ".merge-staging-" in d or ".merge-trash-" in d
        ]
        verdict["orphan_dirs"] = orphans
        ok = ok and not missing and not verdict["manifest_mismatches"] and not orphans
    print(json.dumps(verdict), flush=True)
    print(f"RW-SOAK {'PASS' if ok else 'FAIL'}", flush=True)
    for ln in bad:
        print("  inconsistent read: " + json.dumps(ln), flush=True)
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--profile", choices=("local", "reliable", "both"), default="both")
    ap.add_argument("--mode",
                    choices=("session", "readers", "writers", "reader-child",
                             "writer2-child"),
                    default="session")
    ap.add_argument("--table", help="(reader-child/writer2-child) table path")
    ap.add_argument("--stop-file", help="(reader-child) exit when this file appears")
    ap.add_argument("--check", choices=("legacy", "writers"), default="legacy",
                    help="(reader-child) which committed-state invariant to check")
    args = ap.parse_args()

    if args.mode == "reader-child":
        return _reader_child(args.table, args.stop_file, check=args.check)
    if args.mode == "writer2-child":
        return _writer2_child(args.table, args.laps)
    if args.mode == "readers":
        return reader_writer_soak(laps=max(args.laps, 15))
    if args.mode == "writers":
        return reader_writer_soak(laps=max(args.laps, 15), writers=True)

    profiles = ["local", "reliable"] if args.profile == "both" else [args.profile]
    failures: list[str] = []
    for profile in profiles:
        # The checkpoint profile is read per memo_checkpoint call, and
        # setCheckpointDir binds once per SparkContext — a fresh context
        # per profile keeps the two runs honest. get_spark() reuses the
        # active session, so stop it between profiles.
        ckpt_dir = None
        if profile == "reliable":
            ckpt_dir = tempfile.mkdtemp(prefix="soak_ckpt_")
            os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = ckpt_dir
        else:
            os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)

        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        from grader_etl_spark.registry import clear_session_memos, load_all_operators
        from grader_etl_spark.session import get_spark

        clear_session_memos()  # forget any ids recorded under the dead context
        spark = get_spark(app_name=f"grader-etl-spark-soak-{profile}")
        spark.sparkContext.setLogLevel("ERROR")
        load_all_operators()
        print(f"=== soak profile={profile} laps={args.laps} sf={args.sf} ===", flush=True)
        records = soak(spark, args.sf, args.laps, ckpt_dir)
        problems = check(records, ckpt_dir)
        failures.extend(f"[{profile}] {p}" for p in problems)
        print(
            json.dumps({"profile": profile, "ok": not problems, "problems": problems}),
            flush=True,
        )
    print(f"SOAK {'PASS' if not failures else 'FAIL'}: {len(failures)} problems", flush=True)
    for p in failures:
        print("  " + p, flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
