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


def _reader_child(table: str, stop_file: str) -> int:
    import duckdb

    from grader_etl_spark.plans.manifest import locked_parquet_files

    n_reads = 0
    while not os.path.exists(stop_file):
        try:
            with locked_parquet_files(table) as files:
                day_max = duckdb.sql(
                    "SELECT day, max(lap) AS m FROM read_parquet(?, hive_partitioning=1) GROUP BY day",
                    params=[files],
                ).fetchall()
                count = duckdb.sql(
                    "SELECT count(*) FROM read_parquet(?)", params=[files]
                ).fetchone()[0]
        except FileNotFoundError:
            continue  # table not created yet
        laps = {m for _, m in day_max}
        # lap 0 creates 11 rows (10 fixed keys + 1 new); each later lap
        # upserts the 10 and inserts exactly one more
        ok = len(laps) == 1 and count == 11 + max(laps)
        print(json.dumps({"count": count, "laps": sorted(laps), "ok": ok}), flush=True)
        if not ok:
            return 1
        n_reads += 1
        time.sleep(0.02)
    print(json.dumps({"reads": n_reads}), flush=True)
    return 0 if n_reads > 0 else 1


def reader_writer_soak(laps: int) -> int:
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
    reader = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--mode", "reader-child",
         "--table", table, "--stop-file", stop_file],
        stdout=subprocess.PIPE, text=True, cwd=_REPO,
    )
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
    finally:
        open(stop_file, "w").close()
    out, _ = reader.communicate(timeout=120)
    lines = [json.loads(ln) for ln in out.splitlines() if ln.strip()]
    reads = [ln for ln in lines if "count" in ln]
    bad = [ln for ln in reads if not ln["ok"]]
    verdict = {
        "mode": "readers",
        "writer_laps": laps,
        "reader_reads": len(reads),
        "inconsistent_reads": len(bad),
        "reader_exit": reader.returncode,
    }
    print(json.dumps(verdict), flush=True)
    ok = reader.returncode == 0 and not bad and len(reads) > 0
    print(f"RW-SOAK {'PASS' if ok else 'FAIL'}", flush=True)
    for ln in bad:
        print("  inconsistent read: " + json.dumps(ln), flush=True)
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--profile", choices=("local", "reliable", "both"), default="both")
    ap.add_argument("--mode", choices=("session", "readers", "reader-child"),
                    default="session")
    ap.add_argument("--table", help="(reader-child) table path")
    ap.add_argument("--stop-file", help="(reader-child) exit when this file appears")
    args = ap.parse_args()

    if args.mode == "reader-child":
        return _reader_child(args.table, args.stop_file)
    if args.mode == "readers":
        return reader_writer_soak(laps=max(args.laps, 15))

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
