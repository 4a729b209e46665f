"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names/dtypes, and order-insensitive values (exact for
ints/strings, bit-exact-first with a tiny epsilon report for floats —
the real driver hashes, so we treat any float difference as a FAIL
signal worth fixing, not tolerating).

Usage: python tools/oracle_check.py [--sf /root/testdata/sf0.01]
           [--json CORRECTNESS_FULL.json] [names...]

--json writes a driver-shaped artifact (per query: rows_match /
schema_match / hash_match / spark_rows / oracle_rows / err, plus
rows_only for the no-oracle-by-design queries) so the full-registry
correctness status is a committed, diffable file each round instead
of resting on an uncommitted terminal scroll.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from grader_etl_spark.io import TABLES  # noqa: E402
from grader_etl_spark.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(sdf) != len(odf):
        return [f"row count: spark={len(sdf)} oracle={len(odf)}"]
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        return [f"columns: spark={list(s.columns)} oracle={list(o.columns)}"]
    for c in s.columns:
        sv, ov = s[c], o[c]
        if str(sv.dtype) != str(ov.dtype):
            problems.append(f"dtype[{c}]: spark={sv.dtype} oracle={ov.dtype}")
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            eq = (a == b) | both_nan
            if not eq.all():
                diff = np.abs(a - b)[~eq]
                problems.append(
                    f"float[{c}]: {int((~eq).sum())}/{len(a)} differ, max_abs_diff={np.nanmax(diff):.3e}"
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(f"value[{c}]: {int((~eq).sum())} differ, e.g. {sv.iloc[i]!r} vs {ov.iloc[i]!r}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", dest="json_path", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args.names or sorted(qs)

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        # Driver fixtures are single files; Spark-written tables (the
        # scale probe's /tmp corpus) are part-file directories.
        path = f"{args.sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_fail = 0
    report: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": traceback.format_exc(limit=1).strip().splitlines()[-1],
            }
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows-only, {len(sdf)} rows ({el:.1f}s)")
            report[name] = {
                "rows_match": len(sdf) >= 0, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None,
                "err": None, "rows_only": True,
            }
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            n_fail += 1
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(sdf), "oracle_rows": None,
                "err": traceback.format_exc(limit=1).strip().splitlines()[-1],
            }
            continue
        problems = compare(name, sdf, odf)
        report[name] = {
            "rows_match": not any(p.startswith("row count") for p in problems),
            "schema_match": not any(
                p.startswith(("columns", "dtype")) for p in problems
            ),
            "hash_match": not problems,
            "spark_rows": len(sdf), "oracle_rows": len(odf),
            "err": "; ".join(problems) or None,
        }
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({len(sdf)} rows, {el:.1f}s): " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(sdf)} rows match ({el:.1f}s)")
    print(f"\n{len(names) - n_fail}/{len(names)} passing")
    if args.json_path:
        with open(args.json_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {args.json_path} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
