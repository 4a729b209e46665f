"""Round-9 measurement probe: time named queries in one fresh session
built by the REAL session factory, with optional runtime SQL-conf
overrides.

Usage:
    python tools/probe_r09.py [--conf k=v ...] [--reps N] [--clear-memos] q_a q_b ...

Differences from tools/probe_r08.py (round-8 advice): the session
always comes from ``get_spark`` — so every probe baseline carries the
production defaults (parallelismFirst=false, derived advisory size,
…) — and ``--conf`` overrides are applied at RUNTIME via
``spark.conf.set`` (all AQE/SQL knobs are runtime-settable), which
cannot drift from session.py. ``--clear-memos`` clears session memos
between reps so a memo-consumer query re-pays its build each rep
(probing build cost rather than warm cost).

Prints per-query rep arrays + medians (noop sink, catalog cache
cleared between reps — the bench protocol in miniature).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    confs: dict[str, str] = {}
    reps = 3
    clear_memos = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--clear-memos":
            clear_memos = True
            i += 1
        else:
            names.append(args[i])
            i += 1

    from grader_etl_spark.registry import (
        REGISTRY,
        clear_session_memos,
        load_all_operators,
    )
    from grader_etl_spark.session import get_spark

    spark = get_spark(app_name="probe-r09")
    for k, v in confs.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # warm-up: JVM + python workers + every table's footer
    from pyspark.sql.functions import pandas_udf

    from grader_etl_spark.io import TABLES, load

    REGISTRY["q_daily_report"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    import pandas as pd  # noqa: F401  (resolves the identity hint)

    def _identity(s):
        return s

    warm_udf = pandas_udf(_identity, "long")
    spark.range(64).select(warm_udf("id")).write.format("noop").mode("overwrite").save()
    for t in TABLES:
        load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(reps):
            if clear_memos:
                clear_session_memos(spark)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        med = sorted(runs)[len(runs) // 2]
        results[name] = (med, runs)
        print(f"{med:7.3f}  {name:32s} {runs}", flush=True)
    print("TOTAL-MEDIANS", round(sum(m for m, _ in results.values()), 3))


if __name__ == "__main__":
    main()
