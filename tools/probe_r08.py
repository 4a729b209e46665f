"""Round-8 measurement probe: time named queries under optional Spark
config overrides, in one fresh session.

Usage:
    python tools/probe_r08.py [--conf k=v ...] [--reps N] q_a q_b ...

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
        else:
            names.append(args[i])
            i += 1

    from pyspark.sql import SparkSession

    from grader_etl_spark.registry import REGISTRY, load_all_operators
    from grader_etl_spark.session import get_spark

    spark = None
    if confs:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
        b = SparkSession.builder.master(f"local[{cpus}]").appName("probe-r08")
        for k, v in confs.items():
            b = b.config(k, v)
        # mirror session.py essentials
        base = {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.shuffle.partitions": str(max(cpus, 8)),
            "spark.default.parallelism": str(max(cpus, 8)),
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.legacy.parquet.nanosAsLong": "true",
            "spark.sql.python.filterPushdown.enabled": "true",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
            "spark.driver.memory": "8g",
            "spark.ui.enabled": "false",
        }
        for k, v in base.items():
            if k not in confs:
                b = b.config(k, v)
        spark = b.getOrCreate()
    else:
        spark = get_spark(app_name="probe-r08")
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # warm-up: JVM + python workers + every table's footer
    from pyspark.sql import functions as F

    from grader_etl_spark.io import TABLES, load

    REGISTRY["q_daily_report"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for t in TABLES:
        load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(reps):
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
