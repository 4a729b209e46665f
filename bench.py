"""Benchmark harness: runs every registered query at the bench scale
factor and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q_daily_report": sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).

Each query is forced to full materialization with the noop sink
(df.write.format("noop")) — measures the whole plan including the
final exchange, without driver-collect distortion. One warm-up query
runs first so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from grader_etl_spark.registry import REGISTRY, load_all_operators  # noqa: E402
from grader_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="grader-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()

    # Warm-up: JVM, codegen, parquet footer caches.
    REGISTRY["q_daily_report"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "sum of per-query wall seconds, all registered queries, noop sink",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
