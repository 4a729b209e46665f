"""10× scaling probe: does the plan's cost grow like the data?

Builds a one-off ~sf1 dataset in /tmp by unioning K shifted copies of
the sf0.1 fixtures (keys offset per copy so join/group cardinalities
scale rather than collapse), then times a handful of headline queries
at both scales and reports the wall-clock ratio next to the data
ratio. A shuffle-bound plan should scale ~linearly (ratio ≈ K on a
fixed-core box); super-linear growth exposes a plan whose cost is in
pair blowup or state, not scan — exactly what the 100 TB review asks.

Usage: python tools/scale_probe.py [K] [query ...]
Writes no repo state; results go to stdout (record them in
BASELINE.md by hand so the numbers stay attached to their commit).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from grader_etl_spark.registry import REGISTRY, all_queries  # noqa: E402
from grader_etl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_scaled"

# Key columns to offset per copy so cardinalities scale.
OFFSETS = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "customer": {"c_custkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
SMALL = ("region", "nation", "supplier", "part")  # dims stay as-is

DEFAULT_QUERIES = [
    "q_pricing_summary",   # scan+agg throughput headline
    "q_daily_report",      # global agg
    "q_shipping_priority", # star join
    "q_dedup_key",         # keyed dedup
    "q_token_count",       # text explode+agg
    "q_neardup_minhash",   # LSH banding pipeline
]


def build(spark, k: int) -> None:
    os.makedirs(DST, exist_ok=True)
    for t in SMALL:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    for t, offs in OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(k):
            df = base
            for col, step in offs.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def time_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="grader-etl-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()

    print(f"building {k}x dataset at {DST} ...", flush=True)
    build(spark, k)

    print(f"{'query':32s} {'sf0.1':>8s} {'x' + str(k):>8s} {'ratio':>7s}")
    for name in names:
        # warm both paths once (memos/codegen), then measure.
        time_query(spark, name, SRC)
        small = time_query(spark, name, SRC)
        time_query(spark, name, DST)
        big = time_query(spark, name, DST)
        print(f"{name:32s} {small:8.2f} {big:8.2f} {big / small:7.2f}", flush=True)


if __name__ == "__main__":
    main()
