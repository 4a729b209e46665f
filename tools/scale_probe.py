"""10× scaling probe: does the plan's cost grow like the data?

Builds a one-off ~sf1 dataset in /tmp by unioning K shifted copies of
the sf0.1 fixtures (keys offset per copy so join/group cardinalities
scale rather than collapse), then times a handful of headline queries
at both scales and reports the wall-clock ratio next to the data
ratio. A shuffle-bound plan should scale ~linearly (ratio ≈ K on a
fixed-core box); super-linear growth exposes a plan whose cost is in
pair blowup or state, not scan — exactly what the 100 TB review asks.

Usage: python tools/scale_probe.py [K] [query ...]
       python tools/scale_probe.py --scale-dims [K]

``--scale-dims`` scales the DIMENSION the fuzzy/entity family blocks
on instead of the facts: `part` is cloned K× with perturbed names and
a widened brand space (catalog growth adds manufacturers/brands, so
the (brand, length-band) block COUNT grows while block SIZE stays
bounded — that is the invariant that keeps blocked similarity joins
linear). Reports candidate-pair count, verified-pair count, and wall
ratios for the fuzzy family at 1× vs K×, with session memos cleared
before every timed run so each run pays its own build.

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


DIMS_DST = "/tmp/spark_graft_scaled_dims"


def build_dims(spark, k: int, dense: bool = False) -> None:
    """K× part catalog: clone i offsets keys, maps brands into a fresh
    per-copy brand space (Brand#i.MN — catalog growth means MORE
    brands, not denser ones), and perturbs names with a deterministic
    per-copy vowel swap so clones are near-but-not-exact duplicates of
    their source rows (realistic near-dup mass inside each new brand's
    blocks). Every other table copies through unchanged.

    ``dense=True`` is the CONVERSE regime: clones keep the ORIGINAL
    brand space, so every block gets K× denser and candidate pairs
    grow ~K² — the failure mode the blocking-key choice exists to
    avoid, measured so the boundary is a number, not prose."""
    os.makedirs(DIMS_DST, exist_ok=True)
    for t in ("region", "nation", "supplier", "customer", "orders",
              "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DIMS_DST}/{t}.parquet"
        )
    base = spark.read.parquet(f"{SRC}/part.parquet")
    vowel_maps = ["aeiou", "eioua", "iouae", "ouaei", "uaeio"]
    parts = []
    for i in range(k):
        df = base.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * 10_000_000))
        if i > 0:
            if not dense:
                df = df.withColumn("p_brand", F.concat(F.lit(f"B{i}."), F.col("p_brand")))
            df = df.withColumn(
                "p_name", F.translate(F.col("p_name"), "aeiou", vowel_maps[i % 5])
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DIMS_DST}/part.parquet")


def run_dims_probe(k: int, dense: bool = False) -> None:
    from grader_etl_spark.operators.fuzzy import blocked_candidates, fuzzy_pairs
    from grader_etl_spark.registry import clear_session_memos

    spark = get_spark(app_name="grader-etl-spark-dims-probe")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()
    mode = "dense (fixed brand space)" if dense else "broad (brand space grows)"
    print(f"building {k}x part catalog [{mode}] at {DIMS_DST} ...", flush=True)
    build_dims(spark, k, dense=dense)

    stats: dict[str, dict] = {}
    for label, d in (("1x", SRC), (f"{k}x", DIMS_DST)):
        n_part = spark.read.parquet(f"{d}/part.parquet").count()
        cand = blocked_candidates(spark, d).count()
        clear_session_memos(spark)
        t0 = time.perf_counter()
        verified = fuzzy_pairs(spark, d).count()
        fuzzy_wall = time.perf_counter() - t0
        clear_session_memos(spark)
        t0 = time.perf_counter()
        REGISTRY["q_entity_resolution"].fn(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        er_wall = time.perf_counter() - t0
        clear_session_memos(spark)
        stats[label] = {
            "part": n_part, "cand": cand, "pairs": verified,
            "fuzzy_s": fuzzy_wall, "er_s": er_wall,
        }
        print(
            f"{label:>4s}: |part|={n_part:>8,d} candidates={cand:>10,d} "
            f"verified={verified:>8,d} fuzzy={fuzzy_wall:6.2f}s "
            f"entity_res={er_wall:6.2f}s",
            flush=True,
        )
    a, b = stats["1x"], stats[f"{k}x"]
    print(
        f"ratios at {k}x parts: candidates {b['cand']/a['cand']:.2f} "
        f"verified {b['pairs']/a['pairs']:.2f} "
        f"fuzzy wall {b['fuzzy_s']/a['fuzzy_s']:.2f} "
        f"entity-res wall {b['er_s']/a['er_s']:.2f} "
        f"(linear = {k:.2f})",
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in ("--scale-dims", "--scale-dims-dense"):
        run_dims_probe(
            int(sys.argv[2]) if len(sys.argv) > 2 else 10,
            dense=sys.argv[1].endswith("dense"),
        )
        return
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
