"""Bloom-filter-pruned join: the canonical 100 TB shuffle-reduction
technique, expressed declaratively and oracle-gated.

A selective dimension predicate qualifies a key set; instead of
shuffling the full fact table into the join, a fixed-size Bloom
bitmap of the qualifying keys is built (one partial-agg pass over the
already-filtered dim), broadcast to every task as a literal, and the
fact side is pre-filtered MAP-SIDE by k bit-probes before the exact
join runs. False positives survive the probe and are removed by the
exact join; false negatives are impossible — so the RESULT is exact
and hash-oracled against the plain semi-join SQL, the same
"approximate machinery, exact contract" discipline as
q_salted_join_agg (skew.py).

This is what Spark's own runtime row-level filtering
(spark.sql.optimizer.runtime.bloomFilter.enabled) does when stats
justify it; building it explicitly makes the plan auditable and
portable, and gives a tuning surface (bits, hash count) the optimizer
doesn't expose.

Scale notes: the bitmap is M_BITS/64 longs (2 KiB here) regardless of
input size — the driver collect is bounded by the FILTER size, never
the data (same bounded-collect class as the k-means centroids). The
probe is a pure codegen'd projection: no explode, no join, no
shuffle; the only shuffles left are the post-prune exact join's,
carrying only survivors. At real scale you size M_BITS for the dim
key cardinality (~10 bits/key for ~1% FPR) and the prune rate is the
win: a 1% selective dim predicate drops ~99% of fact shuffle volume."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from grader_etl_spark.functions.literals import lit_longs
from grader_etl_spark.io import load
from grader_etl_spark.registry import query

M_BITS = 1 << 17  # 131072 bits = 2048 longs = 16 KiB bitmap
K_HASHES = 3
_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)[:K_HASHES]


def _positions(key: Column) -> list[Column]:
    """k bit positions for a key: xxhash64 with k fixed seeds, mod m.
    pmod keeps the result non-negative (hash is signed)."""
    return [F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(M_BITS)) for seed in _SEEDS]


def build_bloom_words(keys: DataFrame, key_col: str) -> list[int]:
    """Aggregate the key set into the bitmap: each key contributes k
    set bits; bits pack into 64-bit words via bit_or partial-aggs
    (map-side combine collapses to ≤ M_BITS/64 rows before the
    shuffle). Returns the dense word list (index = word number) for
    literal broadcast — 2048 longs, bounded by the filter geometry,
    not the key count."""
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            # shiftleft's bit-count arg must be a column here, which the
            # Python helper only takes as a literal — SQL form instead.
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * (M_BITS // 64)
    for r in words:
        dense[r["w"]] = r["word"]
    return dense


def bloom_prune(df: DataFrame, key_col: str, words: list[int]) -> DataFrame:
    """Map-side membership probe: keep rows whose key has all k bits
    set (false positives possible, false negatives not). The bitmap
    rides the plan as ONE array literal column; each probe is
    element_at + shiftleft + bitwise AND inside whole-stage codegen —
    no join, no shuffle."""
    checks = []
    for seed in _SEEDS:
        pos = f"pmod(xxhash64({key_col}, {seed}L), {M_BITS})"
        word = f"element_at(__bloom_words, cast(shiftright({pos}, 6) + 1 as int))"
        bit = f"shiftleft(1L, cast({pos} % 64 as int))"
        checks.append(f"(({word} & {bit}) != 0)")
    return (
        # lit_longs: ONE JSON literal instead of 2048 per-element py4j
        # conversions (~1.3s of driver time per construction), folded
        # to the identical array literal at plan time.
        df.withColumn("__bloom_words", lit_longs(words))
        .filter(F.expr(" AND ".join(checks)))
        .drop("__bloom_words")
    )


@query(
    "q_bloom_join",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
GROUP BY 1
""",
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag for lineitems of urgent 1997 orders,
    with the fact side pre-pruned by an explicit Bloom filter on the
    qualifying orderkeys before the exact semi join.

    Plan: filtered-orders scan → 2 KiB bitmap (bounded collect) →
    codegen'd bit-probe filter on lineitem (no shuffle, removes most
    non-qualifying rows at the scan) → exact broadcast/shuffle semi
    join on the survivors → partial-agged 3-row result. The oracle is
    the PLAIN semi-join SQL: the Bloom phase may only change how much
    data moves, never the multiset — the same hash-checked contract
    as the salted join."""
    dim = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_orderdate"]).filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey")
    words = build_bloom_words(dim, "o_orderkey")
    li = bloom_prune(
        load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_extendedprice"]),
        "l_orderkey",
        words,
    )
    pruned = li.join(dim, li.l_orderkey == dim.o_orderkey, "left_semi")
    return pruned.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )
