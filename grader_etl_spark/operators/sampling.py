"""Deterministic sampling operators.

A training-data pipeline at 100 TB cannot use seed-based random
sampling for anything that must be reproducible across reruns, engine
versions, or partition layouts — ``df.sample(seed=…)`` changes with
partitioning. The scale-correct idiom is HASH sampling: a pure
function of the row key decides membership, so the sample is stable
under repartitioning, retries, and incremental recomputation, and the
predicate evaluates map-side with zero shuffle (reference surface:
the repo's only sampling is the 7-day fetch window, main.py:104-111 —
these are *(ext)* operators mandated by the north star).

md5 is used as the hash because both Spark and DuckDB ship it with
identical semantics, making the sample itself oracle-checkable —
crc32/xxhash64 exist only on one side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize
from grader_etl_spark.functions.textnorm import WS_RE, norm_lower


def hash_bucket(cols: list[str], buckets: int = 16) -> F.Column:
    """Stable [0, buckets) bucket from the md5 of '-'-joined key columns.

    First 8 hex chars → int via conv(); one md5 per row, evaluated
    map-side (no shuffle, survives repartitioning)."""
    key = F.concat_ws("-", *[F.col(c).cast("string") for c in cols])
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % buckets).alias("bucket")


@query(
    "q_sample_hash",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substring(md5(concat_ws('-', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))), 1, 1)
      IN ('0', '1', '2')
""",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~18.75% (3/16) sample of lineitem keyed on the
    composite natural key. Map-side predicate, no shuffle; the same
    rows are selected no matter how the table is partitioned — the
    property seed-based sample() lacks at scale."""
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return li.filter(F.substring(F.md5(key), 1, 1).isin("0", "1", "2"))


@query(
    "q_sample_stratified",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY md5(concat_ws('-', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))),
                    l_orderkey, l_linenumber
         ) AS rn
  FROM lineitem
)
WHERE rn <= 50
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced stratified sample: exactly 50 rows per l_returnflag
    stratum, chosen as the smallest md5 values within the stratum —
    a deterministic per-group reservoir (class rebalancing for
    training data is this exact shape).

    Two-phase salted top-k: a single rank window per stratum would
    shuffle the whole table into |strata| partitions — 3 tasks no
    matter how many executors exist, the per-group twin of the global
    orderBy bottleneck. Instead phase 1 ranks within (stratum, salt)
    where salt is derived from the SAME row hash (pure row function →
    deterministic under any partitioning, retries included): 3×64
    parallel sorts, each group's top-50 a superset contributor. Phase
    2 re-ranks the ≤ strata×64×50 survivors — driver-trivial at any
    scale. Same output, sort parallelism |strata|×64 instead of
    |strata|."""
    li = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_orderkey", "l_linenumber"])
    h = F.md5(
        F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    )
    salt = F.conv(F.substring(h, 29, 4), 16, 10).cast("long") % 64
    w1 = Window.partitionBy("l_returnflag", "salt").orderBy("h", "l_orderkey", "l_linenumber")
    w2 = Window.partitionBy("l_returnflag").orderBy("h", "l_orderkey", "l_linenumber")
    return (
        li.withColumn("h", h)
        .withColumn("salt", salt)
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= 50)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 50)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
    )


@query(
    "q_train_split",
    oracle="""
SELECT doc_id,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~90/5/5) from the
    doc-key md5: the first two hex chars partition [0,256) into
    [0,230)/[230,243)/[243,256) via plain string comparison. Pure
    map-side, reproducible under any partitioning or re-run, and
    stable as the corpus grows (a document's split never changes when
    other documents arrive) — the property row_number()-based splits
    lack. Leakage-sensitive corpora key the hash on the DEDUP
    CLUSTER id (q_dedup_components) instead of the doc id so
    near-duplicates land in the same split."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id"])
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.select(
        "doc_id",
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test").alias("split"),
    )


@query(
    "q_split_balance",
    oracle="""
WITH assigned AS (
  SELECT doc_id, source,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CASE WHEN abs(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY source)) < 4.5e9 THEN floor((CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY source)) * 1e6 + 0.5) / 1e6 ELSE (CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY source)) END AS frac_of_source
FROM assigned
GROUP BY source, split
""",
)
def q_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-balance audit for the hash train/val/test split
    (q_train_split): per (source, split) counts and each split's
    observed fraction WITHIN its source. The check every leakage
    review runs — a source whose val fraction drifts far from the
    global target signals id-space structure correlating with the
    hash. One aggregate plus a window over the aggregated (source,
    split) grid (≤ sources×3 rows)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "source"])
    split = (
        F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "e6", "train")
        .when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "f3", "val")
        .otherwise("test")
    )
    counted = docs.select("source", split.alias("split")).groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("source")
    return counted.select(
        "source",
        "split",
        "n_docs",
        floor_quantize(F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6).alias(
            "frac_of_source"
        ),
    )


@query(
    "q_split_leakage",
    oracle="""
WITH assigned AS (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS fp,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
train_fp AS (SELECT DISTINCT fp FROM assigned WHERE split = 'train'),
held AS (SELECT * FROM assigned WHERE split <> 'train')
SELECT h.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(t.fp) AS BIGINT) AS n_leaked,
       CASE WHEN abs(CAST(COUNT(t.fp) AS DOUBLE) / COUNT(*)) < 4.5e9 THEN floor((CAST(COUNT(t.fp) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 ELSE (CAST(COUNT(t.fp) AS DOUBLE) / COUNT(*)) END AS leak_rate
FROM held h LEFT JOIN train_fp t ON t.fp = h.fp
GROUP BY h.split
""",
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval leakage audit: for each held-out split, how many
    docs' NORMALIZED content fingerprints (the exact-dedup key —
    lower + whitespace-collapse + md5) also appear in train. This is
    the check that catches the classic failure q_train_split's
    docstring warns about — keying the split on doc_id while exact
    duplicates straddle the boundary. Composes the registered split
    rule with the 16-byte fingerprint ledger: the join carries
    (fp, split) pairs only, never text, and the train side is a
    distinct fingerprint set — at 100 TB both sides are hash-sized.
    Zero leaked rows here does NOT clear near-duplicates; that is
    q_decontaminate's n-gram job."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    assigned = docs.select(
        F.md5(F.regexp_replace(norm_lower("text"), WS_RE, " ")).alias("fp"),
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test").alias("split"),
        # both the train-ledger branch and the held branch read this
        # frame — materialize the text hashing ONCE, not per branch
    ).persist()
    train_fp = assigned.filter(F.col("split") == "train").select("fp").distinct()
    held = assigned.filter(F.col("split") != "train")
    t = train_fp.select(F.col("fp").alias("tfp"))
    return (
        held.join(t, held.fp == t.tfp, "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("tfp").alias("n_leaked"),
            floor_quantize(F.count("tfp").cast("double") / F.count(F.lit(1)), 6).alias("leak_rate"),
        )
    )


# Total sample slots to allocate across sources (largest-remainder).
ALLOC_TARGET = 10_000


@query(
    "q_sample_allocation",
    oracle=f"""
WITH cnt AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
), base AS (
  SELECT source, n_docs,
         CAST(SUM(n_docs) OVER () AS BIGINT)           AS total,
         ({ALLOC_TARGET} * n_docs) // SUM(n_docs) OVER ()  AS floor_quota,
         ({ALLOC_TARGET} * n_docs) %  SUM(n_docs) OVER ()  AS remainder
  FROM cnt
), ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (ORDER BY remainder DESC, source NULLS FIRST) AS BIGINT)
           AS rem_rank,
         {ALLOC_TARGET} - CAST(SUM(floor_quota) OVER () AS BIGINT) AS leftover
  FROM base
)
SELECT source, n_docs,
       CAST(floor_quota + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM ranked
""",
)
def q_sample_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder quota allocation: split a fixed budget of
    ALLOC_TARGET sample slots across sources proportional to size,
    with integer quotas that sum EXACTLY to the budget (floor quotas
    + one extra slot to the largest fractional remainders). This is
    the apportionment step in front of stratified sampling
    (q_sample_stratified): naive round() quotas can miss the budget
    by ±|sources|/2; this never does, and every step is integer
    arithmetic — div for floors, mod for remainders, a deterministic
    (remainder desc, source) tie-break — so both engines allocate
    identically.

    Shape: the corpus reduces to |sources| rows in one partial-agg
    shuffle; the total/rank windows run on that tiny frame."""
    docs = load(spark, sf_dir, "documents", columns=["source"])
    cnt = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    wall = Window.partitionBy()
    base = cnt.select(
        "source",
        "n_docs",
        F.sum("n_docs").over(wall).alias("total"),
    ).select(
        "source",
        "n_docs",
        F.expr(f"({ALLOC_TARGET} * n_docs) div total").alias("floor_quota"),
        (F.lit(ALLOC_TARGET) * F.col("n_docs") % F.col("total")).alias("remainder"),
    )
    ranked = base.select(
        "source",
        "n_docs",
        "floor_quota",
        F.row_number()
        .over(Window.orderBy(F.desc("remainder"), F.col("source").asc_nulls_first()))
        .cast("long")
        .alias("rem_rank"),
        (F.lit(ALLOC_TARGET) - F.sum("floor_quota").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "source",
        "n_docs",
        (
            F.col("floor_quota")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )
