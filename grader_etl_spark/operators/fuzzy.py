"""Fuzzy string matching — edit-distance similarity join with
blocking.

The scale story is the blocking key, not the distance function: an
unblocked similarity join is O(n²) pairs and cannot run at 100 TB.
Blocking on an equality key (here p_brand; for free text, a cheap
canonical key like sorted-token-prefix or a SimHash band) turns it
into an equi-join whose per-block pair count is bounded, and the
expensive levenshtein() runs only inside blocks — the same
candidate-then-verify pattern as the MinHash/LSH operators
(llm_dedup.py). (*(ext)* operator; the reference does exact-key
matching only — main.py:202.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import memo_checkpoint, query

# Verified fuzzy-pair memo (keyed by session AND corpus dir — a
# checkpointed frame is bound to the session that made it, so a
# restarted session must rebuild, not replay a dead handle): the
# blocked levenshtein join is the expensive stage every consumer
# shares (q_fuzzy_match itself, entity resolution's closure) —
# materialize it once per session, like the shingle index and the
# cluster map.
_PAIR_CACHE: dict[tuple, DataFrame] = {}


def fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _PAIR_CACHE:
        _PAIR_CACHE[key] = memo_checkpoint(_blocked_levenshtein_pairs(spark, sf_dir))
    return _PAIR_CACHE[key]


# Length-band width for the second blocking conjunct. Edit distance
# ≤ 4 forces |len(a) - len(b)| ≤ 4, so with bands of width 5 a true
# match's bands differ by at most 1 — joining on (brand, band) with
# the b side duplicated into its 3 adjacent bands is LOSSLESS while
# pruning the cross-length candidate mass before the join instead of
# filtering it afterward.
_LEN_BAND = 5


def _banded_block_join(
    spark: SparkSession, sf_dir: str, *, repartition: int | None = None
) -> DataFrame:
    """The ONE (brand, length-band) blocking equi-join: both the
    production levenshtein path and the scale-probe audit surface
    consume this, so a change to the blocking key or the exploded-band
    scheme can never desynchronize the audit from the join it claims
    to measure. Returns the raw candidate join with ``a.*`` / ``b.*``
    columns still addressable.

    Exactly one of b's three exploded bands equals a's single band
    for any candidate pair, so the band join introduces no duplicate
    pairs — and |len diff| ≤ 4 ⇒ |band diff| ≤ 1 means it drops no
    true pair either (pinned by test_fuzzy_banding)."""
    cols = ["p_partkey", "p_brand", "p_name"]
    band = F.floor(F.length("p_name") / _LEN_BAND)
    a = load(spark, sf_dir, "part", columns=cols).withColumn("band", band)
    if repartition:
        # The table arrives as one file split; without a repartition
        # the broadcast join's probe side is a single task and every
        # core but one idles. Round-robin keeps per-task pair counts
        # even (brand hash would cap parallelism at 25 and inherit
        # brand skew).
        a = a.repartition(repartition)
    a = a.alias("a")
    b = (
        load(spark, sf_dir, "part", columns=cols)
        .withColumn("band", F.explode(F.array(band - 1, band, band + 1)))
        .alias("b")
    )
    return a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    )


def _blocked_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    len_ok = F.abs(F.length("a.p_name") - F.length("b.p_name")) <= 4
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 4)
    return (
        _banded_block_join(spark, sf_dir, repartition=64)
        .filter(len_ok & (dist >= 0))  # banded form returns -1 past the threshold
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            dist.cast("long").alias("edit_dist"),
        )
    )


def blocked_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit surface for the blocking design (tools/scale_probe.py
    --scale-dims): the candidate pairs ENTERING the levenshtein verify
    — the (brand, length-band) equi-join output before any distance
    work, from the SAME ``_banded_block_join`` the production path
    runs. Candidate count is the number that must stay ~linear in
    |part| as the catalog grows (block count grows with the brand
    space; block size stays bounded), because the verify pays per
    candidate."""
    return _banded_block_join(spark, sf_dir).select(
        F.col("a.p_partkey").alias("key_a"), F.col("b.p_partkey").alias("key_b")
    )


@query(
    "q_fuzzy_match",
    oracle="""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM part a
JOIN part b
  ON a.p_brand = b.p_brand
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names within a brand: equi-join on the
    blocking key (brand), ordered-pair dedup via key inequality, then
    the levenshtein ≤ 4 verify. The equality conjunct makes this a
    hash/sort-merge join — the planner never sees a cartesian — and
    the distance runs once per candidate pair, JVM-side.

    Two per-pair cost cuts: a length-difference ≤ 4 pre-filter (a
    free lower bound on edit distance) short-circuits hopeless pairs
    before any distance work, and the threshold form
    levenshtein(l, r, 4) runs the O(d·n) banded algorithm returning
    -1 past the band, instead of filling the full O(n·m) matrix.

    Served from the session pair memo (fuzzy_pairs): the blocked
    join materializes once per corpus and every consumer — this
    query and entity resolution's closure — reads the checkpoint."""
    return fuzzy_pairs(spark, sf_dir)


@query(
    "q_entity_resolution",
    oracle="""
WITH RECURSIVE pairs AS (
  SELECT a.p_partkey AS a, b.p_partkey AS b
  FROM part a
  JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) <= 4
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(p_partkey, label) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.p_partkey
),
ent AS (SELECT p_partkey, MIN(label) AS entity_id FROM reach GROUP BY p_partkey)
SELECT p_partkey, entity_id,
       CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS entity_size
FROM ent
""",
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy matching
    (q_fuzzy_match's brand-blocked levenshtein pairs) → connected
    components → one canonical entity id (min member key) per part,
    with the resolved entity size attached. This is the full
    dedupe-merge pipeline shape — candidate generation, pairwise
    verify, transitive closure, canonicalization — each stage the
    scale-safe primitive already pinned elsewhere (equi-join blocking,
    bounded propagation rounds on the edge-touched subgraph). The
    oracle recomputes the closure as a recursive CTE, so the composed
    pipeline is value-checked end to end."""
    from grader_etl_spark.operators.graph import components_from_pairs

    # The pair list feeds components_from_pairs directly (no
    # both-directions doubling, no re-canonicalizing distinct); the
    # blocked levenshtein join is read from the session pair memo, so
    # it is materialized once per corpus across every consumer.
    pairs = fuzzy_pairs(spark, sf_dir).select("key_a", "key_b")
    comp = components_from_pairs(pairs, "key_a", "key_b")
    parts = load(spark, sf_dir, "part", columns=["p_partkey"])
    singletons = parts.join(comp, parts.p_partkey == comp.id, "left_anti").select(
        "p_partkey", F.col("p_partkey").alias("entity_id")
    )
    resolved = singletons.unionByName(
        comp.select(F.col("id").alias("p_partkey"), F.col("component").alias("entity_id"))
    )
    w = Window.partitionBy("entity_id")
    return resolved.select(
        "p_partkey", "entity_id", F.count(F.lit(1)).over(w).cast("long").alias("entity_size")
    )
