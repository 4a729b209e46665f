"""Corpus curation — the composed LLM-training-data pipeline (north
star): quality gating → exact dedup → near-dup pruning, end-to-end
over the documents table, oracle-checked as ONE query so the stage
composition itself is differentially tested.

Stages (each is an operator that already exists; this plan is the
composition):

1. quality gate   — text_analysis-style features, threshold filter
2. exact dedup    — normalized-fingerprint groupBy, keep min doc_id
3. near-dup prune — exact shingle-Jaccard pairs among survivors
                    (inverted-index candidates, llm_dedup), drop the
                    HIGHER doc_id of every pair (greedy, deterministic;
                    at 100 TB a union-find keeper pass over the pair
                    edges picks one doc per duplicate component —
                    greedy is the per-edge approximation both engines
                    compute identically)

Scale shape: stage 1 is a scan-side filter (pushes nothing — computed
features — but prunes ~rows before any shuffle); stages 2-3 shuffle
hashes and (shingle, id) pairs only, never document content pairwise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.operators.llm_dedup import (
    _JACCARD_THRESHOLD,
    shingles,
)
from grader_etl_spark.operators.text_analysis import STOPWORDS, tokens
from grader_etl_spark.registry import memo_checkpoint, query
from grader_etl_spark.functions.quantize import floor_quantize
from grader_etl_spark.functions.textnorm import WS_RE, norm_lower

MIN_WORDS = 10
MAX_STOPWORD_RATIO = 0.60


def quality_gate(docs: DataFrame) -> DataFrame:
    """Stage 1: keep documents with enough words and a sane stopword
    ratio (the cheap junk filter before any expensive stage)."""
    toks = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_words = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return (
        docs.withColumn("n_words", n_words.cast("long"))
        .withColumn("stop_ratio", n_stop.cast("double") / F.col("n_words"))
        .filter(
            (F.col("n_words") >= MIN_WORDS) & (F.col("stop_ratio") <= MAX_STOPWORD_RATIO)
        )
    )


def exact_dedup(gated: DataFrame) -> DataFrame:
    """Stage 2: exact dedup on the normalized fingerprint — keep the
    min doc_id per fingerprint. Returns persisted keepers (the frame
    feeds the shingle stage AND the final anti-join; persisting runs
    gate+dedup once, not 3-4×)."""
    fp = F.md5(F.regexp_replace(norm_lower("text"), WS_RE, " "))
    return (
        gated.select("doc_id", "n_words", "text", fp.alias("fp"))
        .withColumn("rk", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
        .filter(F.col("rk") == 1)
        .drop("rk", "fp")
        .persist()
    )


def neardup_prune(
    keepers: DataFrame,
    shingle_index: DataFrame | None = None,
    pair_memo: DataFrame | None = None,
) -> DataFrame:
    """Stage 3: exact near-dup pairs among keepers (inverted-index
    candidates), drop the higher doc_id of every qualifying pair.
    Returns (doc_id, n_words) of curated docs.

    ``pair_memo``: optional session pair table (llm_dedup.
    jaccard_pairs_memo — same shingle definition, same threshold,
    doc_id_1 < doc_id_2). Exact Jaccard is pairwise, so the qualifying
    pairs among keepers are exactly the memo rows with BOTH endpoints
    in the keeper set: two semi-joins replace the inverted-index
    self-join entirely."""
    if pair_memo is not None:
        k1 = keepers.select(F.col("doc_id").alias("doc_id_1"))
        k2 = keepers.select(F.col("doc_id").alias("doc_id_2"))
        drop_ids = (
            pair_memo.join(k1, "doc_id_1", "left_semi")
            .join(k2, "doc_id_2", "left_semi")
            .select(F.col("doc_id_2").alias("doc_id"))
            .distinct()
        )
        return keepers.join(drop_ids, "doc_id", "left_anti").select("doc_id", "n_words")
    if shingle_index is not None:
        sh = keepers.select("doc_id").join(shingle_index, "doc_id")
    else:
        sh = keepers.select("doc_id", shingles(F.col("text")).alias("sset")).persist()
    ex = sh.select("doc_id", F.explode("sset").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sizes = sh.select("doc_id", F.size("sset").alias("sz"))
    drop_ids = (
        inter.join(F.broadcast(sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1"))), "id1")
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2"))), "id2")
        .filter(F.col("c").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("c")) >= _JACCARD_THRESHOLD)
        .select(F.col("id2").alias("doc_id"))
        .distinct()
    )
    return keepers.join(drop_ids, "doc_id", "left_anti").select("doc_id", "n_words")


def curate(docs: DataFrame, shingle_index: DataFrame | None = None) -> DataFrame:
    """The full pipeline; returns (doc_id, n_words) of curated docs.

    ``shingle_index``: optional pre-materialized (doc_id, sset) frame
    (llm_dedup.shingled_docs) — when provided, stage 3 joins it by
    doc_id instead of re-tokenizing the keeper texts, so the corpus is
    shingled once per session across every near-dup operator."""
    return neardup_prune(exact_dedup(quality_gate(docs)), shingle_index)


# Session memo of the per-stage id frames (keyed by session AND corpus
# dir, the shingle/pair-memo discipline): q_curate_corpus and
# q_curation_funnel both walk the identical gate → dedup → prune
# pipeline — without the memo the gate+dedup subtree ran twice inside
# the funnel and the whole pipeline re-ran across the two queries.
_STAGE_CACHE: dict[tuple, dict] = {}


def curation_stages(spark: SparkSession, sf_dir: str) -> dict:
    key = (spark, sf_dir)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    from grader_etl_spark.operators.llm_dedup import jaccard_pairs_memo

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    gated = quality_gate(docs)
    keepers = exact_dedup(gated)  # persists internally (feeds 2 subtrees)
    final = neardup_prune(keepers, pair_memo=jaccard_pairs_memo(spark, sf_dir))
    stages = {
        "gated_ids": memo_checkpoint(gated.select("doc_id")),
        "keeper_ids": memo_checkpoint(keepers.select("doc_id")),
        "final": memo_checkpoint(final),
    }
    _STAGE_CACHE[key] = stages
    return stages


# The naive-SQL rendition of the three stages, shared by the curate
# oracle and the funnel oracle below so both differential checks pin
# the SAME semantics.
_CURATE_CTES = f"""toks AS (
  SELECT doc_id, text, string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+') AS tk
  FROM documents
),
gated AS (
  SELECT doc_id, text, length(tk) AS n_words
  FROM toks
  WHERE length(tk) >= {MIN_WORDS}
    AND CAST(length(list_filter(tk, t -> t IN ({", ".join(repr(w) for w in STOPWORDS)}))) AS DOUBLE)
        / length(tk) <= {MAX_STOPWORD_RATIO}
),
keepers AS (
  SELECT doc_id, text, n_words
  FROM (
    SELECT doc_id, text, n_words,
           ROW_NUMBER() OVER (
             PARTITION BY md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))
             ORDER BY doc_id) AS rk
    FROM gated
  ) WHERE rk = 1
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - 1, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM keepers
),
dropped AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
)"""


@query(
    "q_curate_corpus",
    oracle=f"""
WITH {_CURATE_CTES}
SELECT k.doc_id, k.n_words
FROM keepers k
WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
""",
)
def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline as one differential query —
    quality gate, exact dedup, near-dup prune, all stages in one plan
    checked against the naive-SQL rendition. Stage 3 reads the
    session-materialized shingle index shared with the other near-dup
    operators; the composed result itself is the curation_stages
    session memo, shared with q_curation_funnel."""
    return curation_stages(spark, sf_dir)["final"]


@query(
    "q_curation_funnel",
    oracle=f"""
WITH {_CURATE_CTES},
final AS (
  SELECT k.doc_id FROM keepers k
  WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT)          AS n_total,
       CAST(COUNT(g.doc_id) AS BIGINT)   AS n_gated,
       CAST(COUNT(k.doc_id) AS BIGINT)   AS n_unique,
       CAST(COUNT(f.doc_id) AS BIGINT)   AS n_final,
       CASE WHEN abs(CAST(COUNT(f.doc_id) AS DOUBLE) / COUNT(*)) < 4.5e9 THEN floor((CAST(COUNT(f.doc_id) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 ELSE (CAST(COUNT(f.doc_id) AS DOUBLE) / COUNT(*)) END AS keep_rate
FROM documents d
LEFT JOIN (SELECT doc_id FROM gated)   g ON g.doc_id = d.doc_id
LEFT JOIN (SELECT doc_id FROM keepers) k ON k.doc_id = d.doc_id
LEFT JOIN final                        f ON f.doc_id = d.doc_id
GROUP BY d.source
""",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source attrition through the curation stages: how many docs
    each source contributes at intake, past the quality gate, past
    exact dedup, and into the final corpus — the report that tells a
    data team WHICH source is paying for its storage (a source whose
    keep_rate collapses at the dedup stage is re-crawling itself).

    The stage id-sets are joined back as (doc_id)-only frames, so
    every join carries keys, never text; the shingle stage reuses the
    session-materialized index like q_curate_corpus. The funnel oracle
    shares the exact CTE text with the curate oracle, so both
    differential checks pin one semantics. All three stage id-sets
    come from the curation_stages session memo (shared with
    q_curate_corpus), so the pipeline materializes once per corpus."""
    stages = curation_stages(spark, sf_dir)
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "source"])
    gated_ids = stages["gated_ids"].select("doc_id", F.lit(1).alias("g"))
    keeper_ids = stages["keeper_ids"].select("doc_id", F.lit(1).alias("k"))
    final_ids = stages["final"].select("doc_id", F.lit(1).alias("f"))
    return (
        docs.select("doc_id", "source")
        .join(gated_ids, "doc_id", "left")
        .join(keeper_ids, "doc_id", "left")
        .join(final_ids, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("g").alias("n_gated"),
            F.count("k").alias("n_unique"),
            F.count("f").alias("n_final"),
            floor_quantize(F.count("f").cast("double") / F.count(F.lit(1)), 6).alias("keep_rate"),
        )
    )
