"""Training-corpus sharding and source-mixture weighting — the two
ops that sit between a curated corpus and the training-data writer.
(North-star operators; the reference has no corpus surface — its only
layout decision is the single statistics table at main.py:180-228.)

Scale design: both are one-pass. Shard assignment is a pure projection
on the cross-engine md5_32 hash (functions/hashing.py) — at 100 TB the
writer runs ``repartition(N_SHARDS, shard_id)`` +
``sortWithinPartitions(sort_key)`` and streams each shard file out,
one shuffle total, no global sort (the hash IS the global shuffle
order). Mixture rates are a per-source aggregate (map-side partial)
joined against one broadcast total row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.functions.hashing import MD5_32_SQL, md5_32
from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize
from grader_etl_spark.functions.textnorm import WS_RE

N_SHARDS = 16


@query(
    "q_corpus_shards",
    oracle=f"""
SELECT doc_id,
       {MD5_32_SQL.format(expr="CONCAT('shard:', doc_id)")} % {N_SHARDS} AS shard_id,
       {MD5_32_SQL.format(expr="CONCAT('order:', doc_id)")}              AS sort_key
FROM documents
""",
)
def q_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment + global shuffle order for
    training-data writing: shard = keyed hash mod N, within-shard
    order = an independent keyed hash. Hash-derived order is a full
    corpus shuffle that needs NO random state and NO global sort —
    reproducible across runs, engines (md5_32 oracle), and
    partitionings. The writer path is repartition(N, shard_id) +
    sortWithinPartitions(sort_key); this query materializes the
    assignment it would use."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id"])
    return docs.select(
        "doc_id",
        (md5_32(F.concat(F.lit("shard:"), F.col("doc_id"))) % N_SHARDS).alias("shard_id"),
        md5_32(F.concat(F.lit("order:"), F.col("doc_id"))).alias("sort_key"),
    )


@query(
    "q_mixture_rates",
    oracle="""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS n_total, COUNT(*) AS n_sources FROM per_source)
SELECT source,
       n_docs,
       CASE WHEN abs(CAST(n_docs AS DOUBLE) / n_total) < 4.5e9 THEN floor((CAST(n_docs AS DOUBLE) / n_total) * 1e6 + 0.5) / 1e6 ELSE (CAST(n_docs AS DOUBLE) / n_total) END AS share,
       CASE WHEN abs(LEAST(1.0, (CAST(n_total AS DOUBLE) / n_sources) / n_docs)) < 4.5e9 THEN floor((LEAST(1.0, (CAST(n_total AS DOUBLE) / n_sources) / n_docs)) * 1e6 + 0.5) / 1e6 ELSE (LEAST(1.0, (CAST(n_total AS DOUBLE) / n_sources) / n_docs)) END AS sample_rate,
       CAST(FLOOR(LEAST(1.0, (CAST(n_total AS DOUBLE) / n_sources) / n_docs) * n_docs)
            AS BIGINT) AS expected_docs
FROM per_source CROSS JOIN tot
""",
)
def q_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing: per-source sampling rates that move
    the corpus toward a uniform source mixture WITHOUT upsampling
    (rate = min(1, target_share/actual_share)) — the standard
    pretraining-mixture lever. One map-side-partial aggregate over the
    corpus plus a broadcast 1-row total; the rates then drive
    q_sample_weighted-style hash sampling, so the whole rebalance is
    deterministic end to end."""
    from pyspark.sql import Window

    per_source = (
        load(spark, sf_dir, "documents", columns=["source"])
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # Totals via an all-rows window over the AGGREGATED frame (one row
    # per source — tiny by construction), not a crossJoin against a
    # separate total aggregate: Catalyst doesn't share subtrees, so the
    # crossJoin form scans and aggregates the corpus twice.
    w = Window.partitionBy()
    totaled = per_source.select(
        "source",
        "n_docs",
        F.sum("n_docs").over(w).alias("n_total"),
        F.count(F.lit(1)).over(w).alias("n_sources"),
    )
    rate = F.least(
        F.lit(1.0), (F.col("n_total").cast("double") / F.col("n_sources")) / F.col("n_docs")
    )
    return totaled.select(
        "source",
        "n_docs",
        floor_quantize(F.col("n_docs").cast("double") / F.col("n_total"), 6).alias("share"),
        floor_quantize(rate, 6).alias("sample_rate"),
        F.floor(rate * F.col("n_docs")).cast("long").alias("expected_docs"),
    )


@query(
    "q_quality_percentile_gate",
    oracle="""
WITH scored AS (
  SELECT doc_id, source,
         length(text) AS n_chars,
         percent_rank() OVER (PARTITION BY source ORDER BY length(text) NULLS FIRST, doc_id) AS pr
  FROM documents
)
SELECT doc_id, source, n_chars, CASE WHEN abs(pr) < 4.5e9 THEN floor((pr) * 1e6 + 0.5) / 1e6 ELSE (pr) END AS len_pct_rank
FROM scored
WHERE pr >= 0.2
""",
)
def q_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality gating by PERCENTILE, not absolute
    threshold: drop each source's bottom 20% by the quality proxy
    (document length here; any q_text_stats feature slots in). The
    per-source window means a verbose source can't crowd out a terse
    one — the standard way corpus curation applies quality filters per
    domain. One window over a (source)-partitioned sort; at 100 TB
    this is a single shuffle on source with per-partition sorting, no
    global sort. doc_id tie-break keeps ranks deterministic."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    # NULLS FIRST pinned explicitly: Spark default, DuckDB is NULLS LAST
    w = Window.partitionBy("source").orderBy(F.length("text").asc_nulls_first(), "doc_id")
    return (
        docs.select(
            "doc_id",
            "source",
            F.length("text").cast("long").alias("n_chars"),
            F.percent_rank().over(w).alias("pr"),
        )
        .filter(F.col("pr") >= 0.2)
        .select("doc_id", "source", "n_chars", floor_quantize("pr", 6).alias("len_pct_rank"))
    )


# ---------------------------------------------------------------------------
# L64 — shard balance audit (token-level imbalance of the shard plan)
# ---------------------------------------------------------------------------


@query(
    "q_shard_balance",
    oracle=f"""
WITH assigned AS (
  SELECT {MD5_32_SQL.format(expr="CONCAT('shard:', doc_id)")} % {N_SHARDS} AS shard_id,
         length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_tokens
  FROM documents
),
per AS (
  SELECT shard_id,
         CAST(COUNT(*) AS BIGINT)      AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY shard_id
)
SELECT shard_id, n_docs, n_tokens,
       CASE WHEN abs(CAST(n_tokens AS DOUBLE)
             / (SUM(n_tokens) OVER () / {N_SHARDS})) < 4.5e9 THEN floor((CAST(n_tokens AS DOUBLE)
             / (SUM(n_tokens) OVER () / {N_SHARDS})) * 1e6 + 0.5) / 1e6 ELSE (CAST(n_tokens AS DOUBLE)
             / (SUM(n_tokens) OVER () / {N_SHARDS})) END AS balance_ratio
FROM per
""",
)
def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit for the training-shard assignment
    (q_corpus_shards): per shard, doc and TOKEN counts plus each
    shard's token volume relative to the perfectly-even share — the
    check that the hash is balancing the unit that matters (a shard
    plan can be doc-balanced and still token-skewed when lengths are
    heavy-tailed, and the data-loader stalls on the fattest shard).
    One corpus scan; the window runs over the {N_SHARDS}-row shard
    table. Ratios far from 1.0 → shard on (doc, chunk) instead."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    from grader_etl_spark.operators.text_analysis import tokens

    assigned = docs.select(
        (md5_32(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))) % N_SHARDS).alias(
            "shard_id"
        ),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    per = assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    total = F.sum("n_tokens").over(Window.partitionBy())
    return per.select(
        "shard_id",
        "n_docs",
        "n_tokens",
        floor_quantize(F.col("n_tokens").cast("double") / (total / N_SHARDS), 6).alias(
            "balance_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# L65 — hashing-trick featurization (fixed-width sparse features)
# ---------------------------------------------------------------------------

FEATURE_DIM = 256


@query(
    "q_feature_hash",
    oracle=f"""
WITH feats AS (
  SELECT {MD5_32_SQL.format(expr="CONCAT('type=', coalesce(event_type, '~null~'))")} % {FEATURE_DIM} AS feature_idx,
         CASE WHEN ({MD5_32_SQL.format(expr="CONCAT('sign:type=', coalesce(event_type, '~null~'))")}) % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM events
  UNION ALL
  SELECT {MD5_32_SQL.format(expr="CONCAT('dow=', coalesce(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS VARCHAR), '~null~'))")} % {FEATURE_DIM},
         CASE WHEN ({MD5_32_SQL.format(expr="CONCAT('sign:dow=', coalesce(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS VARCHAR), '~null~'))")}) % 2 = 0
              THEN 1 ELSE -1 END
  FROM events
)
SELECT CAST(feature_idx AS BIGINT) AS feature_idx,
       CAST(SUM(sign) AS BIGINT)   AS weight,
       CAST(COUNT(*) AS BIGINT)    AS n_hits
FROM feats GROUP BY feature_idx
""",
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML 2009 — public):
    categorical features ('type=click', 'dow=3') map to a FIXED
    {FEATURE_DIM}-wide index space via the cross-engine md5_32 hash,
    with a second hash supplying the ±1 sign that keeps collision
    noise zero-mean. No vocabulary build, no fit step, no dictionary
    to ship — the featurizer a 100 TB training pipeline can run
    map-side on day one and NEVER re-fit as categories drift (new
    category = new hash, same width). Output here is the corpus-level
    feature activation profile (index, signed weight, hits); per-row
    feature vectors are the same expressions before the aggregate.
    Both feature families ride ONE scan via an in-plan explode, and
    the shuffle carries ≤{FEATURE_DIM} partial rows per task."""
    ev = load(spark, sf_dir, "events", columns=["event_type", "ts"])
    # one scan: both feature families assembled per row, one explode.
    # A NULL category is itself a (hashed) feature — coalesce to the
    # sentinel on BOTH engines; without it Spark NULLed the hash while
    # DuckDB's CONCAT silently swallowed the NULL (nulls fuzz shape).
    etype = F.coalesce(F.col("event_type"), F.lit("~null~"))
    # same sentinel for a NULL ts: without it a NULL day-of-week would
    # reproduce the event_type divergence (Spark concat NULLs the whole
    # hash input; DuckDB CONCAT skips the NULL arg)
    dow = F.coalesce(
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) % 7).cast("string"),
        F.lit("~null~"),
    )
    feats = ev.select(
        F.explode(
            F.array(
                F.struct(
                    (md5_32(F.concat(F.lit("type="), etype)) % FEATURE_DIM).alias("feature_idx"),
                    F.when(
                        md5_32(F.concat(F.lit("sign:type="), etype)) % 2 == 0, 1
                    ).otherwise(-1).alias("sign"),
                ),
                F.struct(
                    (md5_32(F.concat(F.lit("dow="), dow)) % FEATURE_DIM).alias("feature_idx"),
                    F.when(
                        md5_32(F.concat(F.lit("sign:dow="), dow)) % 2 == 0, 1
                    ).otherwise(-1).alias("sign"),
                ),
            )
        ).alias("f")
    ).select("f.feature_idx", "f.sign")
    return feats.groupBy(F.col("feature_idx").cast("long").alias("feature_idx")).agg(
        F.sum("sign").cast("long").alias("weight"),
        F.count(F.lit(1)).alias("n_hits"),
    )


# ---------------------------------------------------------------------------
# q_concat_chunks — GPT-style concat-and-chunk packing plan (L89)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 256  # fixed training-window length


@query(
    "q_concat_chunks",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         {MD5_32_SQL.format(expr="CONCAT('shard:', doc_id)")} % {N_SHARDS} AS shard_id,
         {MD5_32_SQL.format(expr="CONCAT('order:', doc_id)")}              AS sort_key,
         length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_toks
  FROM documents
),
o AS (
  SELECT *,
         CAST(COALESCE(SUM(n_toks) OVER (
           PARTITION BY shard_id ORDER BY sort_key, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
  FROM d
),
e AS (
  SELECT shard_id, doc_id, start_off, start_off + n_toks AS end_off,
         unnest(generate_series(start_off // {CHUNK_TOKENS},
                                (start_off + n_toks - 1) // {CHUNK_TOKENS})) AS chunk_id
  FROM o WHERE n_toks > 0
)
SELECT shard_id,
       chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST(end_off, (chunk_id + 1) * {CHUNK_TOKENS})
                - GREATEST(start_off, chunk_id * {CHUNK_TOKENS})) AS BIGINT) AS n_tokens,
       arg_min(doc_id, start_off) AS first_doc,
       arg_max(doc_id, start_off) AS last_doc
FROM e
GROUP BY shard_id, chunk_id
""",
)
def q_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing plan (the GPT-series recipe): shard
    the corpus, concatenate each shard's documents in its
    deterministic shuffle order, and cut fixed {CHUNK_TOKENS}-token
    training windows straight across document boundaries. The output
    is the chunk→document map a data loader needs: how many docs each
    window spans, its token fill (always {CHUNK_TOKENS} except each
    shard's final window), and the boundary documents.

    This is the zero-padding alternative to L33's per-group bin
    packing (q_pack_sequences): no packing decisions, no wasted
    slots, at the cost of split documents — exactly the trade-off the
    two operators let a pipeline owner measure against each other.

    Scale shape: offsets come from ONE window cumsum per SHARD (the
    same shard/order keys as q_corpus_shards, so chunking is
    consistent with the written layout) — never a global sort; a
    shard is the writer-parallelism unit, so the per-shard sort is
    the sort the writer pays anyway. The chunk-span explode emits
    n_toks/{CHUNK_TOKENS}+1 rows per doc (bounded by corpus token
    volume over the window length), and every column is integer
    arithmetic on the cross-engine hash order — the whole plan is
    hash-oracled. Reference parity: none (no training prep in the
    reference); north-star extension per BASELINE.json."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    d = docs.select(
        "doc_id",
        (md5_32(F.concat(F.lit("shard:"), F.col("doc_id"))) % N_SHARDS).alias("shard_id"),
        md5_32(F.concat(F.lit("order:"), F.col("doc_id"))).alias("sort_key"),
        F.size(F.split(F.trim("text"), WS_RE)).cast("long").alias("n_toks"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("sort_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = (
        d.withColumn("start_off", F.coalesce(F.sum("n_toks").over(w), F.lit(0)).cast("long"))
        .withColumn("end_off", F.col("start_off") + F.col("n_toks"))
        .filter(F.col("n_toks") > 0)
    )
    e = o.select(
        "shard_id",
        "doc_id",
        "start_off",
        "end_off",
        F.explode(
            F.sequence(
                F.expr(f"start_off div {CHUNK_TOKENS}"),
                F.expr(f"(end_off - 1) div {CHUNK_TOKENS}"),
            )
        ).alias("chunk_id"),
    )
    lo = F.greatest(F.col("start_off"), F.col("chunk_id") * CHUNK_TOKENS)
    hi = F.least(F.col("end_off"), (F.col("chunk_id") + 1) * CHUNK_TOKENS)
    return e.groupBy("shard_id", "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(hi - lo).cast("long").alias("n_tokens"),
        F.min_by("doc_id", "start_off").alias("first_doc"),
        F.max_by("doc_id", "start_off").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# q_mixture_apply — execute the rebalance the rates prescribe (L44b)
# ---------------------------------------------------------------------------


@query(
    "q_mixture_apply",
    oracle=f"""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS n_total, COUNT(*) AS n_sources FROM per_source),
rates AS (
  SELECT source, n_docs,
         CAST(FLOOR(LEAST(1.0, (CAST(n_total AS DOUBLE) / n_sources) / n_docs)
                    * 4294967296.0) AS BIGINT) AS keep_below
  FROM per_source CROSS JOIN tot
),
kept AS (
  SELECT d.source,
         COUNT(*) AS n_kept
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE {MD5_32_SQL.format(expr="CONCAT('mix:', doc_id)")} < r.keep_below
  GROUP BY d.source
)
SELECT r.source,
       CAST(r.n_docs AS BIGINT)             AS n_docs,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CASE WHEN abs(CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / r.n_docs) < 4.5e9 THEN floor((CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / r.n_docs) * 1e4 + 0.5) / 1e4 ELSE (CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / r.n_docs) END AS kept_frac
FROM rates r LEFT JOIN kept k ON r.source = k.source
""",
)
def q_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the mixture rebalance q_mixture_rates prescribes:
    per-source hash sampling at rate min(1, target/actual), applied
    as one integer comparison per document — md5_32('mix:'‖doc_id)
    against ⌊rate·2³²⌋. Both the threshold (one float product of
    identical doubles, floored to an integer) and the comparison are
    engine-deterministic, so the SAME documents survive in Spark, in
    the oracle, on every rerun, and under any partitioning — the
    property that makes the rebalance auditable and the corpus
    version-hashable (plans/release.py). The rates table is
    |sources|-row and broadcasts onto the corpus scan; the decision
    is map-side; the audit output is one partial-agg per source
    showing achieved vs prescribed keep fraction."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "source"])
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    rates = per_source.select(
        "source",
        "n_docs",
        F.floor(
            F.least(
                F.lit(1.0),
                (F.sum("n_docs").over(w).cast("double") / F.count(F.lit(1)).over(w))
                / F.col("n_docs"),
            )
            * F.lit(4294967296.0)
        ).cast("long").alias("keep_below"),
    )
    h = md5_32(F.concat(F.lit("mix:"), F.col("doc_id")))
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(h < F.col("keep_below"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            floor_quantize(
                F.coalesce(F.col("n_kept"), F.lit(0)).cast("double") / F.col("n_docs"), 4).alias("kept_frac"),
        )
    )
