"""Corpus selection & release operators: DSIR importance selection,
duplicated-span detection, Wilson-bound source ranking, and
differentially-private release counts.

These extend the LLM-data-pipeline family (SURVEY.md §2.9) with the
selection half of curation: the existing filters decide what is
*junk*; these decide what is *valuable* (DSIR), what is *partially
copied* (duplicate spans, the per-document view that complements the
whole-doc near-dup family in llm_dedup.py), which *sources* to trust
(Wilson lower bound), and how to *publish* corpus statistics without
leaking membership (DP counts).

Reference parity: the reference has no analogs (it is a 456-line
ingest/report script, /root/reference/main.py:1-456); these are the
north-star pipeline extensions BASELINE.json mandates.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.functions.hashing import MD5_32_SQL, md5_32
from grader_etl_spark.io import fan_out, load, valid_vectors, VALID_EMBEDDINGS_SQL
from grader_etl_spark.registry import checkpoint_frame, query
from grader_etl_spark.functions.quantize import floor_quantize
from grader_etl_spark.functions.textnorm import WS_RE, norm_lower

MMR_K = 10          # final diverse picks
MMR_C = 50          # bounded candidate pool (top-C by relevance)
MMR_QUERY_ID = 0    # the query vector
MMR_LAMBDA = 0.7    # relevance weight; 1-λ penalizes redundancy

# ---------------------------------------------------------------------------
# q_dsir_select — data selection via importance resampling (unigram proxy)
# ---------------------------------------------------------------------------


@query(
    "q_dsir_select",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
model AS (
  SELECT term,
         CAST(count(*) AS DOUBLE) AS cr,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS ct
  FROM toks GROUP BY term
),
tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt, CAST(count(*) AS DOUBLE) AS v FROM model)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       CASE WHEN abs(sum(tf * (ln((ct + 1.0) / (nt + v)) - ln((cr + 1.0) / (nr + v))))
             / sum(tf)) < 4.5e9 THEN floor((sum(tf * (ln((ct + 1.0) / (nt + v)) - ln((cr + 1.0) / (nr + v))))
             / sum(tf)) * 1e4 + 0.5) / 1e4 ELSE (sum(tf * (ln((ct + 1.0) / (nt + v)) - ln((cr + 1.0) / (nr + v))))
             / sum(tf)) END AS dsir_weight
FROM tf JOIN model USING (term) CROSS JOIN tot
GROUP BY doc_id
ORDER BY dsir_weight DESC, doc_id
LIMIT 100
""",
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by its mean per-token log importance ratio between a
    *target* unigram model (here the English subset stands in for the
    curated target corpus) and the *raw* corpus model, both
    Laplace-smoothed over the joint vocabulary, and keep the top 100.
    Docs that look like the target score high; off-target docs score
    negative.

    Scale shape: one tokenize pass → (doc,term) counts; both models
    live in ONE vocab-sized table (raw count + conditional target
    count computed in the same partial aggregate — one shuffle, not
    two) that broadcasts back onto the term frequencies; the three
    totals ride a 1-row broadcast. The per-doc score is a single
    grouped sum rounded 4 dp against summation-order ulps (the
    q_unigram_logprob precedent), and the top-100 is
    TakeOrderedAndProject — per-partition heaps, no global sort. At
    100 TB the only corpus-sized shuffles are the two doc/term-keyed
    partial aggregates; the production variant swaps the in-query
    target model for a trained one (hashed n-gram buckets), keeping
    the join shape identical."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "lang", "text"])
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    model = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double").alias("ct"),
    )
    tot = model.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt"), F.count(F.lit(1)).cast("double").alias("v")
    )
    ratio = F.log((F.col("ct") + 1.0) / (F.col("nt") + F.col("v"))) - F.log(
        (F.col("cr") + 1.0) / (F.col("nr") + F.col("v"))
    )
    return (
        tf.join(F.broadcast(model), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            floor_quantize(F.sum(F.col("tf") * ratio) / F.sum("tf"), 4).alias("dsir_weight"),
        )
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q_dup_span — per-document duplicated-span profile (exact-substring view)
# ---------------------------------------------------------------------------


@query(
    "q_dup_span",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
),
sh AS (
  SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+4], ' ')) AS h
  FROM toks, unnest(range(1, len(t) - 3)) AS r(i)
  WHERE len(t) >= 5
),
dup AS (SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
hits AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM sh JOIN dup USING (h)
),
runs AS (SELECT doc_id, grp, count(*) AS run FROM hits GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(run) AS BIGINT) AS n_dup_shingles,
       CAST(max(run) + 4 AS BIGINT) AS max_dup_token_span
FROM runs GROUP BY doc_id
""",
)
def q_dup_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-SPAN profile — the bounded, SQL-exact
    core of exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every document,
    how many of its 5-token shingles also occur in some other
    document, and the longest run of consecutive duplicated shingles
    (a run of R shingles = a copied span of R+4 tokens). Whole-doc
    near-dup (llm_dedup.py) misses a unique article that embeds a
    copied boilerplate paragraph; this operator is the per-position
    view that catches it, and its output feeds q_chunk_dedup_rewrite
    style span-trimming.

    Scale shape: shingles shuffle as 16-byte md5 keys, never text
    (the same trick q_dedup_exact_docs uses for whole docs); the
    dup-shingle set comes from one count-distinct-docs partial
    aggregate and joins back position-side. Run detection is the
    classic islands trick — pos − row_number() per doc — riding a
    doc_id-partitioned window, then two doc-keyed partial aggregates.
    No all-pairs comparison anywhere: cost is linear in total shingle
    positions, exactly the inverted-index bound documented for
    q_neardup_jaccard. The scan is fan_out-scattered before the
    shingle+md5 kernel (the per-position md5 is the cost center; one
    parquet split would pin it to a single task — measured 3.3× at
    sf0.1). The kernel is evaluated by both the dup-set aggregate and
    the position probe; both sides exchange on h, so the shuffle
    reuse, not a checkpoint, is the intended dedup of that work
    (measured: checkpointing the shingle frame adds time here)."""
    docs = fan_out(load(spark, sf_dir, "documents", columns=["doc_id", "text"]))
    toks = docs.select(
        "doc_id", F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0).alias("t")
    ).filter(F.size("t") >= 5)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 4), i -> struct(i AS pos, md5(array_join(slice(t, i, 5), ' ')) AS h))")
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    dup = sh.groupBy("h").agg(F.count_distinct("doc_id").alias("nd")).filter(F.col("nd") >= 2).select("h")
    hits = sh.join(dup, "h").withColumn(
        "grp", F.col("pos") - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos"))
    )
    runs = hits.groupBy("doc_id", "grp").agg(F.count(F.lit(1)).alias("run"))
    return runs.groupBy("doc_id").agg(
        F.sum("run").cast("long").alias("n_dup_shingles"),
        (F.max("run") + F.lit(4)).cast("long").alias("max_dup_token_span"),
    )


# ---------------------------------------------------------------------------
# q_wilson_quality — Wilson lower-bound source quality ranking
# ---------------------------------------------------------------------------


@query(
    "q_wilson_quality",
    oracle="""
WITH cells AS (
  SELECT lang, source,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN n_chars >= 280 THEN 1 ELSE 0 END) AS DOUBLE) AS k
  FROM documents GROUP BY 1, 2
)
SELECT lang, source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(k AS BIGINT) AS n_good,
       CASE WHEN abs(((k / n) + 1.9208 / n
              - 1.96 * sqrt(((k / n) * (1.0 - (k / n)) + 0.9604 / n) / n))
             / (1.0 + 3.8416 / n)) < 4.5e9 THEN floor((((k / n) + 1.9208 / n
              - 1.96 * sqrt(((k / n) * (1.0 - (k / n)) + 0.9604 / n) / n))
             / (1.0 + 3.8416 / n)) * 1e6 + 0.5) / 1e6 ELSE (((k / n) + 1.9208 / n
              - 1.96 * sqrt(((k / n) * (1.0 - (k / n)) + 0.9604 / n) / n))
             / (1.0 + 3.8416 / n)) END AS wilson_lb
FROM cells
""",
)
def q_wilson_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) quality score as the Wilson lower confidence
    bound (95%) on the proportion of good documents (n_chars ≥ 280, a
    stand-in for any boolean quality gate). The Wilson bound is the
    right source-ranking statistic because it shrinks small samples
    toward zero: a source with 2/2 good docs ranks below one with
    180/200 — exactly the behavior a crawl-source allowlist needs.

    Exactness note: the formula uses only +,−,×,÷,√ — all correctly
    rounded under IEEE-754 — written with identical association on
    both engines (z=1.96 folded to literals: z²=3.8416, z²/2=1.9208,
    z²/4=0.9604), so the pre-rounding doubles are bit-equal; the 6 dp
    round is belt-and-braces. Scale shape: one partial-aggregating
    groupBy over integer counts; the float algebra runs on the
    |lang×source| result rows only."""
    docs = load(spark, sf_dir, "documents", columns=["lang", "source", "n_chars"])
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("n_chars") >= 280, 1).otherwise(0)).cast("double").alias("k"),
    )
    p = F.col("k") / F.col("n")
    n = F.col("n")
    wilson = (p + 1.9208 / n - 1.96 * F.sqrt((p * (1.0 - p) + 0.9604 / n) / n)) / (
        1.0 + 3.8416 / n
    )
    return cells.select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("k").cast("long").alias("n_good"),
        floor_quantize(wilson, 6).alias("wilson_lb"),
    )


# ---------------------------------------------------------------------------
# q_dp_counts — ε-differentially-private corpus release counts
# ---------------------------------------------------------------------------

# Two-sided geometric mechanism, ε = 1 (α = e^-ε): P(K = k) ∝ α^|k|,
# truncated at |k| ≤ 12 (tail mass < 1e-5). The inverse-CDF thresholds
# are computed ONCE here in Python and embedded as 8-hex-char string
# literals in BOTH the Spark plan and the DuckDB oracle, so neither
# engine evaluates a transcendental at query time — the noise lookup
# is fixed-width lowercase-hex string compares (lexicographic ==
# numeric) on the md5-derived uniform, identical across engines by
# construction (the q_train_split hex-threshold idiom).
_DP_ALPHA = math.exp(-1.0)


def _dp_thresholds() -> list[tuple[int, str]]:
    ks = list(range(-12, 13))
    mass = [(1 - _DP_ALPHA) / (1 + _DP_ALPHA) * _DP_ALPHA ** abs(k) for k in ks]
    total = sum(mass)
    out, cum = [], 0.0
    for k, m in zip(ks, mass):
        cum += m / total
        out.append((k, format(min(int(cum * 2**32), 2**32 - 1), "08x")))
    out[-1] = (ks[-1], "g")  # 'g' > any hex char: guaranteed catch-all
    return out


_DP_TABLE = _dp_thresholds()

# NULL cells still get real noise: seed on COALESCE'd names (Spark's
# concat_ws would silently SKIP a NULL while SQL's || nulls the whole
# seed — the nulls fuzz shape caught the disagreement).
_DP_U_SQL = (
    "substr(md5(coalesce(lang, '~null~') || '|' || "
    "coalesce(source, '~null~') || '|dp-salt-7'), 1, 8)"
)
_DP_CASE_SQL = "CASE " + " ".join(
    f"WHEN {_DP_U_SQL} < '{t}' THEN {k}" for k, t in _DP_TABLE
) + " END"


@query(
    "q_dp_counts",
    oracle=f"""
WITH cells AS (SELECT lang, source, count(*) AS n_true FROM documents GROUP BY 1, 2)
SELECT lang, source, CAST(n_true AS BIGINT) AS n_true,
       CAST({_DP_CASE_SQL} AS BIGINT) AS noise,
       CAST(greatest(n_true + {_DP_CASE_SQL}, 0) AS BIGINT) AS n_released
FROM cells
""",
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private corpus statistics release (ε = 1):
    per-(lang, source) document counts perturbed by the two-sided
    geometric mechanism — the discrete Laplace analog that is the
    standard mechanism for integer count queries (sensitivity 1).
    This is what a responsible corpus card publishes instead of raw
    counts when sources map to identifiable contributors.

    Determinism across engines: the per-cell uniform comes from the
    first 8 hex chars of md5(cell ‖ salt) (the q_sample_hash
    pattern), and the inverse CDF is a precomputed 25-branch integer
    CASE table generated once in Python — no runtime transcendentals,
    so Spark and DuckDB agree bit-for-bit. (A production release
    would draw real randomness; the hash-seeded twin exists so the
    mechanism's plumbing is oracle-testable.) Scale shape: integer
    partial-aggregating groupBy; noise is O(1) per released cell."""
    docs = load(spark, sf_dir, "documents", columns=["lang", "source"])
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_true"))
    u = F.substring(
        F.md5(
            F.concat_ws(
                "|",
                F.coalesce("lang", F.lit("~null~")),
                F.coalesce("source", F.lit("~null~")),
                F.lit("dp-salt-7"),
            )
        ),
        1,
        8,
    )
    expr = F.when(u < _DP_TABLE[0][1], F.lit(_DP_TABLE[0][0]))
    for k, t in _DP_TABLE[1:]:
        expr = expr.when(u < t, F.lit(k))
    noised = cells.withColumn("noise", expr.cast("long"))
    return noised.select(
        "lang",
        "source",
        F.col("n_true").cast("long").alias("n_true"),
        "noise",
        F.greatest(F.col("n_true") + F.col("noise"), F.lit(0)).cast("long").alias("n_released"),
    )


# ---------------------------------------------------------------------------
# q_mmr_select — maximal-marginal-relevance diverse selection
# ---------------------------------------------------------------------------


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as materialized CTEs (the _pr_oracle /
    shortest-paths precedent for iterative algorithms): step i picks
    the argmax of λ·rel − (1−λ)·max-sim-to-selected over the remaining
    candidates. Cosines use list_dot_product — bit-compatible with the
    Spark sequential fold (llm_dedup.cosine)."""
    cos = (
        "list_dot_product({a}.v, {b}.v) / "
        "(sqrt(list_dot_product({a}.v, {a}.v)) * sqrt(list_dot_product({b}.v, {b}.v)))"
    )
    parts = [
        f"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {VALID_EMBEDDINGS_SQL}),",
        f"qv AS (SELECT v FROM e WHERE vec_id = {MMR_QUERY_ID}),",
        "cand AS MATERIALIZED (",
        f"  SELECT c.vec_id, c.v, {cos.format(a='qv', b='c')} AS rel",
        # zero-norm candidates have NULL rel — no direction, not
        # rankable; excluded on both sides (degenerate-embedding probe)
        f"  FROM e c, qv WHERE c.vec_id != {MMR_QUERY_ID} AND {cos.format(a='qv', b='c')} IS NOT NULL",
        f"  ORDER BY rel DESC NULLS LAST, c.vec_id LIMIT {MMR_C}),",
        "pairs AS MATERIALIZED (",
        f"  SELECT a.vec_id AS ida, b.vec_id AS idb, {cos.format(a='a', b='b')} AS sim",
        "  FROM cand a JOIN cand b ON a.vec_id != b.vec_id),",
        "s1 AS MATERIALIZED (SELECT vec_id, rel AS score FROM cand ORDER BY rel DESC NULLS LAST, vec_id LIMIT 1),",
        "sel1 AS MATERIALIZED (SELECT vec_id FROM s1),",
    ]
    for i in range(2, MMR_K + 1):
        parts += [
            f"s{i} AS MATERIALIZED (",
            f"  SELECT c.vec_id, {MMR_LAMBDA} * c.rel - {round(1 - MMR_LAMBDA, 10)} * max(p.sim) AS score",
            "  FROM cand c JOIN pairs p ON p.ida = c.vec_id",
            f"    AND p.idb IN (SELECT vec_id FROM sel{i - 1})",
            f"  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})",
            "  GROUP BY c.vec_id, c.rel ORDER BY score DESC NULLS LAST, c.vec_id LIMIT 1),",
            f"sel{i} AS MATERIALIZED (SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM s{i}),",
        ]
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, score AS mmr_score FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    return "\n".join(parts)[:-1] + f"\n{selects}"


@query("q_mmr_select", oracle=_mmr_oracle())
def q_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance (Carbonell & Goldstein 1998) diverse
    top-k: pick MMR_K vectors that are relevant to the query vector
    but not redundant with each other — the selection step of RAG
    retrieval and of diverse few-shot example picking, and the
    row-level complement of SemDeDup (which removes redundancy;
    MMR *budgets* it against relevance).

    Scale shape — the standard two-phase rerank: phase 1 is
    DISTRIBUTED candidate generation, exact cosine top-C via
    TakeOrderedAndProject per-partition heaps (C=50 bounds all later
    work; at 100 TB this phase rides q_ann_ivf's cell pruning
    instead of brute force — same contract, top-C candidates). Phase
    2 computes the C×C pairwise-similarity matrix ONCE (bounded:
    2450 rows), then runs the inherently-sequential greedy argmax as
    MMR_K tiny jobs over that checkpointed frame, collecting one
    (id, score) row per round — the bounded driver-scalar pattern of
    kmeans/graph convergence, never a corpus-sized collect. Cosines
    are sequential left-to-right folds (llm_dedup.cosine), bit-equal
    with the oracle's list_dot_product, so the greedy argmax cannot
    diverge between engines; ties break on vec_id both sides."""
    from grader_etl_spark.operators.llm_dedup import cosine

    e = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    qv = e.filter(F.col("vec_id") == MMR_QUERY_ID).select(F.col("v").alias("qv"))
    cand = (
        e.filter(F.col("vec_id") != MMR_QUERY_ID)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "v", cosine(F.col("qv"), F.col("v")).alias("rel"))
        .filter(F.col("rel").isNotNull())
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_C)
    )
    cand = checkpoint_frame(cand)
    a, b = cand.alias("a"), cand.alias("b")
    pair_rows = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ida"),
            F.col("b.vec_id").alias("idb"),
            cosine(F.col("a.v"), F.col("b.v")).alias("sim"),
        )
        .collect()
    )
    # The greedy itself runs driver-side on the BOUNDED collected
    # matrix (C² = 2450 rows — the k×dim-centroid collect precedent):
    # running it as MMR_K tiny Spark jobs measured ~10×0.25 s of pure
    # job-scheduling overhead on frames this small. The arithmetic is
    # the same IEEE ops on the same Spark-computed doubles (λ·rel −
    # (1−λ)·max sim), so the oracle argmax cannot diverge.
    rel = {r["vec_id"]: r["rel"] for r in cand.select("vec_id", "rel").collect()}
    sim: dict[int, dict[int, float]] = {}
    for r in pair_rows:
        sim.setdefault(r["ida"], {})[r["idb"]] = r["sim"]
    schema = "rank long, vec_id long, mmr_score double"
    # Short/empty candidate pools pick what exists and stop — the
    # oracle's unrolled steps each select from the same shrinking set
    # and go empty at the same point (empty fuzz shape).
    if not rel:
        return spark.createDataFrame([], schema)
    first_id = min(rel, key=lambda k: (-rel[k], k))
    picked: list[tuple[int, int, float]] = [(1, first_id, rel[first_id])]
    lam, mu = MMR_LAMBDA, round(1 - MMR_LAMBDA, 10)
    for i in range(2, min(MMR_K, len(rel)) + 1):
        sel_ids = [p[1] for p in picked]
        best = min(
            (
                (-(lam * rel[k] - mu * max(sim[k][s] for s in sel_ids)), k)
                for k in rel
                if k not in sel_ids
            )
        )
        picked.append((i, best[1], -best[0]))
    return spark.createDataFrame(picked, schema)


# ---------------------------------------------------------------------------
# q_quality_budget_curve — tokens retained at each quality cutoff
# ---------------------------------------------------------------------------


@query(
    "q_quality_budget_curve",
    oracle="""
WITH feats AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_toks,
         len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, n_toks, score,
         ntile(10) OVER (ORDER BY score DESC, doc_id) AS decile
  FROM feats
),
per AS (
  SELECT decile,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS decile_tokens
  FROM ranked GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile, n_docs, decile_tokens,
       CAST(sum(decile_tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens,
       CASE WHEN abs(CAST(sum(decile_tokens) OVER (ORDER BY decile) AS DOUBLE)
             / sum(decile_tokens) OVER ()) < 4.5e9 THEN floor((CAST(sum(decile_tokens) OVER (ORDER BY decile) AS DOUBLE)
             / sum(decile_tokens) OVER ()) * 1e6 + 0.5) / 1e6 ELSE (CAST(sum(decile_tokens) OVER (ORDER BY decile) AS DOUBLE)
             / sum(decile_tokens) OVER ()) END AS cum_share
FROM per ORDER BY decile
""",
)
def q_quality_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection BUDGET curve: rank documents by a quality proxy
    (vocabulary richness — distinct token count), cut into deciles,
    and report how many tokens survive at each cutoff. This is the
    chart every data-budget negotiation needs: "keeping the top 30%
    by quality keeps X% of tokens" — the empirical supply curve that
    q_mixture_waterfill's budget and q_dsir_select's top-N consume.

    Determinism & scale: the ranking order is total (score desc,
    doc_id), so NTILE deciles are reproducible; all sums are integer
    token counts; the cumulative and share windows run over the
    10-row decile frame — free at any corpus size. The corpus-wide
    NTILE is the one global sort; at 100 TB the documented swap-in is
    approx-percentile score cutoffs (the q_equidepth_histogram scale
    path), which turns the sort into one pass + broadcast
    thresholds."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)
    feats = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("score"),
    )
    ranked = feats.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(F.desc("score"), "doc_id"))
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("decile_tokens"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return per.select(
        F.col("decile").cast("long").alias("decile"),
        "n_docs",
        "decile_tokens",
        F.sum("decile_tokens").over(w_cum).cast("long").alias("cum_tokens"),
        floor_quantize(
            F.sum("decile_tokens").over(w_cum).cast("double")
            / F.sum("decile_tokens").over(w_all), 6).alias("cum_share"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# q_corpus_datasheet — one-row dataset card statistics
# ---------------------------------------------------------------------------


@query(
    "q_corpus_datasheet",
    oracle="""
WITH feats AS (
  SELECT doc_id, lang, source,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_toks,
         md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS fp
  FROM documents
),
docstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_docs
  FROM feats
),
vocab AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS vocab_size
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term FROM documents)
)
SELECT n_docs, n_langs, n_sources, n_tokens, vocab_size, n_unique_docs,
       CASE WHEN abs(1.0 - CAST(n_unique_docs AS DOUBLE) / n_docs) < 4.5e9 THEN floor((1.0 - CAST(n_unique_docs AS DOUBLE) / n_docs) * 1e6 + 0.5) / 1e6 ELSE (1.0 - CAST(n_unique_docs AS DOUBLE) / n_docs) END AS dup_rate,
       CASE WHEN abs(CAST(n_tokens AS DOUBLE) / n_docs) < 4.5e9 THEN floor((CAST(n_tokens AS DOUBLE) / n_docs) * 1e2 + 0.5) / 1e2 ELSE (CAST(n_tokens AS DOUBLE) / n_docs) END AS mean_doc_tokens
FROM docstats CROSS JOIN vocab
""",
)
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row DATASET CARD (Datasheets for Datasets, Gebru et
    al. 2021): corpus size, language/source breadth, token volume,
    vocabulary size, exact-duplicate rate (whitespace/case-normalized
    md5 fingerprints — q_doc_fingerprint's normalization), and mean
    document length. This is the summary block a corpus release ships
    next to q_dp_counts' privatized per-cell table.

    Scale shape: one doc-level pass computes every count except
    vocabulary (count-distinct over fingerprints and dims
    partial-aggregates; at extreme cardinality the documented swap is
    approx_count_distinct / the HLL sketch path); the vocabulary size
    is one explode + distinct keyed on the term. Both land on 1-row
    frames cross-joined via broadcast — nothing downstream of the
    scans exceeds one row."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "lang", "source", "text"])
    toks = F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)
    feats = docs.select(
        "lang",
        "source",
        F.size(toks).cast("long").alias("n_toks"),
        F.md5(F.regexp_replace(norm_lower("text"), WS_RE, " ")).alias("fp"),
    )
    docstats = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.count_distinct("fp").cast("long").alias("n_unique_docs"),
    )
    vocab = (
        docs.select(F.explode(toks).alias("term"))
        .agg(F.count_distinct("term").cast("long").alias("vocab_size"))
    )
    return docstats.crossJoin(F.broadcast(vocab)).select(
        "n_docs",
        "n_langs",
        "n_sources",
        "n_tokens",
        "vocab_size",
        "n_unique_docs",
        # try_divide: an EMPTY corpus's datasheet row still emits, with
        # NULL ratios — ANSI Spark throws on /0 where DuckDB yields
        # NULL (empty fuzz shape).
        floor_quantize(
            1.0 - F.try_divide(F.col("n_unique_docs").cast("double"), F.col("n_docs")), 6
        ).alias("dup_rate"),
        floor_quantize(
            F.try_divide(F.col("n_tokens").cast("double"), F.col("n_docs")), 2
        ).alias("mean_doc_tokens"),
    )


# ---------------------------------------------------------------------------
# q_quality_classifier — hashed-feature linear quality model (fastText shape)
# ---------------------------------------------------------------------------

# Hashed feature space and integer weight range. The weights here are
# hash-derived STAND-INS for a trained model (this container trains
# nothing), but every piece of the serving plan is the production
# shape: hashing-trick features (no vocabulary state), an integer
# dot product, one sigmoid at the end. Swapping in real trained
# weights replaces one expression (or one broadcast |D|-row weight
# table join) and changes nothing else.
QC_DIM = 512          # feature buckets
QC_WEIGHT_RANGE = 1024  # w(b) ∈ [-512, 511]
QC_LOGIT_SCALE = 4096   # dyadic logit divisor (z/2^12 is float-exact)


def quality_logit(text):
    """The shared scorer expression: integer logit of the hashed-
    feature linear model over whitespace tokens — one codegen'd
    aggregate fold, usable identically in batch queries and
    Structured Streaming projections (stateless, so it is
    streaming-safe by construction)."""
    toks = F.split(F.trim(text), WS_RE)

    def weight(term):
        bucket = (md5_32(F.concat(F.lit("f:"), term)) % QC_DIM).cast("string")
        return md5_32(F.concat(F.lit("w:"), bucket)) % QC_WEIGHT_RANGE - QC_WEIGHT_RANGE // 2

    return F.aggregate(
        F.transform(toks, weight), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


@query(
    "q_quality_classifier",
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS term
  FROM documents
),
z AS (
  SELECT doc_id,
         CAST(SUM(
           ({MD5_32_SQL.format(expr=f"'w:' || CAST(({MD5_32_SQL.format(expr=chr(39) + 'f:' + chr(39) + ' || term')}) % {QC_DIM} AS VARCHAR)")}) % {QC_WEIGHT_RANGE} - {QC_WEIGHT_RANGE // 2}
         ) AS BIGINT) AS logit_int
  FROM t GROUP BY doc_id
)
SELECT d.doc_id,
       z.logit_int,
       CASE WHEN abs(1.0 / (1.0 + EXP(-z.logit_int / {QC_LOGIT_SCALE}.0))) < 4.5e9 THEN floor((1.0 / (1.0 + EXP(-z.logit_int / {QC_LOGIT_SCALE}.0))) * 1e4 + 0.5) / 1e4 ELSE (1.0 / (1.0 + EXP(-z.logit_int / {QC_LOGIT_SCALE}.0))) END AS score,
       z.logit_int > 0 AS keep
FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id
""",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based document quality gate in the fastText/CCNet shape
    (Joulin et al. 2017; Wenzek et al. 2020): hashing-trick bag-of-
    words features → linear logit → sigmoid score → keep flag.

    The entire scorer is ONE codegen'd projection with ZERO shuffle
    and zero Python: per token, bucket = md5_32('f:'‖term) mod {QC_DIM}
    and weight w = md5_32('w:'‖bucket) mod {QC_WEIGHT_RANGE} − {QC_WEIGHT_RANGE // 2};
    the logit is an integer F.aggregate fold over the token array
    (order-independent by construction), so the gate decision
    (logit > 0) is bit-deterministic across engines, partitionings,
    and retries. Only the displayed sigmoid touches floating point:
    z/2^12 is dyadic-exact, one EXP per doc, rounded 4 dp (the BM25
    libm-ulp discipline).

    At 100 TB this is the cheapest possible model gate: map-side over
    the corpus scan, no vocabulary state (hashing trick — Weinberger
    et al. 2009, same discipline as q_feature_hash), weights either
    inlined (here) or a broadcast {QC_DIM}-row table for a real
    trained model. Reference parity: generalizes the reference's
    boolean validity gate (/root/reference/main.py:141-166) from
    field checks to learned content scoring.

    NULL contract (nulls fuzz shape): a NULL-text doc keeps its row
    with NULL logit/score/keep — unknown, not junk — matching the
    doc family's NULL-propagation discipline; the oracle LEFT JOINs
    the token aggregate back to documents for the same shape."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return (
        docs.withColumn("logit_int", quality_logit(F.col("text")))
        .select(
            "doc_id",
            "logit_int",
            floor_quantize(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.col("logit_int") / F.lit(float(QC_LOGIT_SCALE)))), 4).alias("score"),
            (F.col("logit_int") > 0).alias("keep"),
        )
    )
