"""Corpus-filtering operators — the safety/decontamination/mixing
layer of an LLM training-data pipeline (north star in BASELINE.json;
no reference equivalent — the reference's only filtering is the
row-validation gate at main.py:146-163).

Everything here is map-dominant on purpose: PII scrubbing, weighted
sampling, and per-document scoring are pure column algebra (zero
shuffle), and the one join in decontamination is against a broadcast
benchmark set — the shapes that stay linear at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize
from grader_etl_spark.functions.textnorm import norm_lower

# ---------------------------------------------------------------------------
# q_pii_redact — regex PII detection + redaction
# ---------------------------------------------------------------------------

# Patterns kept to the Java-regex ∩ RE2 common dialect so Spark and
# DuckDB match identical spans.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"

# The synthetic documents contain no PII, so each doc is deterministically
# augmented with one email, one IP, and one phone derived from doc_id —
# the detector then provably fires on every row.
_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com on '"
    " || '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 call 555-867-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _augmented(doc_id: F.Column, text: F.Column) -> F.Column:
    """Spark twin of _AUG_SQL (Spark spells the cast STRING, not VARCHAR)."""
    return F.concat(
        text,
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@mail.example.com on 10.0."),
        (doc_id % 256).cast("string"),
        F.lit(".7 call 555-867-"),
        F.lpad((doc_id % 10000).cast("string"), 4, "0"),
    )


@query(
    "q_pii_redact",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_AUG_SQL} AS full_text FROM documents)
SELECT doc_id,
       CAST(length(regexp_extract_all(full_text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(length(regexp_extract_all(full_text, '{_IPV4_RE}'))  AS BIGINT) AS n_ips,
       CAST(length(regexp_extract_all(full_text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(full_text,
             '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_IPV4_RE}', '<IP>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: count and redact emails / IPv4s / phone numbers
    with anchored-order regexp_replace chains (email first so its
    dotted host can't be half-eaten by the IP pattern). Pure codegen'd
    column algebra, map-only, no shuffle — the shape a 100 TB scrub
    must have; swapping in richer patterns (or an NER pandas-UDF) is a
    local change. Output carries the md5 of the redacted text so the
    oracle pins the exact rewritten bytes, not just the counts."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    full = _augmented(F.col("doc_id"), F.col("text"))
    redacted = full
    for pat, tag in ((_EMAIL_RE, "<EMAIL>"), (_IPV4_RE, "<IP>"), (_PHONE_RE, "<PHONE>")):
        redacted = F.regexp_replace(redacted, pat, tag)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(full, F.lit(_EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(full, F.lit(_IPV4_RE), 0)).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(full, F.lit(_PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# q_decontaminate — benchmark n-gram overlap flagging
# ---------------------------------------------------------------------------

DECON_N = 5  # words per contamination n-gram (GPT-3 used 13; fixture docs are short)


@query(
    "q_decontaminate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+') AS w FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - {DECON_N - 1}, 0) + 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
         ))) AS gram
  FROM toks
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
hits AS (
  SELECT g.doc_id, count(*) AS n_hits
  FROM grams g JOIN bench USING (gram)
  WHERE g.doc_id % 20 <> 0
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated_ngrams,
       COALESCE(h.n_hits, 0) > 0             AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 20 <> 0
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    {DECON_N}-word n-gram with a held-out benchmark set (here: every
    20th doc stands in for the eval suite). The benchmark's distinct
    gram set is broadcast — eval suites are MBs against a 100 TB
    corpus, so the corpus side never shuffles: explode, broadcast-hash
    probe, partial-agg the hit counts per doc. Grams are distinct per
    doc on both sides, so n_contaminated_ngrams counts distinct shared
    grams."""
    from grader_etl_spark.operators.llm_dedup import shingles

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    grams = docs.select("doc_id", F.explode(shingles(F.col("text"), k=DECON_N)).alias("gram"))
    bench = grams.filter(F.col("doc_id") % 20 == 0).select("gram").distinct()
    corpus = docs.filter(F.col("doc_id") % 20 != 0).select("doc_id")
    hits = (
        grams.filter(F.col("doc_id") % 20 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return corpus.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_contaminated_ngrams"),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# q_sample_weighted — quality-weighted deterministic sampling
# ---------------------------------------------------------------------------


@query(
    "q_sample_weighted",
    oracle="""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         least(1.0, CAST(n_chars AS DOUBLE) / 400.0) AS keep_p
  FROM documents
)
SELECT doc_id, source, n_chars, CASE WHEN abs(keep_p) < 4.5e9 THEN floor((keep_p) * 1e4 + 0.5) / 1e4 ELSE (keep_p) END AS keep_p
FROM scored
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      <= lower(lpad(to_hex(CAST(floor(keep_p * 4294967295) AS BIGINT)), 8, '0'))
""",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: each doc is kept with
    probability proportional to a quality proxy (length capped at 1.0)
    by comparing its md5 fraction against the per-row threshold — both
    rendered as 8-hex-char strings, which compare in value order. Like
    q_sample_hash this is a pure map-side predicate: reproducible
    under repartitioning/retries (what seeded sample() isn't), zero
    shuffle, and the acceptance ratio tracks the weight — the
    importance-sampling primitive for mixing high/low-quality sources
    into a training corpus."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    keep_p = F.least(F.lit(1.0), F.col("n_chars").cast("double") / 400.0)
    thresh = F.lower(
        F.lpad(F.hex(F.floor(keep_p * F.lit(4294967295.0)).cast("long")), 8, "0")
    )
    frac = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return (
        docs.withColumn("keep_p", keep_p)
        .filter(frac <= thresh)
        .select("doc_id", "source", "n_chars", floor_quantize("keep_p", 4).alias("keep_p"))
    )


# ---------------------------------------------------------------------------
# q_bm25 — BM25 relevance scoring for a fixed query
# ---------------------------------------------------------------------------

BM25_TERMS = ("merge", "window", "stream")
BM25_K1 = 1.2
BM25_B = 0.75


@query(
    "q_bm25",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({", ".join(repr(t) for t in BM25_TERMS)})
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT t.doc_id, t.term, t.tf, f.df,
       CASE WHEN abs(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         * (t.tf * ({BM25_K1} + 1.0))
         / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))) < 4.5e9 THEN floor((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         * (t.tf * ({BM25_K1} + 1.0))
         / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))) * 1e4 + 0.5) / 1e4 ELSE (ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         * (t.tf * ({BM25_K1} + 1.0))
         / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))) END AS bm25
FROM tf t
JOIN dfreq f USING (term)
JOIN dl d ON t.doc_id = d.doc_id
CROSS JOIN stats s
""",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scoring of every document against a fixed query-term set —
    the retrieval/quality-ranking twin of q_tfidf_keywords. One
    explode pass feeds both per-doc lengths and per-(doc,term) counts;
    corpus stats (N, avgdl) ride a 1-row broadcast; document frequency
    is a terms-sized broadcast. The corpus-side frame never shuffles
    more than its partial (doc,term) counts. Scores rounded to 4 dp —
    the ln() differs in the last ulp across libm builds."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    score = idf * (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", "tf", "df", floor_quantize(score, 4).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# q_retrieval_ndcg — graded ranking-quality evaluation of the BM25 ranker
# ---------------------------------------------------------------------------

NDCG_K = 10
NDCG_REL_CAP = 3  # graded relevance label: least(tf, 3)


@query(
    "q_retrieval_ndcg",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({", ".join(repr(t) for t in BM25_TERMS)})
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.doc_id, t.term,
         LEAST(t.tf, {NDCG_REL_CAP}) AS rel,
         CASE WHEN abs(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))) < 4.5e9 THEN floor((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))) * 1e4 + 0.5) / 1e4 ELSE (ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (t.tf * ({BM25_K1} + 1.0))
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))) END AS bm25
  FROM tf t
  JOIN dfreq f USING (term)
  JOIN dl d ON t.doc_id = d.doc_id
  CROSS JOIN stats s
),
ranked AS (
  SELECT term, rel,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rk,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) AS irk
  FROM scored
)
SELECT term,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CASE WHEN abs(sum(CASE WHEN rk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(rk + 1) END)) < 4.5e9 THEN floor((sum(CASE WHEN rk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(rk + 1) END)) * 1e4 + 0.5) / 1e4 ELSE (sum(CASE WHEN rk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(rk + 1) END)) END AS dcg_at_k,
       CASE WHEN abs(sum(CASE WHEN irk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(irk + 1) END)) < 4.5e9 THEN floor((sum(CASE WHEN irk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(irk + 1) END)) * 1e4 + 0.5) / 1e4 ELSE (sum(CASE WHEN irk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(irk + 1) END)) END AS idcg_at_k,
       CASE WHEN abs(sum(CASE WHEN rk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(rk + 1) END)
             / sum(CASE WHEN irk <= {NDCG_K}
                        THEN (pow(2, rel) - 1) / log2(irk + 1) END)) < 4.5e9 THEN floor((sum(CASE WHEN rk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(rk + 1) END)
             / sum(CASE WHEN irk <= {NDCG_K}
                        THEN (pow(2, rel) - 1) / log2(irk + 1) END)) * 1e4 + 0.5) / 1e4 ELSE (sum(CASE WHEN rk <= {NDCG_K}
                      THEN (pow(2, rel) - 1) / log2(rk + 1) END)
             / sum(CASE WHEN irk <= {NDCG_K}
                        THEN (pow(2, rel) - 1) / log2(irk + 1) END)) END AS ndcg_at_k,
       CASE WHEN abs(coalesce(1.0 / min(CASE WHEN rel = {NDCG_REL_CAP} THEN rk END), 0.0)) < 4.5e9 THEN floor((coalesce(1.0 / min(CASE WHEN rel = {NDCG_REL_CAP} THEN rk END), 0.0)) * 1e4 + 0.5) / 1e4 ELSE (coalesce(1.0 / min(CASE WHEN rel = {NDCG_REL_CAP} THEN rk END), 0.0)) END
         AS mrr
FROM ranked
GROUP BY term
""",
)
def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking-quality evaluation of the BM25 ranker: per query
    term, nDCG@10 and MRR against a term-frequency relevance label
    rel = least(tf, 3). The label deliberately ignores what BM25 adds
    (idf and length normalization), so the metric measures how far
    length-normalized scoring reorders a raw-frequency ground truth —
    nDCG < 1 is signal, not error. MRR uses the strictest grade
    (rel = 3) as "relevant"; a query with no grade-3 candidate scores
    0. This is the eval harness every retrieval change (BM25 params,
    rank fusion, ANN re-rank) gets judged by — the text twin of
    q_ann_recall, and value-oracled because BM25 + ranks are
    deterministic where the vector path's float ordering is not.

    Plan: reuses q_bm25's scored frame (explode → doc-length +
    term-count partial aggs, broadcast df/stats). Both rank passes
    ride ONE hash partitioning on term — two sorts, one exchange; the
    ranking key is the 4-dp-ROUNDED score with doc_id tiebreak, so
    rank order is engine-stable (the q_ccnet_buckets discipline). The
    per-term row count is bounded by the term's document frequency; at
    100 TB the candidate list per query is first cut by the two-phase
    per-partition top-k (q_topk_two_phase) before any global sort —
    the global-window form here is exact at the audit scale where the
    full candidate set is wanted anyway."""
    scored = q_bm25(spark, sf_dir).select(
        "doc_id",
        "term",
        F.least(F.col("tf"), F.lit(NDCG_REL_CAP)).alias("rel"),
        "bm25",
    )
    w_rank = Window.partitionBy("term").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    w_ideal = Window.partitionBy("term").orderBy(F.col("rel").desc(), F.col("doc_id"))
    ranked = scored.select(
        "term",
        "rel",
        F.row_number().over(w_rank).alias("rk"),
        F.row_number().over(w_ideal).alias("irk"),
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    dcg = F.sum(F.when(F.col("rk") <= NDCG_K, gain / F.log2(F.col("rk") + 1)))
    idcg = F.sum(F.when(F.col("irk") <= NDCG_K, gain / F.log2(F.col("irk") + 1)))
    first_hit = F.min(F.when(F.col("rel") == NDCG_REL_CAP, F.col("rk")))
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        floor_quantize(dcg, 4).alias("dcg_at_k"),
        floor_quantize(idcg, 4).alias("idcg_at_k"),
        floor_quantize(dcg / idcg, 4).alias("ndcg_at_k"),
        floor_quantize(F.coalesce(1.0 / first_hit, F.lit(0.0)), 4).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# q_char_entropy — character-distribution profiling
# ---------------------------------------------------------------------------


@query(
    "q_char_entropy",
    oracle="""
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch FROM documents
),
counts AS (SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY doc_id, ch)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT)  AS n_chars,
       CAST(count(*) AS BIGINT)  AS n_distinct_chars,
       CASE WHEN abs(log2(CAST(sum(cnt) AS DOUBLE))
             - sum(cnt * log2(CAST(cnt AS DOUBLE))) / sum(cnt)) < 4.5e9 THEN floor((log2(CAST(sum(cnt) AS DOUBLE))
             - sum(cnt * log2(CAST(cnt AS DOUBLE))) / sum(cnt)) * 1e4 + 0.5) / 1e4 ELSE (log2(CAST(sum(cnt) AS DOUBLE))
             - sum(cnt * log2(CAST(cnt AS DOUBLE))) / sum(cnt)) END AS entropy_bits
FROM counts
GROUP BY doc_id
""",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per document — the cheap gibberish /
    binary-junk / repeated-filler detector (low entropy = repetitive,
    ~4.2 bits = English-like prose). Computed as log2(n) - Σ c·log2(c)/n
    over per-(doc,char) counts so only integer counts are aggregated
    (exact partial aggregation); the float log algebra happens once
    per group at the end, rounded to 4 dp against summation-order
    ulps. Two cheap shuffles on doc-keyed counts; at 100 TB the first
    agg partial-combines to ≤|alphabet| rows per doc per task."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    # (?s) = dotall: bare '.' excludes \n in RE2 but ALL line
    # terminators (\n \r U+0085 U+2028 U+2029) in Java — only the
    # dotall form counts every codepoint identically cross-engine.
    chars = docs.select(
        "doc_id", F.explode(F.regexp_extract_all("text", F.lit("(?s)."), 0)).alias("ch")
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    n = F.sum("cnt")
    return counts.groupBy("doc_id").agg(
        n.cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        floor_quantize(
            F.log2(n.cast("double")) - F.sum(F.col("cnt") * F.log2(F.col("cnt").cast("double"))) / n, 4).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# q_psi_drift — population stability index between two snapshots
# ---------------------------------------------------------------------------


@query(
    "q_psi_drift",
    oracle="""
WITH bucketed AS (
  SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'base' ELSE 'cur' END AS snap,
         least(greatest(CAST(floor(value / 100.0) AS BIGINT), 0), 9) AS bucket
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT bucket,
         CAST(sum(CASE WHEN snap = 'base' THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
         CAST(sum(CASE WHEN snap = 'cur'  THEN 1 ELSE 0 END) AS DOUBLE) AS nc
  FROM bucketed GROUP BY bucket
),
tots AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM counts)
SELECT bucket,
       CAST(nb AS BIGINT) AS n_base,
       CAST(nc AS BIGINT) AS n_current,
       CASE WHEN abs((((nc + 0.5) / (tc + 5.0)) - ((nb + 0.5) / (tb + 5.0)))
             * ln(((nc + 0.5) / (tc + 5.0)) / ((nb + 0.5) / (tb + 5.0)))) < 4.5e9 THEN floor(((((nc + 0.5) / (tc + 5.0)) - ((nb + 0.5) / (tb + 5.0)))
             * ln(((nc + 0.5) / (tc + 5.0)) / ((nb + 0.5) / (tb + 5.0)))) * 1e6 + 0.5) / 1e6 ELSE ((((nc + 0.5) / (tc + 5.0)) - ((nb + 0.5) / (tb + 5.0)))
             * ln(((nc + 0.5) / (tc + 5.0)) / ((nb + 0.5) / (tb + 5.0)))) END AS psi_term
FROM counts CROSS JOIN tots
ORDER BY bucket
""",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index terms between two time snapshots of
    the value distribution (first vs second half of the month) — the
    standard feature-drift monitor; Σ psi_term > 0.2 means the
    distribution moved. Fixed-width integer bucketing keeps bucket
    membership exact; both snapshot histograms come from ONE scan
    (conditional counts per bucket, partial-agg map-side); the totals
    ride a 1-row broadcast. Per-bucket terms are emitted (the sum is
    one more agg) so the drilldown — WHICH buckets moved — is free."""
    ev = load(spark, sf_dir, "events", columns=["ts", "value"]).filter(
        F.col("value").isNotNull()
    )
    snap = F.when(F.to_date("ts") < F.lit("2024-01-16").cast("date"), "base").otherwise("cur")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 100.0).cast("long"), F.lit(0)), F.lit(9)
    )
    counts = (
        ev.select(snap.alias("snap"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("snap") == "base", 1).otherwise(0)).cast("double").alias("nb"),
            F.sum(F.when(F.col("snap") == "cur", 1).otherwise(0)).cast("double").alias("nc"),
        )
    )
    tots = counts.agg(F.sum("nb").alias("tb"), F.sum("nc").alias("tc"))
    # Laplace-smoothed shares (0.5 per bucket, 10 buckets) keep empty
    # buckets finite — the conventional PSI zero-cell guard.
    pc = (F.col("nc") + 0.5) / (F.col("tc") + 5.0)
    pb = (F.col("nb") + 0.5) / (F.col("tb") + 5.0)
    return (
        counts.crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            F.col("nb").cast("long").alias("n_base"),
            F.col("nc").cast("long").alias("n_current"),
            floor_quantize((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q_term_pmi — pointwise mutual information of term co-occurrence
# ---------------------------------------------------------------------------


@query(
    "q_term_pmi",
    oracle="""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM dt GROUP BY term),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, CAST(count(*) AS DOUBLE) AS c_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
)
SELECT term_a, term_b,
       CAST(c_ab AS BIGINT) AS n_cooccur,
       CASE WHEN abs(ln((c_ab * n_docs) / (fa.df * fb.df))) < 4.5e9 THEN floor((ln((c_ab * n_docs) / (fa.df * fb.df))) * 1e4 + 0.5) / 1e4 ELSE (ln((c_ab * n_docs) / (fa.df * fb.df))) END AS pmi
FROM pairs
JOIN df fa ON term_a = fa.term
JOIN df fb ON term_b = fb.term
CROSS JOIN n
WHERE c_ab >= 5
""",
)
def q_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of term pairs co-occurring in a
    document — the association-mining/phrase-detection primitive
    (PMI > 0: terms attract; < 0: repel). The pair space is generated
    by a per-document SELF-JOIN on doc_id over DISTINCT doc-terms, so
    the blowup is bounded by (terms-per-doc choose 2) per document —
    never vocab², and never corpus-pairwise; at open-vocab scale the
    join keys on (doc, term-bucket) to cap the widest documents. Term
    document-frequencies broadcast back onto the pair counts; a
    support floor (c_ab ≥ 5) prunes noise pairs before the join."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    dt = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
    ).distinct()
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    a, b = dt.alias("a"), dt.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.term") < F.col("b.term")))
        .groupBy(F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b"))
        .agg(F.count(F.lit(1)).cast("double").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    fa = dfreq.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    fb = dfreq.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(fa), "term_a")
        .join(F.broadcast(fb), "term_b")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            F.col("c_ab").cast("long").alias("n_cooccur"),
            floor_quantize(
                F.log((F.col("c_ab") * F.col("n_docs")) / (F.col("df_a") * F.col("df_b"))), 4).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# L59 — cross-source score calibration (quantile normalization)
# ---------------------------------------------------------------------------


@query(
    "q_score_calibration",
    oracle="""
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS raw_score,
       CASE WHEN abs(percent_rank() OVER (
         PARTITION BY source ORDER BY n_chars NULLS FIRST, doc_id)) < 4.5e9 THEN floor((percent_rank() OVER (
         PARTITION BY source ORDER BY n_chars NULLS FIRST, doc_id)) * 1e6 + 0.5) / 1e6 ELSE (percent_rank() OVER (
         PARTITION BY source ORDER BY n_chars NULLS FIRST, doc_id)) END AS calibrated
FROM documents
""",
)
def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: a raw quality score (n_chars as
    the stand-in) is quantile-normalized WITHIN each source via
    percent_rank, so 'top 10% of its source' means the same thing for
    a verbose source and a terse one — gating on the raw score would
    silently tilt the mixture toward whichever source scores high on
    absolute numbers. doc_id tie-break keeps equal scores
    deterministic. One per-source window sort; at extreme per-source
    cardinality the documented variant is approx_percentile cutoffs
    broadcast back (the q_rfm_segments note), trading exact ranks for
    a sort-free two-pass plan."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    # NULLS FIRST pinned explicitly: Spark default, DuckDB is NULLS LAST
    w = Window.partitionBy("source").orderBy(F.col("n_chars").asc_nulls_first(), "doc_id")
    return docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("raw_score"),
        floor_quantize(F.percent_rank().over(w), 6).alias("calibrated"),
    )


@query(
    "q_quantile_normalize",
    oracle="""
WITH s AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS raw,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars NULLS FIRST, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n_s,
         COUNT(*) OVER () AS n
  FROM documents
), g AS (
  SELECT CAST(n_chars AS BIGINT) AS norm_value,
         ROW_NUMBER() OVER (ORDER BY n_chars NULLS FIRST, doc_id) AS g_r
  FROM documents
)
SELECT s.doc_id, s.source, s.raw, g.norm_value
FROM s JOIN g ON g.g_r = (s.r * s.n + s.n_s - 1) // s.n_s
""",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources: each document's raw
    score (n_chars proxy) is replaced by the GLOBAL score at the same
    within-source quantile position — after this, every source has an
    identical score distribution, so a single global threshold treats
    a verbose source and a terse one the same. The full-distribution
    upgrade of L59's percent_rank calibration (which normalizes ranks
    but keeps no comparable VALUE scale).

    Discrete, exact mapping: within-source rank r of n_s maps to
    global rank ceil(r·N/n_s) via integer arithmetic (no float
    quantiles), then one equi-join on the integer rank fetches the
    global value — every output is an actual observed score,
    bit-equal across engines. Shape: per-source windows share one
    source-partitioned sort; the global row_number is the one global
    sort (the documented 100 TB swap is an approx_percentile grid +
    range join, trading exact ranks for a sort-free two-pass plan);
    the rank join is integer-keyed and AQE-splittable."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    # NULLS FIRST pinned EXPLICITLY both sides: it is Spark's
    # ascending default but DuckDB defaults to NULLS LAST — on a
    # nullable sort key every rank would shift cross-engine (found by
    # the nulls fuzz shape).
    nc = F.col("n_chars").asc_nulls_first()
    by_src = Window.partitionBy("source").orderBy(nc, "doc_id")
    s = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("raw"),
        F.row_number().over(by_src).cast("long").alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("n_s"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    g = docs.select(
        F.col("n_chars").cast("long").alias("norm_value"),
        F.row_number().over(Window.orderBy(nc, "doc_id")).cast("long").alias("g_r"),
    )
    # ceil(r*N/n_s) in pure integer arithmetic — Spark's `/` is double
    # division, so `div` keeps the rank mapping exact.
    target = F.expr("(r * n + n_s - 1) div n_s")
    sel = s.select("doc_id", "source", "raw", target.alias("g_r"))
    return sel.join(g, "g_r").select("doc_id", "source", "raw", "norm_value")


@query(
    "q_mix_drift_timeline",
    oracle="""
WITH cells AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         event_type, COUNT(*) AS n_dt
  FROM events GROUP BY 1, 2
), days AS (
  SELECT day, SUM(n_dt) AS n_d FROM cells GROUP BY 1
), types AS (
  SELECT event_type, SUM(n_dt) AS n_t FROM cells GROUP BY 1
), grid AS (
  SELECT d.day, t.event_type, d.n_d, t.n_t,
         COALESCE(c.n_dt, 0) AS n_dt,
         (SELECT SUM(n_t) FROM types) AS n
  FROM days d CROSS JOIN types t
  LEFT JOIN cells c ON c.day = d.day AND c.event_type = t.event_type
), terms AS (
  SELECT day, n_d,
         CAST(n_dt AS DOUBLE) / n_d AS p,
         CAST(n_t  AS DOUBLE) / n   AS q
  FROM grid
)
SELECT day,
       CAST(MAX(n_d) AS BIGINT) AS n_events,
       CASE WHEN abs(SUM(CASE WHEN p > 0 THEN 0.5 * p * LN(p / ((p + q) / 2)) ELSE 0 END)
             + SUM(0.5 * q * LN(q / ((p + q) / 2)))) < 4.5e9 THEN floor((SUM(CASE WHEN p > 0 THEN 0.5 * p * LN(p / ((p + q) / 2)) ELSE 0 END)
             + SUM(0.5 * q * LN(q / ((p + q) / 2)))) * 1e6 + 0.5) / 1e6 ELSE (SUM(CASE WHEN p > 0 THEN 0.5 * p * LN(p / ((p + q) / 2)) ELSE 0 END)
             + SUM(0.5 * q * LN(q / ((p + q) / 2)))) END AS js_nats
FROM terms
GROUP BY 1
""",
)
def q_mix_drift_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-mix drift timeline: Jensen-Shannon divergence (nats)
    between each day's event-type distribution and the overall mix —
    the continuous-monitoring upgrade of q_psi_drift's two-snapshot
    comparison (JS is symmetric, bounded by ln 2, and defined even
    when a type is absent from a day, where PSI's log-ratio blows up).

    Shape: the fact table reduces to |days|x|types| cells in one
    partial-agg shuffle; the dense grid comes from a cross join of the
    two PRE-REDUCED dims (the q_join_cross discipline — never a
    fact-sized cartesian) with counts left-joined back; every sum runs
    over the tiny grid. p=0 terms are exactly 0 (handled explicitly,
    not via ln(0))."""
    ev = load(spark, sf_dir, "events", columns=["ts", "event_type"])
    cells = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n_dt"))
    days = cells.groupBy("day").agg(F.sum("n_dt").alias("n_d"))
    types = cells.groupBy("event_type").agg(F.sum("n_dt").alias("n_t"))
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(cells, ["day", "event_type"], "left")
        .withColumn("n_dt", F.coalesce("n_dt", F.lit(0)))
        .withColumn("n", F.sum("n_t").over(Window.partitionBy("day")))
    )
    p = F.col("n_dt").cast("double") / F.col("n_d")
    q = F.col("n_t").cast("double") / F.col("n")
    m = (p + q) / 2
    terms = grid.select(
        "day",
        "n_d",
        F.when(p > 0, 0.5 * p * F.log(p / m)).otherwise(F.lit(0.0)).alias("tp"),
        (0.5 * q * F.log(q / m)).alias("tq"),
    )
    return terms.groupBy("day").agg(
        F.max("n_d").cast("bigint").alias("n_events"),
        floor_quantize(F.sum("tp") + F.sum("tq"), 6).alias("js_nats"),
    )


# ---------------------------------------------------------------------------
# q_filter_overlap — quality-filter ensemble redundancy audit
# ---------------------------------------------------------------------------


@query(
    "q_filter_overlap",
    oracle="""
WITH feats AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_toks,
         len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS n_distinct,
         -- coalesce: DuckDB's array_to_string of an EMPTY list is
         -- NULL (Spark's array_join is ''), which silently dropped
         -- the nonalpha flag on zero-token docs (fuzz, seed 409)
         coalesce(length(array_to_string(regexp_extract_all(lower(text), '[a-z]+'), '')), 0) AS n_alpha,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         length(text) AS n_chars
  FROM documents
),
flags AS (
  SELECT doc_id,
         list_filter([
           CASE WHEN n_toks < 40 THEN 'short' END,
           CASE WHEN n_toks > 80 THEN 'long' END,
           CASE WHEN 2 * n_distinct < n_toks THEN 'repetitive' END,
           CASE WHEN 5 * n_alpha < 4 * n_chars THEN 'nonalpha' END,
           CASE WHEN 5 * n_digit > n_chars THEN 'digit' END
         ], x -> x IS NOT NULL) AS fails
  FROM feats
),
pairs AS (
  SELECT unnest(flatten(list_transform(fails,
           a -> list_transform(list_filter(fails, b -> b >= a), b -> [a, b])))) AS p
  FROM flags
)
SELECT p[1] AS rule_a, p[2] AS rule_b, CAST(count(*) AS BIGINT) AS n_docs
FROM pairs GROUP BY 1, 2
""",
)
def q_filter_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter ENSEMBLE audit: the co-failure matrix of five
    cheap gibberish rules (short/long/repetitive/non-alpha/
    digit-heavy). The diagonal is each rule's kill count; off-diagonal
    cells measure redundancy — a rule whose failures are a subset of
    another's adds review burden without recall, which is exactly what
    this audit exposes before a pipeline ships a filter ensemble
    (the Gopher/Dolma rule-set tuning workflow).

    Plan + portability: every feature and threshold is INTEGER (token
    counts, char counts, scaled comparisons — no float ratios), so the
    matrix is exact cross-engine. Flags are map-side column algebra;
    each doc contributes ≤ |rules|² pair rows (≤ 25) pre-aggregated
    map-side to a ≤ 15-row result — one corpus scan, one tiny
    shuffle, any corpus size."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)
    feats = docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.array_join(toks, "")).alias("n_alpha"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]"), 0)).alias("n_digit"),
        F.length("text").alias("n_chars"),
    )
    flags = feats.select(
        "doc_id",
        F.filter(
            F.array(
                F.when(F.col("n_toks") < 40, "short"),
                F.when(F.col("n_toks") > 80, "long"),
                F.when(2 * F.col("n_distinct") < F.col("n_toks"), "repetitive"),
                F.when(5 * F.col("n_alpha") < 4 * F.col("n_chars"), "nonalpha"),
                F.when(5 * F.col("n_digit") > F.col("n_chars"), "digit"),
            ),
            lambda x: x.isNotNull(),
        ).alias("fails"),
    )
    pairs = flags.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("fails"),
                    lambda a: F.transform(
                        F.filter(F.col("fails"), lambda b: b >= a), lambda b: F.array(a, b)
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p").getItem(0).alias("rule_a"), F.col("p").getItem(1).alias("rule_b")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
