"""Text-analysis operators over the ``documents`` table — the
quality/feature layer of an LLM training-data pipeline (north star in
BASELINE.json; no reference equivalent — the reference's only text
handling is the passback parse, main.py:94-101).

Everything is built-in column algebra (split / higher-order lambdas /
regexp / md5) — zero Python UDFs, so the whole stage is codegen'd and
scales linearly with document bytes. Token arrays are materialized
once per document inside the stage, not re-split per metric.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from grader_etl_spark.functions.hashing import MD5_32_SQL, md5_32
from grader_etl_spark.io import fan_out, load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.textnorm import WS_RE, norm_lower

# Shared stopword list (kept tiny and explicit so the SQL oracle can
# inline the identical set).
STOPWORDS = ("the", "a", "and", "of", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# BPE-ish token pattern: letter runs, digit runs, or single symbols.
# The negated class spells out the whitespace set instead of \s —
# Java's \s and RE2's disagree on \x0B (functions/textnorm.py WS_RE).
_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f\x0B]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (trim first so no empty edge tokens)."""
    return F.split(F.trim(text), WS_RE)


# ---------------------------------------------------------------------------
# q_text_stats — length / word / stopword quality features
# ---------------------------------------------------------------------------


@query(
    "q_text_stats",
    oracle=f"""
SELECT doc_id,
       length(text)                                   AS n_chars,
       length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_words,
       CAST(length(text) AS DOUBLE)
         / length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS chars_per_word,
       length(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'),
                          t -> t IN ({_STOP_SQL})))   AS n_stopwords,
       CAST(length(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'),
                               t -> t IN ({_STOP_SQL}))) AS DOUBLE)
         / length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS stopword_ratio
FROM documents
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features: char/word counts, chars-per-word,
    stopword ratio. One scan, one token array per row."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_words = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("long")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_words.alias("n_words"),
        (F.length("text").cast("double") / n_words).alias("chars_per_word"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / n_words).alias("stopword_ratio"),
    )


# ---------------------------------------------------------------------------
# q_token_count — whitespace + BPE-ish regex token counting
# ---------------------------------------------------------------------------


@query(
    "q_token_count",
    oracle=f"""
SELECT doc_id,
       length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'))  AS n_ws_tokens,
       length(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_re_tokens
FROM documents
""",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    (letter runs / digit runs / single symbols) — the cheap proxy for
    LLM token budgeting at corpus scale."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        # F.lit pattern (not an F.expr SQL string) — SQL string literals
        # would eat the \s escape before the regex engine sees it.
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0)).cast("long").alias("n_re_tokens"),
    )


# ---------------------------------------------------------------------------
# q_lang_id — n-gram/stopword-vote language heuristic
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
}


def _marker_hits(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


@query(
    "q_lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_words,
         length(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'),
                t -> t IN ({", ".join(repr(w) for w in _LANG_MARKERS["en"])}))) AS en_hits,
         length(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'),
                t -> t IN ({", ".join(repr(w) for w in _LANG_MARKERS["de"])}))) AS de_hits,
         length(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'),
                t -> t IN ({", ".join(repr(w) for w in _LANG_MARKERS["es"])}))) AS es_hits,
         length(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'),
                t -> t IN ({", ".join(repr(w) for w in _LANG_MARKERS["fr"])}))) AS fr_hits
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits
              AND CAST(en_hits AS DOUBLE) / n_words >= 0.01 THEN 'en'
         WHEN de_hits >= es_hits AND de_hits >= fr_hits
              AND CAST(de_hits AS DOUBLE) / n_words >= 0.01 THEN 'de'
         WHEN es_hits >= fr_hits
              AND CAST(es_hits AS DOUBLE) / n_words >= 0.01 THEN 'es'
         WHEN CAST(fr_hits AS DOUBLE) / n_words >= 0.01 THEN 'fr'
         ELSE 'unknown'
       END AS lang_guess
FROM scored
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-stopword vote with a 1% floor,
    ties broken by fixed language priority (en>de>es>fr). A real
    deployment swaps the marker table for char-n-gram profiles; the
    operator shape (pure column algebra, one pass) is the point."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = tokens(F.col("text"))
    d = docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        *[_marker_hits(toks, ws).alias(f"{lang}_hits") for lang, ws in _LANG_MARKERS.items()],
    )
    ratio = lambda lang: F.col(f"{lang}_hits").cast("double") / F.col("n_words")  # noqa: E731
    return d.select(
        "doc_id",
        F.when(
            (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (ratio("en") >= 0.01),
            "en",
        )
        .when(
            (F.col("de_hits") >= F.col("es_hits"))
            & (F.col("de_hits") >= F.col("fr_hits"))
            & (ratio("de") >= 0.01),
            "de",
        )
        .when((F.col("es_hits") >= F.col("fr_hits")) & (ratio("es") >= 0.01), "es")
        .when(ratio("fr") >= 0.01, "fr")
        .otherwise("unknown")
        .alias("lang_guess"),
    )


# ---------------------------------------------------------------------------
# q_chunk_documents — fixed-size overlapping chunking (RAG/pretraining
# document splitting as a table-generating operation)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 500  # chars per chunk
CHUNK_STEP = 400  # stride => 100-char overlap between adjacent chunks


@query(
    "q_chunk_documents",
    oracle=f"""
SELECT doc_id,
       CAST((start - 1) // {CHUNK_STEP} AS BIGINT)            AS chunk_id,
       substr(text, start, {CHUNK_SIZE})                      AS chunk_text,
       CAST(length(substr(text, start, {CHUNK_SIZE})) AS BIGINT) AS chunk_len
FROM (
  SELECT doc_id, text, unnest(generate_series(1, length(text), {CHUNK_STEP})) AS start
  FROM documents
  WHERE length(text) > 0
)
""",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunks (500 chars, 400 stride) — one doc
    → n chunk rows, the UNNEST/flat-map shape done with
    explode(sequence) + substring instead of a UDTF: the row expansion
    happens inside codegen and the per-chunk substring is O(chunk), so
    a 100 TB corpus chunks in one scan with no Python in the loop.
    Chunk boundaries are character offsets; token-aware splitting
    composes by running tokens() on chunk_text downstream."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"]).filter(
        F.length("text") > 0
    )
    starts = F.sequence(F.lit(1), F.length("text"), F.lit(CHUNK_STEP))
    chunk = F.expr(f"substring(text, start, {CHUNK_SIZE})")
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STEP).cast("long").alias("chunk_id"),
            chunk.alias("chunk_text"),
            F.length(chunk).cast("long").alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# q_doc_fingerprint — exact + normalized content fingerprints
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Winnowing (rolling-hash) fingerprints — the MOSS/plagiarism-detection
# selection scheme: char k-gram hashes, min per sliding window.
# ---------------------------------------------------------------------------

WINNOW_K = 8  # chars per gram
WINNOW_W = 4  # window of consecutive gram hashes


def winnow_fingerprints(text: Column, k: int = WINNOW_K, w: int = WINNOW_W) -> Column:
    """Distinct winnowed fingerprints of a document: md5_32 (the
    cross-engine hash, functions/hashing.py) over each char k-gram,
    then the minimum per w-gram sliding window. Guarantees
    any shared substring of length >= k+w-1 contributes a shared
    fingerprint (the winnowing theorem), at ~1/w the density of the
    full k-gram set.

    The gram array is let-bound via a single-element-array transform:
    referencing the raw `grams` expression tree inside the window
    lambda would re-evaluate ALL O(L) crc32 calls once per window
    position — O(L^2) per document (measured: 57 s for 500 docs at
    sf0.01). Bound as a lambda variable it is evaluated exactly once
    per row, and the window pass is O(L*w) attribute reads."""
    empty_longs = F.array().cast("array<long>")
    # sequence(1, 0) DESCENDS in Spark — short inputs need the explicit
    # guard, not a clamped upper bound.
    grams = F.when(
        F.length(text) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - (k - 1)),
            lambda i: md5_32(text.substr(i, F.lit(k))),
        ),
    ).otherwise(empty_longs)
    wins = F.element_at(
        F.transform(  # array(grams) -> lambda binds g ONCE per row
            F.array(grams),
            lambda g: F.when(
                F.size(g) >= w,
                F.transform(
                    F.sequence(F.lit(1), F.size(g) - (w - 1)),
                    lambda j: F.array_min(F.slice(g, j, w)),
                ),
            ).otherwise(empty_longs),
        ),
        1,
    )
    return F.array_sort(F.array_distinct(wins))


_WINNOW_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         CASE WHEN length(text) >= {WINNOW_K} THEN
           list_transform(range(1, length(text) - {WINNOW_K - 2}),
             i -> {MD5_32_SQL.format(expr=f"SUBSTRING(text, i, {WINNOW_K})")})
         ELSE CAST([] AS BIGINT[]) END AS g
  FROM documents
),
wins AS (
  SELECT doc_id,
         CASE WHEN len(g) >= {WINNOW_W} THEN
           list_transform(range(1, len(g) - {WINNOW_W - 2}),
             j -> list_min(g[j:j+{WINNOW_W - 1}]))
         ELSE CAST([] AS BIGINT[]) END AS winlist
  FROM grams
),
fps AS (SELECT doc_id, list_sort(list_distinct(winlist)) AS fps FROM wins)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       fps[1]                   AS first_fp
FROM fps
"""


@query("q_winnow_fingerprint", oracle=_WINNOW_ORACLE)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed rolling-hash fingerprints per document (count + head
    shown; the full set is the dedup/similarity key). Value-oracled:
    the k-gram hash is the cross-engine md5_32 (functions/hashing.py),
    so DuckDB replays the identical gram→window-min→distinct pipeline
    with list functions; tests/test_winnow.py additionally pins a
    pure-Python reference and the winnowing shared-substring
    guarantee."""
    docs = fan_out(load(spark, sf_dir, "documents", columns=["doc_id", "text"]))
    fps = winnow_fingerprints(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(fps).cast("long").alias("n_fingerprints"),
        # try_element_at: a doc shorter than the k-gram window has an
        # EMPTY fingerprint set — DuckDB's fps[1] is NULL there, while
        # plain element_at ANSI-throws (fuzz: test_fuzz_oracle).
        F.try_element_at(fps, F.lit(1)).alias("first_fp"),
    )


@query(
    "q_doc_fingerprint",
    oracle="""
SELECT doc_id,
       md5(text)                                              AS fp_exact,
       md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))     AS fp_normalized
FROM documents
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact md5 plus a whitespace/case
    normalized md5 — the keys exact and near-exact dedup group on."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return docs.select(
        "doc_id",
        F.md5("text").alias("fp_exact"),
        F.md5(F.regexp_replace(norm_lower("text"), WS_RE, " ")).alias("fp_normalized"),
    )


@query(
    "q_tfidf_keywords",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, score, rank
FROM (
  SELECT doc_id, term, tf, df,
         tf * ((n_docs * 1000) // df) AS score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf * ((n_docs * 1000) // df) DESC, term) AS rank
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
WHERE rank <= 3
""",
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document. IDF is quantized to the
    integer ``(N*1000) div df`` so the score is exact arithmetic on
    both engines — a float ln() would hash-mismatch in the last ulp
    between libm implementations, and ranking only needs monotonicity
    in N/df, not the logarithm itself (documented quantization; a
    production variant would use log and skip the oracle).

    Scale shape: one explode pass builds (doc, term) counts with
    map-side partial agg; document frequencies are a second tiny agg
    keyed by term; the join back to per-doc rows shuffles on term
    (vocab-sized, zipf-skewed — AQE skew split applies); the global N
    rides in as a 1-row broadcast cross join, never a driver round
    trip. Per-doc top-3 is a window over the doc key with a
    deterministic (score desc, term asc) tie-break."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf", "df",
            F.expr("tf * ((n_docs * 1000) div df)").alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


@query(
    "q_vocab_prune",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN df * 10 > n_docs * 3 THEN 0
                     WHEN df = 1 THEN 0 ELSE tf END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN df * 10 > n_docs * 3 THEN tf ELSE 0 END) AS BIGINT) AS n_pruned_common,
       CAST(SUM(CASE WHEN df * 10 <= n_docs * 3 AND df = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_pruned_rare
FROM tf JOIN dfreq USING (term) CROSS JOIN n
GROUP BY doc_id
""",
)
def q_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary pruning (corpus prep): drop corpus-stopwords
    (document frequency > 30% of docs) and hapax legomena (df = 1),
    reporting per-doc kept/pruned token counts — the transform side of
    what q_tfidf_keywords ranks. Thresholds compare integer-rescaled
    counts (df*10 > N*3), never a float ratio, so bucket membership is
    engine-exact. Same one-explode scan shape as TF-IDF: (doc, term)
    counts partial-agg before the shuffle, df is a vocab-sized second
    agg joined back on term, N rides a 1-row broadcast."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    is_common = F.col("df") * 10 > F.col("n_docs") * 3
    is_rare = ~is_common & (F.col("df") == 1)
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.when(is_common | is_rare, 0).otherwise(F.col("tf"))).alias("n_kept"),
            F.sum(F.when(is_common, F.col("tf")).otherwise(0)).alias("n_pruned_common"),
            F.sum(F.when(is_rare, F.col("tf")).otherwise(0)).alias("n_pruned_rare"),
        )
    )


@query(
    "q_repetition_score",
    oracle="""
WITH t AS (
  SELECT doc_id,
         greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - 2, 0) AS n_shingles,
         length(list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - 1, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         ))) AS n_distinct
  FROM documents
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CASE WHEN n_shingles = 0 THEN 0.0
            ELSE CASE WHEN abs(1.0 - CAST(n_distinct AS DOUBLE) / n_shingles) < 4.5e9 THEN floor((1.0 - CAST(n_distinct AS DOUBLE) / n_shingles) * 1e6 + 0.5) / 1e6 ELSE (1.0 - CAST(n_distinct AS DOUBLE) / n_shingles) END END AS dup_ngram_ratio
FROM t
""",
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-3-gram fraction per document — the Gopher-style
    repetition quality rule (boilerplate and looped generations score
    high; prose scores near 0). Reuses the dedup pipeline's shingle
    expression: total shingles = max(words-2, 0), distinct via the
    same zip_with construction q_neardup_jaccard indexes on, so the
    quality gate and the dedup index price ONE tokenization. Pure
    column algebra, map-only, no shuffle."""
    from grader_etl_spark.operators.llm_dedup import shingles

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    n_words = F.size(F.split(F.trim("text"), WS_RE))
    n_shingles = F.greatest(n_words - 2, F.lit(0)).cast("long")
    # coalesce: NULL text has no shingles (size(NULL array) is NULL on
    # the Spark side, while the oracle's greatest(NULL, 0) range is
    # already empty → 0) — zero-shingle docs score 0.0, NULL included.
    n_distinct = F.coalesce(F.size(shingles(F.col("text"))), F.lit(0)).cast("long")
    ratio = F.when(F.col("n_shingles") == 0, F.lit(0.0)).otherwise(
        floor_quantize(F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_shingles"), 6)
    )
    return (
        docs.select("doc_id", n_shingles.alias("n_shingles"), n_distinct.alias("n_distinct"))
        .withColumn("dup_ngram_ratio", ratio)
    )


@query(
    "q_inverted_index",
    oracle="""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(doc_id))[1:10], ',') AS posting_head
FROM toks
GROUP BY term
""",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index (posting list) construction: term → document
    frequency + the first 10 doc ids of the sorted posting list. One
    explode pass, distinct (doc,term) pairs partial-agg before the
    term-keyed shuffle; posting lists materialize per term, so the
    zipf head (stopword terms) is the skew case — AQE skew-split
    handles the shuffle, and the output caps the list (real indexes
    store postings as delta-encoded blocks, never one giant array
    row). Deterministic: postings sorted before truncation."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
    ).distinct()
    return toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.concat_ws(",", F.slice(F.array_sort(F.collect_list("doc_id")), 1, 10)).alias(
            "posting_head"
        ),
    )


@query(
    "q_chunk_dedup_ratio",
    oracle=f"""
WITH chunks AS (
  SELECT md5(substr(text, start, {CHUNK_SIZE})) AS h,
         length(substr(text, start, {CHUNK_SIZE})) AS nbytes
  FROM (
    SELECT text, unnest(generate_series(1, length(text), {CHUNK_STEP})) AS start
    FROM documents WHERE length(text) > 0
  )
)
, per_hash AS (
  SELECT h, count(*) AS n, min(nbytes) AS min_nbytes FROM chunks GROUP BY h
)
SELECT CAST(sum(n) AS BIGINT)               AS n_chunks,
       CAST(count(*) AS BIGINT)             AS n_uniq_chunks,
       CAST(sum(n * min_nbytes) AS BIGINT)  AS total_bytes,
       CAST(sum(min_nbytes) AS BIGINT)      AS uniq_bytes
FROM per_hash
""",
)
def q_chunk_dedup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed chunk dedup statistics — what block-level
    storage dedup would save on the corpus: chunk every document with
    the same grid as q_chunk_documents, fingerprint chunks by md5, and
    report total vs distinct chunk counts and bytes. The shuffle
    carries 16-byte hashes plus a length, never chunk payloads."""
    docs = load(spark, sf_dir, "documents", columns=["text"]).filter(F.length("text") > 0)
    starts = F.sequence(F.lit(1), F.length("text"), F.lit(CHUNK_STEP))
    chunk = F.expr(f"substring(text, start, {CHUNK_SIZE})")
    chunks = docs.select("text", F.explode(starts).alias("start")).select(
        F.md5(chunk).alias("h"), F.length(chunk).alias("nbytes")
    )
    per_hash = chunks.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"), F.min("nbytes").alias("min_nbytes")
    )
    return per_hash.agg(
        F.sum("n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_uniq_chunks"),
        F.sum(F.col("n") * F.col("min_nbytes")).cast("long").alias("total_bytes"),
        F.sum("min_nbytes").cast("long").alias("uniq_bytes"),
    )


@query(
    "q_unigram_logprob",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS c FROM tf GROUP BY term),
tot AS (SELECT sum(c) AS t FROM vocab)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       CASE WHEN abs(sum(tf * -ln(c / t)) / sum(tf)) < 4.5e9 THEN floor((sum(tf * -ln(c / t)) / sum(tf)) * 1e4 + 0.5) / 1e4 ELSE (sum(tf * -ln(c / t)) / sum(tf)) END AS mean_neg_logprob
FROM tf JOIN vocab USING (term) CROSS JOIN tot
GROUP BY doc_id
""",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean negative log-probability of each document under the
    corpus unigram model — the cheap perplexity proxy used as an LM
    quality filter (CCNet-style): typical prose scores near the
    corpus entropy, keyboard mash and rare-token soup score high.
    One explode pass → (doc,term) counts; the unigram table is
    vocab-sized and broadcasts back onto it; the corpus total rides a
    1-row broadcast. Token counts weight the per-term surprisals so
    the whole statistic is one grouped sum, rounded 4 dp against
    summation-order ulps. A production filter swaps the unigram
    table for a trained KenLM — the join shape is identical."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").cast("double").alias("c"))
    tot = vocab.agg(F.sum("c").alias("t"))
    return (
        tf.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            floor_quantize(
                F.sum(F.col("tf") * -F.log(F.col("c") / F.col("t"))) / F.sum("tf"), 4).alias("mean_neg_logprob"),
        )
    )


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) adjacent-token pairs as pure array algebra:
    zip_with of the token array against itself shifted by one. The
    lead-window formulation this replaces forced a shuffle + per-doc
    sort of every TOKEN just to pair neighbors; here pairing is a
    projection inside the scan stage — tokens of one document never
    leave their partition, which is the difference between an
    O(corpus) sort and free at 100 TB. Docs with < 2 tokens produce
    an empty pair array and drop out at the explode, matching the
    lead-window's w2 IS NOT NULL filter."""
    arr = F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)
    n1 = F.greatest(F.size("arr") - F.lit(1), F.lit(0))
    return (
        docs.select("doc_id", arr.alias("arr"))
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("arr", F.lit(1), n1),
                    F.slice("arr", F.lit(2), n1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )


# Session memo of the per-document bigram count table (doc_id, w1,
# w2, n), keyed by (session, corpus dir): the three bigram LM scorers
# (q_bigram_logprob, q_interp_logprob, q_kneser_ney) each derive
# their model tables (bigram counts, context totals, continuation
# counts) from this SAME aggregate, and each previously re-ran the
# full corpus tokenize + zip_with pair explode + (doc,w1,w2) group —
# the dominant fact-sized pass in all three plans (~6.1 s combined at
# sf0.1, round-8 verdict item 2). Same discipline as the jaccard pair
# memo in llm_dedup.py: localCheckpointed once per (session, corpus),
# build billed to the first consumer, cleared by clear_session_memos
# on bench stall-retry / corpus rollover. Values are exact integers,
# so every downstream aggregate is bit-identical to the un-memoized
# plan.
_DOC_BIGRAM_CACHE: dict[tuple, DataFrame] = {}


def doc_bigram_counts_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2, n) per-document bigram counts, computed once
    per (session, corpus dir) and shared by the bigram LM scorers."""
    key = (spark, sf_dir)
    if key not in _DOC_BIGRAM_CACHE:
        from grader_etl_spark.registry import memo_checkpoint

        docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
        _DOC_BIGRAM_CACHE[key] = memo_checkpoint(
            _doc_bigrams(docs)
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    return _DOC_BIGRAM_CACHE[key]


@query(
    "q_bigram_logprob",
    oracle="""
WITH arrs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS arr
  FROM documents
),
toks AS (
  SELECT doc_id,
         unnest(arr) AS term,
         unnest(generate_series(1, len(arr))) AS pos
  FROM arrs
),
big AS (
  SELECT doc_id, term AS w1,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
doc_big AS (
  SELECT doc_id, w1, w2, COUNT(*) AS n
  FROM big WHERE w2 IS NOT NULL
  GROUP BY doc_id, w1, w2
),
model AS (
  SELECT w1, w2, CAST(SUM(n) AS DOUBLE) AS c12 FROM doc_big GROUP BY w1, w2
),
starts AS (
  SELECT w1, CAST(SUM(c12) AS DOUBLE) AS c1 FROM model GROUP BY w1
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       CASE WHEN abs(SUM(n * -ln(c12 / c1)) / SUM(n)) < 4.5e9 THEN floor((SUM(n * -ln(c12 / c1)) / SUM(n)) * 1e4 + 0.5) / 1e4 ELSE (SUM(n * -ln(c12 / c1)) / SUM(n)) END AS mean_neg_logprob
FROM doc_big JOIN model USING (w1, w2) JOIN starts USING (w1)
GROUP BY doc_id
""",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean negative log-probability of each document under the
    corpus BIGRAM model P(w2|w1) = c(w1,w2)/c(w1·) — the
    order-sensitive upgrade of q_unigram_logprob: shuffled-word soup
    scores high here even when its unigram mix looks natural (MLE on
    the training corpus itself, so no unseen-bigram smoothing is
    needed).

    Shape: the per-doc bigram count table is the session memo shared
    by all three LM scorers (`doc_bigram_counts_memo` — built from the
    zip_with pair builder `_doc_bigrams`, a projection with no
    token-level shuffle or sort); the bigram model and its start
    totals are vocab²-bounded aggregates that broadcast back onto the
    per-doc pair counts. Count-weighted surprisal keeps the statistic
    a single grouped sum, rounded 4 dp against summation-order ulps
    (the q_unigram_logprob precedent). Docs with < 2 tokens drop out
    (no bigrams), matching the oracle's WHERE w2 IS NOT NULL."""
    doc_big = doc_bigram_counts_memo(spark, sf_dir)
    model = doc_big.groupBy("w1", "w2").agg(F.sum("n").cast("double").alias("c12"))
    starts = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (
        doc_big.join(F.broadcast(model), ["w1", "w2"])
        .join(F.broadcast(starts), "w1")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            floor_quantize(
                F.sum(F.col("n") * -F.log(F.col("c12") / F.col("c1"))) / F.sum("n"), 4).alias("mean_neg_logprob"),
        )
    )


VOCAB_COVERAGE_KS = (100, 1000, 5000, 20000)


@query(
    "q_vocab_coverage",
    oracle=f"""
WITH tf AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
), counts AS (
  SELECT term, COUNT(*) AS c FROM tf GROUP BY term
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rnk
  FROM counts
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t FROM counts
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(COUNT(CASE WHEN rnk <= k THEN 1 END) AS BIGINT) AS vocab_used,
       CASE WHEN abs(CAST(SUM(CASE WHEN rnk <= k THEN c ELSE 0 END) AS BIGINT)
             / CAST(MAX(t) AS DOUBLE)) < 4.5e9 THEN floor((CAST(SUM(CASE WHEN rnk <= k THEN c ELSE 0 END) AS BIGINT)
             / CAST(MAX(t) AS DOUBLE)) * 1e6 + 0.5) / 1e6 ELSE (CAST(SUM(CASE WHEN rnk <= k THEN c ELSE 0 END) AS BIGINT)
             / CAST(MAX(t) AS DOUBLE)) END AS coverage
FROM ranked
CROSS JOIN (VALUES {", ".join(f"({k})" for k in VOCAB_COVERAGE_KS)}) ks(k)
CROSS JOIN tot
GROUP BY 1
""",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens
    the top-k most frequent terms cover, at several candidate vocab
    sizes — the sizing question every tokenizer build answers first
    (and the Zipf sanity check next to q_vocab_prune's tail cut).

    One explode pass → term counts (map-combined); the rank window
    runs over the |vocab|-sized count table ordered (count desc,
    term) so both engines rank ties identically; coverage sums are
    exact integers against the corpus total, one rounded division per
    k. The k-grid rides a literal broadcast cross join."""
    docs = load(spark, sf_dir, "documents", columns=["text"])
    counts = (
        docs.select(
            F.explode(
                F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = counts.select(
        "c", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("term"))).alias("rnk")
    )
    tot = counts.agg(F.sum("c").cast("long").alias("t"))
    ks = F.explode(F.array(*[F.lit(k).cast("long") for k in VOCAB_COVERAGE_KS])).alias("k")
    return (
        ranked.select("c", "rnk", ks)
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.count(F.when(F.col("rnk") <= F.col("k"), 1)).cast("long").alias("vocab_used"),
            floor_quantize(
                F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("c")).otherwise(0)).cast("long")
                / F.max("t").cast("double"), 6).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# q_ngram_top — corpus-level n-gram frequency table (LM-data staple)
# ---------------------------------------------------------------------------

NGRAM_TOP_K = 50


@query(
    "q_ngram_top",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+') AS tk FROM documents
),
grams AS (
  SELECT n, gram FROM (
    SELECT 1 AS n, unnest(tk) AS gram FROM toks
    UNION ALL
    SELECT 2, tk[i] || ' ' || tk[i+1]
    FROM toks, unnest(range(1, greatest(length(tk), 1))) AS t(i)
    UNION ALL
    SELECT 3, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
    FROM toks, unnest(range(1, greatest(length(tk) - 1, 1))) AS t(i)
  )
),
counted AS (
  SELECT n, gram, COUNT(*) AS freq,
         ROW_NUMBER() OVER (PARTITION BY n ORDER BY COUNT(*) DESC, gram) AS rk
  FROM grams GROUP BY n, gram
)
SELECT CAST(n AS BIGINT) AS n, gram, freq, CAST(rk AS BIGINT) AS rank
FROM counted WHERE rk <= {NGRAM_TOP_K}
""",
)
def q_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{NGRAM_TOP_K} corpus 1/2/3-grams with frequencies — the LM
    vocabulary/contamination-screening staple. ONE corpus scan: the
    token array is let-bound once per row, the 1/2/3-gram arrays are
    assembled as (n, gram) structs and concatenated, and a single
    explode feeds one groupBy (map-side partial combine carries
    (n, gram, count), never documents); the per-n top-k is a rank
    window over the already-aggregated gram table, which at 100 TB is
    the frequency table, orders of magnitude smaller than the corpus.
    Ties break lexicographically so ranks are deterministic.
    (shingles() is distinct-per-doc, which would undercount — raw
    grams are built here.)"""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])

    def gram_arr(toks: Column, k: int) -> Column:
        out = toks
        for j in range(1, k):
            out = F.zip_with(
                out,
                F.slice(toks, j + 1, 1 << 30),
                lambda acc, t: F.concat(acc, F.lit(" "), t),
            )
        return F.filter(out, lambda s: s.isNotNull())

    def tag(kk: int):
        # closure, NOT a default arg: pyspark counts lambda params, and
        # a second parameter would receive the array INDEX (same trap
        # documented at simhash()).
        return lambda g: F.struct(F.lit(kk).alias("n"), g.alias("gram"))

    def assemble(toks: Column) -> Column:
        return F.concat(*[F.transform(gram_arr(toks, k), tag(k)) for k in (1, 2, 3)])

    structs = F.element_at(F.transform(F.array(tokens(F.col("text"))), assemble), 1)
    grams = docs.select(F.explode(structs).alias("g")).select("g.n", "g.gram")
    counted = grams.groupBy("n", "gram").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("n").orderBy(F.col("freq").desc(), "gram")
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= NGRAM_TOP_K)
        .select(F.col("n").cast("long").alias("n"), "gram", "freq", "rank")
    )


# ---------------------------------------------------------------------------
# q_packing_plan — token-length histogram for sequence-packing planning
# ---------------------------------------------------------------------------

PACK_CONTEXT = 512
PACK_BUCKET = 64


@query(
    "q_packing_plan",
    oracle=f"""
WITH counts AS (
  SELECT doc_id,
         length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_tokens
  FROM documents
)
SELECT LEAST(n_tokens // {PACK_BUCKET}, {PACK_CONTEXT // PACK_BUCKET}) * {PACK_BUCKET} AS bucket_lo,
       CAST(COUNT(*) AS BIGINT)       AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT)  AS total_tokens,
       CAST(SUM(CAST(CEIL(CAST(n_tokens AS DOUBLE) / {PACK_CONTEXT}) AS BIGINT)) AS BIGINT)
         AS bins_if_unpacked,
       CAST(CEIL(CAST(SUM(n_tokens) AS DOUBLE) / {PACK_CONTEXT}) AS BIGINT)
         AS bins_lower_bound
FROM counts
GROUP BY 1
""",
)
def q_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing planner at context {PACK_CONTEXT}: token-length
    histogram ({PACK_BUCKET}-wide buckets, long tail capped at the
    context length) with, per bucket, the bin count if every document
    shipped alone versus the token-volume lower bound — the gap is the
    packing headroom the L33 packer (q_pack_sequences) harvests. One
    tokenize+aggregate pass; the histogram is vocabulary-sized, not
    corpus-sized."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    n_tokens = F.size(tokens(F.col("text")))
    bucket = (
        F.least(
            n_tokens.cast("long") / F.lit(PACK_BUCKET),
            F.lit(PACK_CONTEXT // PACK_BUCKET),
        ).cast("long")
        * PACK_BUCKET
    )
    return (
        docs.select(n_tokens.alias("n_tokens"), bucket.alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.ceil(F.col("n_tokens").cast("double") / PACK_CONTEXT).cast("long"))
            .cast("long")
            .alias("bins_if_unpacked"),
            F.ceil(F.sum("n_tokens").cast("double") / PACK_CONTEXT)
            .cast("long")
            .alias("bins_lower_bound"),
        )
    )


# ---------------------------------------------------------------------------
# q_source_vocab_overlap — pairwise domain redundancy matrix
# ---------------------------------------------------------------------------


@query(
    "q_source_vocab_overlap",
    oracle="""
WITH st AS (
  SELECT DISTINCT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY source),
inter AS (
  SELECT a.source AS source_1, b.source AS source_2, COUNT(*) AS shared_terms
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_1, source_2, shared_terms,
       CASE WHEN abs(CAST(shared_terms AS DOUBLE)
             / (s1.n + s2.n - shared_terms)) < 4.5e9 THEN floor((CAST(shared_terms AS DOUBLE)
             / (s1.n + s2.n - shared_terms)) * 1e6 + 0.5) / 1e6 ELSE (CAST(shared_terms AS DOUBLE)
             / (s1.n + s2.n - shared_terms)) END AS vocab_jaccard
FROM inter
JOIN sz s1 ON s1.source = source_1
JOIN sz s2 ON s2.source = source_2
""",
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard — the domain-redundancy
    matrix mixture planning reads next to q_mixture_rates (two sources
    with near-identical vocabularies add less diversity than their
    row counts suggest). Same inverted-index shape as
    q_neardup_jaccard, keyed by source instead of doc: the term
    self-join emits at most C(n_sources, 2) rows per term, so the
    shuffle is bounded by vocabulary × sources², never documents²."""
    st = (
        load(spark, sf_dir, "documents", columns=["source", "text"])
        .select(
            "source",
            F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
        )
        .distinct()
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_1"), F.col("b.source").alias("source_2"))
        .agg(F.count(F.lit(1)).alias("shared_terms"))
    )
    s1 = sz.select(F.col("source").alias("source_1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col("source").alias("source_2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(s1), "source_1")
        .join(F.broadcast(s2), "source_2")
        .select(
            "source_1",
            "source_2",
            "shared_terms",
            floor_quantize(
                F.col("shared_terms").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("shared_terms")), 6).alias("vocab_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q_lang_confusion — labeled-vs-heuristic language confusion matrix
# ---------------------------------------------------------------------------


def _lang_confusion_oracle() -> str:
    from grader_etl_spark.registry import REGISTRY

    lang_id_sql = REGISTRY["q_lang_id"].oracle
    return f"""
WITH guessed AS ({lang_id_sql})
SELECT d.lang, g.lang_guess, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM guessed g JOIN documents d ON d.doc_id = g.doc_id
GROUP BY d.lang, g.lang_guess
"""


@query("q_lang_confusion", oracle=None)  # oracle late-bound below (needs q_lang_id)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix between the corpus's lang labels and the
    q_lang_id heuristic — the QA readout that decides whether the
    cheap classifier is good enough to gate on (off-diagonal mass =
    docs a lang filter would mis-route). Composes the registered
    heuristic (one corpus pass) with a broadcast label join and a
    sources×langs-sized aggregate."""
    guessed = q_lang_id(spark, sf_dir)
    labels = load(spark, sf_dir, "documents", columns=["doc_id", "lang"])
    return (
        guessed.join(labels, "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# q_zipf_slope — per-source Zipf exponent (corpus-health diagnostic)
# ---------------------------------------------------------------------------


@query(
    "q_zipf_slope",
    oracle="""
WITH tf AS (
  SELECT source, t AS term, COUNT(*) AS c
  FROM (SELECT source, unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS t
        FROM documents)
  GROUP BY source, t
),
ranked AS (
  SELECT source, c,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, term) AS r
  FROM tf
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CASE WHEN abs(covar_pop(ln(c), ln(r)) / var_pop(ln(r))) < 4.5e9 THEN floor((covar_pop(ln(c), ln(r)) / var_pop(ln(r))) * 1e6 + 0.5) / 1e6 ELSE (covar_pop(ln(c), ln(r)) / var_pop(ln(r))) END AS zipf_slope
FROM ranked
GROUP BY source
""",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf exponent: OLS slope of ln(freq) vs ln(rank) over
    the term-frequency table — natural text sits near -1, and a source
    that deviates hard (templated/boilerplate or synthetic spam) is a
    mixture-planning red flag read next to q_source_vocab_overlap.

    One corpus scan builds (source, term, count); ranks are a window
    over the aggregated frequency table (vocabulary-sized, orders of
    magnitude smaller than the corpus at 100 TB); the slope is a
    closed-form covar_pop/var_pop aggregate per source — no fitting
    loop, no driver collect. Rounded to 6 dp so last-ulp summation
    order differences between engines can't flip the hash."""
    docs = load(spark, sf_dir, "documents", columns=["source", "text"])
    tf = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "term")
    ranked = tf.withColumn("r", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        # try_divide: a single-term vocabulary has var_pop(log r)=0 —
        # slope undefined (NULL both engines; ANSI /0 throws otherwise)
        floor_quantize(
            F.try_divide(F.covar_pop(F.log("c"), F.log("r")), F.var_pop(F.log("r"))), 6
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# q_bpe_pairs — adjacent-character-pair counts (BPE merge round 0)
# ---------------------------------------------------------------------------

BPE_TOP_K = 30


@query(
    "q_bpe_pairs",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS w FROM documents
),
pairs AS (
  SELECT substring(w, CAST(i AS INT), 2) AS pair
  FROM toks, unnest(range(1, greatest(length(w), 1))) AS t(i)
),
counted AS (
  SELECT pair, COUNT(*) AS freq,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair) AS rk
  FROM pairs GROUP BY pair
)
SELECT pair, freq, CAST(rk AS BIGINT) AS rank
FROM counted WHERE rk <= {BPE_TOP_K}
""",
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies inside tokens —
    exactly the statistic the first BPE merge of tokenizer training
    consumes (Sennrich et al. 2016 is public; the count table IS the
    merge-candidate ranking). Top-{BPE_TOP_K} with deterministic
    lexicographic tie-break.

    Per document the pair array is assembled with higher-order
    expressions (sequence → substr → flatten) so the whole extraction
    is codegen'd, then ONE explode feeds a groupBy whose map-side
    partial combine carries (pair, count) — the shuffle is bounded by
    the alphabet squared (~a few thousand keys), never corpus bytes.
    The rank window runs over the aggregated pair table only."""
    docs = load(spark, sf_dir, "documents", columns=["text"])
    empty = F.array().cast("array<string>")

    def word_pairs(w: Column) -> Column:
        return F.when(
            F.length(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.length(w) - 1), lambda i: w.substr(i, F.lit(2))
            ),
        ).otherwise(empty)

    pairs = docs.select(
        F.explode(F.flatten(F.transform(tokens(F.col("text")), word_pairs))).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), "pair")
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BPE_TOP_K)
        .select("pair", "freq", "rank")
    )


from grader_etl_spark import registry as _registry  # noqa: E402
from grader_etl_spark.functions.quantize import floor_quantize

_registry.REGISTRY["q_lang_confusion"] = _registry.QuerySpec(
    name="q_lang_confusion",
    fn=q_lang_confusion,
    oracle=_lang_confusion_oracle(),
    doc=q_lang_confusion.__doc__ or "",
)


# ---------------------------------------------------------------------------
# q_ngram_novelty — per-doc novel-shingle fraction (collection ROI curve)
# ---------------------------------------------------------------------------


@query(
    "q_ngram_novelty",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - 1, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM documents
),
ex AS (SELECT doc_id, unnest(sset) AS s FROM sh),
firsts AS (SELECT s, MIN(doc_id) AS first_doc FROM ex GROUP BY s)
SELECT ex.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(CASE WHEN firsts.first_doc = ex.doc_id THEN 1 END) AS BIGINT) AS novel,
       CASE WHEN abs(CAST(COUNT(CASE WHEN firsts.first_doc = ex.doc_id THEN 1 END) AS DOUBLE)
             / COUNT(*)) < 4.5e9 THEN floor((CAST(COUNT(CASE WHEN firsts.first_doc = ex.doc_id THEN 1 END) AS DOUBLE)
             / COUNT(*)) * 1e6 + 0.5) / 1e6 ELSE (CAST(COUNT(CASE WHEN firsts.first_doc = ex.doc_id THEN 1 END) AS DOUBLE)
             / COUNT(*)) END AS novelty_ratio
FROM ex JOIN firsts ON firsts.s = ex.s
GROUP BY ex.doc_id
""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 3-gram
    shingles whose FIRST corpus occurrence (min doc_id) is this doc —
    ingestion-order novelty, the diminishing-returns curve a data
    team reads before paying for more of a source (novelty_ratio
    trending to ~0 over doc_id = the source is re-saying itself).
    Rides the session shingle index: one explode feeds both the
    first-occurrence aggregate (shuffle carries (shingle, min-id),
    never text) and the per-doc join-back; empty-shingle docs drop
    out on both engines (no division guard needed)."""
    from grader_etl_spark.operators.llm_dedup import shingled_docs

    sh = shingled_docs(spark, sf_dir)
    ex = sh.select("doc_id", F.explode("sset").alias("s"))
    firsts = ex.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    return (
        ex.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias("novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "novel",
            floor_quantize(F.col("novel").cast("double") / F.col("n_shingles"), 6).alias(
                "novelty_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_interp_logprob — Jelinek-Mercer interpolated bigram LM filter
# ---------------------------------------------------------------------------


@query(
    "q_interp_logprob",
    oracle="""
WITH toks AS (
  SELECT doc_id, i AS pos, t[i] AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
       unnest(range(1, len(t) + 1)) AS r(i)
),
uni AS (SELECT term, CAST(count(*) AS DOUBLE) AS cu FROM toks GROUP BY term),
tot AS (SELECT sum(cu) AS n FROM uni),
bi AS (
  SELECT a.doc_id, a.pos, a.term AS w1, b.term AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
doc_bi AS (SELECT doc_id, w1, w2, count(*) AS k FROM bi GROUP BY 1, 2, 3),
model AS (SELECT w1, w2, CAST(sum(k) AS DOUBLE) AS c12 FROM doc_bi GROUP BY 1, 2),
starts AS (SELECT w1, sum(c12) AS c1 FROM model GROUP BY w1)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_bigrams,
       CASE WHEN abs(sum(k * -ln(0.75 * (c12 / c1) + 0.25 * (cu / n))) / sum(k)) < 4.5e9 THEN floor((sum(k * -ln(0.75 * (c12 / c1) + 0.25 * (cu / n))) / sum(k)) * 1e4 + 0.5) / 1e4 ELSE (sum(k * -ln(0.75 * (c12 / c1) + 0.25 * (cu / n))) / sum(k)) END
         AS mean_neg_logprob
FROM doc_bi
JOIN model USING (w1, w2)
JOIN starts USING (w1)
JOIN uni ON uni.term = doc_bi.w2
CROSS JOIN tot
GROUP BY doc_id
""",
)
def q_interp_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer INTERPOLATED bigram LM quality filter: per-token
    surprisal under 0.75·P(w₂|w₁) + 0.25·P(w₂) — the smoothing
    upgrade of q_bigram_logprob (pure MLE, which over-punishes rare
    but well-formed continuations) and the shape of every production
    KenLM-style filter. λ = 3/4 deliberately: both mixture weights
    are dyadic, so the interpolation arithmetic is exact in both
    engines and only the final ln rounds (4 dp, the established
    log-sum discipline).

    Plan: the unigram table comes from one plain explode pass; the
    per-doc bigram counts are the session memo shared by all three LM
    scorers (`doc_bigram_counts_memo`, built once from the zip_with
    pair builder — no token-level shuffle or sort) — the bigram model
    and its start totals are vocab²-bounded
    aggregates broadcast back onto per-doc pair counts together with
    the vocab-sized unigram table; the corpus total rides a 1-row
    broadcast. Per-doc score is one grouped sum; docs with < 2 tokens
    drop out (no bigrams)."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias(
            "term"
        ),
    )
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("cu"))
    tot = uni.agg(F.sum("cu").alias("n"))
    doc_bi = doc_bigram_counts_memo(spark, sf_dir).withColumnRenamed("n", "k")
    model = doc_bi.groupBy("w1", "w2").agg(F.sum("k").cast("double").alias("c12"))
    starts = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    p = F.lit(0.75) * (F.col("c12") / F.col("c1")) + F.lit(0.25) * (F.col("cu") / F.col("n"))
    return (
        doc_bi.join(F.broadcast(model), ["w1", "w2"])
        .join(F.broadcast(starts), "w1")
        .join(F.broadcast(uni.select(F.col("term").alias("w2"), "cu")), "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            floor_quantize(F.sum(F.col("k") * -F.log(p)) / F.sum("k"), 4).alias("mean_neg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# q_kneser_ney — absolute-discount / continuation-probability bigram LM
# ---------------------------------------------------------------------------

KN_DISCOUNT = 0.75  # dyadic: c12 - 0.75 is exact in both engines


@query(
    "q_kneser_ney",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, i AS pos, t[i] AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
       unnest(range(1, len(t) + 1)) AS r(i)
),
bi AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
doc_bi AS (SELECT doc_id, w1, w2, count(*) AS k FROM bi GROUP BY 1, 2, 3),
model AS (SELECT w1, w2, CAST(sum(k) AS DOUBLE) AS c12 FROM doc_bi GROUP BY 1, 2),
ctx AS (
  SELECT w1, sum(c12) AS c1, CAST(count(*) AS DOUBLE) AS n1p_fwd
  FROM model GROUP BY w1
),
cont AS (SELECT w2, CAST(count(*) AS DOUBLE) AS n1p_bwd FROM model GROUP BY w2),
types AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM model)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_bigrams,
       CASE WHEN abs(sum(k * -ln(
           (c12 - {KN_DISCOUNT}) / c1
           + ({KN_DISCOUNT} * n1p_fwd / c1) * (n1p_bwd / n_types)
       )) / sum(k)) < 4.5e9 THEN floor((sum(k * -ln(
           (c12 - {KN_DISCOUNT}) / c1
           + ({KN_DISCOUNT} * n1p_fwd / c1) * (n1p_bwd / n_types)
       )) / sum(k)) * 1e4 + 0.5) / 1e4 ELSE (sum(k * -ln(
           (c12 - {KN_DISCOUNT}) / c1
           + ({KN_DISCOUNT} * n1p_fwd / c1) * (n1p_bwd / n_types)
       )) / sum(k)) END AS mean_neg_logprob
FROM doc_bi
JOIN model USING (w1, w2)
JOIN ctx USING (w1)
JOIN cont USING (w2)
CROSS JOIN types
GROUP BY doc_id
""",
)
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM filter (Kneser & Ney 1995; the
    smoothing every production n-gram LM actually ships): per-token
    surprisal under

        P_KN(w₂|w₁) = (c(w₁w₂) − d)/c(w₁·)
                      + d·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)

    with absolute discount d = 3/4. Unlike Jelinek-Mercer
    (q_interp_logprob), the backoff mass is CONTINUATION probability —
    how many distinct contexts a word follows — not raw frequency, so
    high-count-but-single-context tokens ("francisco") stop inflating
    the backoff. Scored on the training corpus itself every bigram has
    c ≥ 1 > d, so the discounted term never clips and no unseen-event
    branch is needed (the oracle's max() is therefore omitted on both
    sides). d = 3/4 is dyadic: c12 − d is exact in both engines; only
    the final ln rounds (4 dp, the established log-sum discipline).

    Plan: the per-doc bigram counts are the session memo shared with
    the LM siblings (`doc_bigram_counts_memo`, built once from the
    zip_with pair builder — no token-level shuffle or sort);
    the bigram model is a vocab²-bounded aggregate from
    which BOTH context statistics (c(w₁·) and the distinct-successor
    count N₁₊(w₁·)) come out of ONE groupBy(w1), the predecessor-type
    table N₁₊(·w₂) out of one groupBy(w2), and the global type count
    out of a 1-row aggregate — all broadcast back onto the per-doc
    pair counts, so the only fact-sized shuffle is the
    (doc, w1, w2) group."""
    doc_bi = doc_bigram_counts_memo(spark, sf_dir).withColumnRenamed("n", "k")
    model = doc_bi.groupBy("w1", "w2").agg(F.sum("k").cast("double").alias("c12"))
    ctx = model.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).cast("double").alias("n1p_fwd")
    )
    cont = model.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("n1p_bwd"))
    types = model.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    p_kn = (F.col("c12") - KN_DISCOUNT) / F.col("c1") + (
        F.lit(KN_DISCOUNT) * F.col("n1p_fwd") / F.col("c1")
    ) * (F.col("n1p_bwd") / F.col("n_types"))
    return (
        doc_bi.join(F.broadcast(model), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(types))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            floor_quantize(F.sum(F.col("k") * -F.log(p_kn)) / F.sum("k"), 4).alias(
                "mean_neg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_ccnet_buckets — per-language LM-score terciles (CCNet head/middle/tail)
# ---------------------------------------------------------------------------


@query(
    "q_ccnet_buckets",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS c FROM tf GROUP BY term),
tot AS (SELECT sum(c) AS t FROM vocab),
lp AS (
  SELECT doc_id, CASE WHEN abs(sum(tf * -ln(c / t)) / sum(tf)) < 4.5e9 THEN floor((sum(tf * -ln(c / t)) / sum(tf)) * 1e4 + 0.5) / 1e4 ELSE (sum(tf * -ln(c / t)) / sum(tf)) END AS mean_neg_logprob
  FROM tf JOIN vocab USING (term) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT d.doc_id,
       d.lang,
       lp.mean_neg_logprob,
       CASE NTILE(3) OVER (PARTITION BY d.lang
                           ORDER BY lp.mean_neg_logprob, d.doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM documents d JOIN lp ON d.doc_id = lp.doc_id
""",
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within
    each LANGUAGE, rank documents by their LM quality proxy (the
    corpus-unigram mean surprisal of q_unigram_logprob) and cut
    head/middle/tail terciles. Per-language ranking is the point —
    an absolute threshold would class entire low-resource languages
    as tail; the tercile gate is how CCNet keeps quality filtering
    from becoming language filtering (same per-source discipline as
    q_score_calibration, specialized to the published CCNet recipe).

    Scale shape: the LM-score subquery is q_unigram_logprob's plan
    (one explode pass, vocab-sized model broadcast back); bucketing
    adds ONE lang-partitioned NTILE window (per-partition sort, no
    global sort). Cross-engine determinism: the window orders by the
    ROUNDED score (4 dp — the granularity at which both engines
    bit-agree) with doc_id tie-break, so tercile boundaries cannot
    flip. A trained KenLM swaps into the score join without touching
    the bucketing plan."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text", "lang"])
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").cast("double").alias("c"))
    tot = vocab.agg(F.sum("c").alias("t"))
    lp = (
        tf.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            floor_quantize(
                F.sum(F.col("tf") * -F.log(F.col("c") / F.col("t"))) / F.sum("tf"), 4).alias("mean_neg_logprob")
        )
    )
    w = Window.partitionBy("lang").orderBy("mean_neg_logprob", "doc_id")
    tile = F.ntile(3).over(w)
    return (
        docs.select("doc_id", "lang")
        .join(lp, "doc_id")
        .select(
            "doc_id",
            "lang",
            "mean_neg_logprob",
            F.when(tile == 1, "head").when(tile == 2, "middle").otherwise("tail").alias("bucket"),
        )
    )
