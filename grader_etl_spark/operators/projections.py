"""Projection / extraction / scalar-expression operators
(SURVEY.md §2.2 P1–P10, §2.1 S2).

Everything here is pure column algebra — no UDFs, no shuffles. Each
query compiles to a single whole-stage-codegen'd scan+project, and the
``select`` lists drive Catalyst's column pruning down into the parquet
reader (ReadSchema shows only the referenced columns).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.functions.textnorm import WS_RE

# ---------------------------------------------------------------------------
# P1 — project + rename (main.py:134-141,164-172)
# ---------------------------------------------------------------------------


@query(
    "q_project_rename",
    oracle="""
SELECT event_id,
       user_id,
       ts                                         AS event_timestamp,
       event_type                                 AS attempt_type,
       props                                      AS passback_params,
       event_type = 'purchase'                    AS is_correct
FROM events
""",
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: select-and-rename onto the reference's statistics schema
    (lti_user_id→user_id, created_at→event_timestamp; main.py:164-172)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").alias("event_timestamp"),
        F.col("event_type").alias("attempt_type"),
        F.col("props").alias("passback_params"),
        (F.col("event_type") == "purchase").alias("is_correct"),
    )


# ---------------------------------------------------------------------------
# P2/P3 — semi-structured extraction (main.py:94-101,137-139)
# ---------------------------------------------------------------------------


@query(
    "q_json_extract",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')                  AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_val
FROM events
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: nested-key extraction from the serialized-dict column.

    The reference parses the whole dict in Python and projects 3 keys
    (main.py:137-139); ``get_json_object`` does the same JVM-side with
    no UDF. The Python-literal fallback half of safe_parse_passback
    lives in functions/passback.py (rows-only checked — DuckDB has no
    literal_eval)."""
    return load(spark, sf_dir, "events", columns=["event_id", "props"]).select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


# ---------------------------------------------------------------------------
# P2 — dual-syntax parse, exercised end-to-end (main.py:94-101)
# ---------------------------------------------------------------------------


@query(
    "q_passback_parse",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k
FROM events
""",
)
def q_passback_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: the hybrid JSON-or-Python-literal parser, proven against a
    pure-JSON oracle: odd event_ids have their props rewritten to
    Python-literal-only syntax (`{"k": 87,}` — the trailing comma is
    legal Python, illegal JSON) before parsing, so those values only
    round-trip if the literal_eval fallback recovers exactly what JSON
    parsing yields on the original string.

    Split-union plan: the literal-eval pandas UDF runs only on the
    from_json-null subset (the odd-id rows), not the whole table —
    see functions/passback.py:with_passback_parsed."""
    from grader_etl_spark.functions.passback import with_passback_parsed

    ev = load(spark, sf_dir, "events", columns=["event_id", "props"])
    dual = ev.withColumn(
        "raw",
        F.when(
            F.col("event_id") % 2 == 1, F.regexp_replace("props", r"\}$", ",}")
        ).otherwise(F.col("props")),
    )
    return with_passback_parsed(dual, "raw", "parsed").select(
        "event_id", F.col("parsed").getItem("k").alias("k")
    )


# ---------------------------------------------------------------------------
# P4 — boolean coercion with null passthrough (main.py:142-145)
# ---------------------------------------------------------------------------


@query(
    "q_cast_bool",
    oracle="""
SELECT event_id,
       CASE WHEN event_type IS NULL THEN NULL
            ELSE event_type = 'purchase' END AS is_correct
FROM events
""",
)
def q_cast_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: the reference's `None if raw is None else bool(raw)`
    (main.py:142-145) as a null-preserving boolean expression."""
    return load(spark, sf_dir, "events", columns=["event_id", "event_type"]).select(
        "event_id",
        F.when(F.col("event_type").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.col("event_type") == "purchase")
        .alias("is_correct"),
    )


# ---------------------------------------------------------------------------
# P5/P7 — date cast + formatting (main.py:288, 62/79/296/317)
# ---------------------------------------------------------------------------


@query(
    "q_date_format",
    oracle="""
SELECT event_id,
       strftime(CAST(ts AS DATE), '%Y-%m-%d')     AS event_date,
       strftime(ts, '%Y-%m-%d %H:%M:%S')          AS event_ts_text
FROM events
""",
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P7: timestamp→date cast and strftime-style formatting."""
    return load(spark, sf_dir, "events", columns=["event_id", "ts"]).select(
        "event_id",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("event_date"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts_text"),
    )


# ---------------------------------------------------------------------------
# P9 — string slice (main.py:78)
# ---------------------------------------------------------------------------


@query(
    "q_substring",
    oracle="""
SELECT doc_id,
       substring(text, 5, 10) AS text_slice,
       length(text)           AS text_len
FROM documents
""",
)
def q_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: `filename[4:14]` → 1-indexed substring(col, 5, 10)."""
    return load(spark, sf_dir, "documents", columns=["doc_id", "text"]).select(
        "doc_id",
        F.substring("text", 5, 10).alias("text_slice"),
        F.length("text").cast("long").alias("text_len"),
    )


# ---------------------------------------------------------------------------
# S2/P8 — time-range predicate with date arithmetic (main.py:104-111)
# ---------------------------------------------------------------------------

_WINDOW_END = "2024-01-20 00:00:00"


@query(
    "q_time_range_filter",
    oracle=f"""
SELECT event_id,
       user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts_text
FROM events
WHERE ts >= TIMESTAMP '{_WINDOW_END}' - INTERVAL 7 DAY
  AND ts <  TIMESTAMP '{_WINDOW_END}'
""",
)
def q_time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+P8: the 7-day sliding fetch window (`now - timedelta(days=7)`,
    main.py:104-111) as a pushed-down range predicate.

    Uses load_events_range, which applies the bounds to the raw
    epoch-nanos long BEFORE the timestamp conversion — `.explain`
    shows GreaterThanOrEqual/LessThan on ts in PushedFilters (a filter
    on the converted column would not push through the expression), so
    row-group stats skip data and a date-partitioned 100 TB store
    would prune to 7 days of files before any task launches."""
    from grader_etl_spark.io import load_events_range

    return load_events_range(
        spark, sf_dir, start="2024-01-13", end="2024-01-20", columns=["event_id", "user_id", "ts"]
    ).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts_text"),
    )


@query(
    "q_complex_types",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
  FROM documents
)
SELECT doc_id,
       struct_pack(chars := n_chars, lang := lang).chars       AS meta_chars,
       struct_pack(chars := n_chars, lang := lang).lang        AS meta_lang,
       MAP(['words'], [CAST(len(toks) AS BIGINT)])['words'][1] AS stats_words,
       array_to_string(list_slice(toks, 1, 3), ' ')            AS first3,
       list_contains(toks, 'the')                              AS has_the,
       list_sort(toks)[1]                                      AS min_token,
       CAST(len(list_distinct(toks)) AS BIGINT)                AS n_uniq_tokens
FROM t
""",
)
def q_complex_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type breadth: build struct and map columns, extract
    fields/values, and exercise the array toolkit (slice / sort /
    contains / distinct) in one codegen'd projection. The reference
    has exactly one nested value (the stringly passback map,
    main.py:94-101); this pins the full complex-type algebra a
    training-data schema (typed metadata structs, tag maps, token
    arrays) needs — all JVM-side, map-only, no shuffle. The struct and
    map are assembled then immediately field-accessed so the oracle
    compares scalar columns, exercising construction AND extraction."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])
    toks = F.split(F.trim("text"), WS_RE)
    meta = F.struct(F.col("n_chars").alias("chars"), F.col("lang").alias("lang"))
    stats = F.map_from_arrays(
        F.array(F.lit("words")), F.array(F.size(toks).cast("long"))
    )
    return docs.select(
        "doc_id",
        meta.getField("chars").alias("meta_chars"),
        meta.getField("lang").alias("meta_lang"),
        F.element_at(stats, "words").alias("stats_words"),
        # concat_ws flattens a NULL array to '' — guard so NULL text
        # keeps NULL first3 like the oracle's array_to_string(NULL).
        F.when(toks.isNotNull(), F.concat_ws(" ", F.slice(toks, 1, 3))).alias("first3"),
        F.array_contains(toks, "the").alias("has_the"),
        F.element_at(F.array_sort(toks), 1).alias("min_token"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
    )


# ---------------------------------------------------------------------------
# P18 — VARIANT semi-structured extraction (Spark 4 open type)
# ---------------------------------------------------------------------------


@query(
    "q_variant_extract",
    oracle="""
SELECT event_id,
       json_valid(props)                         AS is_valid,
       CAST(props->>'k' AS BIGINT)               AS k_long,
       CAST(CAST(props->>'k' AS BIGINT) % 10 AS BIGINT) AS k_mod10
FROM events
""",
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``try_parse_json`` builds the binary variant once, typed fields
    come out with ``try_variant_get`` path expressions. Versus the
    P2/P3 from_json route, VARIANT needs NO schema up front (open
    schema-on-read — new upstream fields are queryable immediately)
    and the binary encoding makes repeated path reads cheaper than
    re-parsing JSON text per extraction — the right default when the
    payload schema drifts faster than the pipeline redeploys. Parse
    failures surface as a null variant (is_valid=false), the same
    quarantine contract as try_to_timestamp in the ingest transform.
    The oracle reads the identical paths with DuckDB's JSON operators
    — VARIANT is an encoding, not a semantics change, and the typed
    results must agree exactly."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "props"])
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    # NULL props is ABSENT, not malformed: is_valid NULL (json_valid's
    # SQL semantics), while a parse failure stays false (nulls shape).
    return ev.select(
        "event_id",
        F.when(F.col("props").isNotNull(), v.isNotNull()).alias("is_valid"),
        k.alias("k_long"),
        (k % 10).cast("long").alias("k_mod10"),
    )


# ---------------------------------------------------------------------------
# P19 — collation-aware comparison (Spark 4 collations)
# ---------------------------------------------------------------------------


@query(
    "q_collation_distinct",
    oracle="""
SELECT p_brand,
       CAST(COUNT(DISTINCT p_name) AS BIGINT)        AS names_cs,
       CAST(COUNT(DISTINCT lower(p_name)) AS BIGINT) AS names_ci,
       CAST(COUNT(DISTINCT p_name)
            - COUNT(DISTINCT lower(p_name)) AS BIGINT) AS case_only_variants
FROM part
GROUP BY p_brand
""",
)
def q_collation_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive distinct counting through Spark 4 COLLATIONS
    (``collate(col, 'UTF8_LCASE')``) next to the binary-collation
    count — the entity-normalization probe ("how much of this
    dimension's cardinality is just casing?"). Collation beats the
    lower() rewrite at scale because the comparison semantics live in
    the TYPE: every downstream groupBy/join/sort on the collated
    column is case-insensitive without re-wrapping each use, and
    locale-correct for non-ASCII case pairs lower() mishandles
    (Turkish dotless-i being the canonical example). On this ASCII
    fixture the two agree exactly, which is what lets DuckDB's
    lower() serve as the oracle."""
    parts = load(spark, sf_dir, "part", columns=["p_brand", "p_name"])
    ci = F.countDistinct(F.collate(F.col("p_name"), "UTF8_LCASE"))
    cs = F.countDistinct("p_name")
    return parts.groupBy("p_brand").agg(
        cs.alias("names_cs"),
        ci.alias("names_ci"),
        (cs - ci).cast("long").alias("case_only_variants"),
    )
