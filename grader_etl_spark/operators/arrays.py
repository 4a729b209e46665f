"""Array / higher-order-function breadth — explode (table-generating),
lambda transforms, and order-exact array aggregation.

These are the column-type primitives every LLM-data operator in this
repo builds on (shingles, MinHash, embeddings); here they are exposed
as first-class oracle-checked queries so the surface itself is pinned,
not just its compositions. All lambdas run inside codegen on the JVM —
no Python. (The reference has no array types at all — SURVEY §1.1 —
so these are *(ext)* north-star operators.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load, valid_vectors, VALID_EMBEDDINGS_SQL
from grader_etl_spark.registry import query
from grader_etl_spark.functions.quantize import floor_quantize


@query(
    "q_explode_tokens",
    oracle="""
SELECT token, count(*) AS cnt
FROM (
  SELECT unnest(string_split(text, ' ')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
""",
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency: split → explode (one row per
    token) → count → top-20. Explode is Spark's UNNEST/flat-map; the
    count aggregates map-side partially before the single shuffle, so
    the exploded blow-up (~n_words × n_docs rows) never crosses the
    network unreduced — the property that keeps word-count shaped
    jobs viable at 100 TB."""
    docs = load(spark, sf_dir, "documents", columns=["text"])
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


@query(
    "q_array_algebra",
    oracle=f"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS sum_milli,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
       CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS norm2_milli
FROM {VALID_EMBEDDINGS_SQL}
""",
)
def q_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row array algebra over embeddings: length, elementwise
    transform, filter, and fold — the transform/filter/aggregate
    higher-order trio. Sums are computed on round(x*1000) integers so
    they are exactly representable and order-independent (float
    accumulation order would differ between engines); the float32 →
    float64 widening is exact on both sides, making the oracle
    bit-stable."""
    emb = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    as_d = lambda x: x.cast("double")  # noqa: E731
    milli = F.transform("embedding", lambda x: F.round(as_d(x) * 1000).cast("long"))
    sq_milli = F.transform("embedding", lambda x: F.round(as_d(x) * as_d(x) * 1000).cast("long"))
    fold = lambda arr: F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + x)  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        fold(milli).alias("sum_milli"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
        fold(sq_milli).alias("norm2_milli"),
    )


# ---------------------------------------------------------------------------
# P21 — map higher-order algebra (map_from_entries / map_zip_with / map_filter)
# ---------------------------------------------------------------------------


@query(
    "q_map_algebra",
    oracle="""
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CASE WHEN abs(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) < 4.5e9 THEN floor((CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 ELSE (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) END AS avg_value
FROM events
GROUP BY user_id, event_type
HAVING COUNT(*) >= 3
""",
)
def q_map_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed higher-order algebra, value-pinned end to end: per
    user the (event_type → count) and (event_type → sum) maps are
    built with map_from_entries over sorted collected entries, joined
    key-wise with map_zip_with into per-type averages, pruned with
    map_filter (count ≥ 3), and exploded back to rows. The oracle is
    the plain grouped aggregate — proving the entire map pipeline
    (construction, key-aligned zip, filter, explosion) loses and
    invents nothing. This is the typed-metadata manipulation layer a
    multimodal/training-data schema leans on (P15's construction
    breadth, now with the map TRANSFORMATION half). All lambdas are
    codegen'd JVM expressions; the only shuffle is the per-user
    aggregate, and map sizes are bounded by |event_types|."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_type", "value"])
    # A NULL event_type is a legal GROUP BY key but an ILLEGAL map key
    # (map_from_entries throws) — sentinel-encode it through the map
    # and decode back to NULL at the explode, so the NULL group
    # survives the map round-trip exactly like the oracle's plain
    # grouped aggregate (nulls fuzz shape). Collision assumption: no
    # NATURAL event_type ever equals the sentinel — it embeds NUL
    # bytes, which no tokenizer/ingest path emits; ENFORCED, not
    # hoped: a natural key carrying a NUL byte raises per-row
    # (raise_error, codegen'd) instead of being silently decoded
    # back to NULL at the explode.
    _NK = "\x00null\x00"
    nat = F.col("event_type")
    encoded = (
        F.when(nat.isNull(), F.lit(_NK))
        .when(
            nat.contains("\x00"),
            F.raise_error(
                F.concat(
                    F.lit("q_map_algebra: natural event_type contains NUL "
                          "(sentinel collision): "),
                    nat,
                )
            ),
        )
        .otherwise(nat)
    )
    per_type = ev.groupBy(
        "user_id", encoded.alias("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("counts"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "total")))
        ).alias("sums"),
    )
    stats = maps.select(
        "user_id",
        F.map_filter(
            F.map_zip_with(
                "counts",
                "sums",
                lambda k, n, s: F.struct(
                    n.alias("n"), s.alias("total"), floor_quantize(s / n, 6).alias("avg_value")
                ),
            ),
            lambda k, v: v.getField("n") >= 3,
        ).alias("m"),
    )
    return stats.select(
        "user_id", F.explode("m").alias("event_type", "s")
    ).select(
        "user_id",
        F.nullif("event_type", F.lit(_NK)).alias("event_type"),
        F.col("s.n").alias("n"),
        F.col("s.total").alias("total"),
        F.col("s.avg_value").alias("avg_value"),
    )
