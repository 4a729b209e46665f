"""Similarity search over the ``embeddings`` table (north star,
BASELINE.json): brute-force cosine top-k as the exact baseline, and a
random-hyperplane-LSH bucketed variant as the scale path.

Scale shape: brute force is query-count × corpus — fine when the
query set is small and broadcast (as here: queries broadcast, corpus
streams, TakeOrderedAndProject keeps k per partition). The LSH
variant turns the corpus scan into an equi-join on signature buckets,
so a 100 TB corpus only compares within matching buckets; recall vs
the exact baseline is asserted in tests/test_similarity.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from grader_etl_spark.functions.literals import lit_doubles
from grader_etl_spark.io import fan_out, load, valid_vectors, VALID_EMBEDDINGS_SQL
from grader_etl_spark.operators.llm_dedup import dot, with_norm
from grader_etl_spark.registry import query

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5

# Deterministic pseudo-random hyperplanes for the LSH variant,
# multi-table (OR-amplified): each of LSH_TABLES independent tables
# hashes with LSH_PLANES_PER_TABLE hyperplanes (AND within a table);
# a pair is a candidate if it collides in ANY table. AND-bits control
# precision (bucket size), OR-tables recover recall — the standard
# (b, L) trade; recall vs the exact baseline is pinned by
# tests/test_similarity.py.
LSH_TABLES = 6
LSH_PLANES_PER_TABLE = 4
_DIM = 64


def _lcg_stream(n: int, seed: int) -> list[float]:
    out, x = [], seed & 0x7FFFFFFF
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x / float(1 << 30) - 1.0)
    return out

# _PLANES[t][p] = hyperplane p of table t.
_PLANES: list[list[list[float]]] = [
    [_lcg_stream(_DIM, seed=7919 * (t * LSH_PLANES_PER_TABLE + p + 1)) for p in range(LSH_PLANES_PER_TABLE)]
    for t in range(LSH_TABLES)
]


def _as_double_array(emb: Column) -> Column:
    return F.transform(emb, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query; norms precomputed per vector so each
    (query, doc) pair pays one dot product.
    Columns: query_id, neighbor_id, rank, cosine."""
    # try_divide: zero-norm vectors have NULL cosine (DuckDB /0), not the ANSI throw
    cos = F.try_divide(dot(F.col("q.v"), F.col("c.v")), F.col("q.norm") * F.col("c.norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        with_norm(corpus).alias("c")
        .join(F.broadcast(with_norm(queries).alias("q")), F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


@query(
    "q_ann_cosine",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {VALID_EMBEDDINGS_SQL}
),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id,
         c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v)
           / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_dot_product(q.v, c.v)
                    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC NULLS LAST,
                    c.vec_id
         ) AS rank
  FROM q JOIN e c ON q.vec_id != c.vec_id
)
SELECT query_id, neighbor_id, rank, cosine
FROM scored WHERE rank <= {TOP_K}
""",
)
def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{TOP_K} for the first {N_QUERIES} vectors —
    the exact ANN baseline, oracle-checked value-for-value."""
    e = fan_out(valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))).select(
        "vec_id", _as_double_array(F.col("embedding")).alias("v")
    )
    qs = e.filter(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(e, qs).select("query_id", "neighbor_id", "rank", "cosine")


def lsh_buckets(v: Column) -> Column:
    """All LSH_TABLES bucket ids for a vector, as an array to explode.

    Table t's bucket id: bit p = sign(v · plane_{t,p}), offset by
    t << LSH_PLANES_PER_TABLE so bucket ids never collide across
    tables (lets the candidate join key be a single int column).

    Built as ONE transform over the 3-D [table][plane][dim] literal
    rather than LSH_TABLES × LSH_PLANES_PER_TABLE separate fold
    expressions: the per-bit math is identical (same zip_with multiply
    + sequential-add fold, same ascending-p bit sum the oracle
    replays), but expression construction is ~15 py4j calls instead of
    ~100 (measured ~1s of driver time per query run saved)."""
    import json

    planes3d = F.from_json(
        F.lit(json.dumps(_PLANES)), "array<array<array<double>>>"
    )
    dot_p = lambda plane: F.aggregate(  # noqa: E731
        F.zip_with(v, plane, lambda x, wcol: x * wcol),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.transform(
        planes3d,
        lambda tbl, t: (t * F.lit(1 << LSH_PLANES_PER_TABLE))
        + F.aggregate(
            F.transform(
                tbl,
                lambda plane, p: F.when(
                    dot_p(plane) > 0, F.pow(F.lit(2.0), p).cast("int")
                ).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
    )


def _lsh_oracle() -> str:
    """Value oracle that replays the full LSH pipeline in DuckDB: the
    24 hyperplanes are embedded as double literals (exact — LCG values
    are dyadic rationals x/2³⁰−1, and repr round-trips doubles), the
    bucket bit is the sign of the same sequential-fold dot product
    (list_dot_product ≡ the Spark zip_with/aggregate fold, the
    q_ann_cosine precedent), so the candidate sets — and therefore the
    re-ranked top-k — agree exactly. A sign flip would need a dot
    product to land WITHIN one ulp of 0.0 across engines computing
    identical op sequences — not a legal divergence, unlike the
    float-iterative k-means layout that keeps q_ann_ivf rows-only."""
    sigs = []
    for t in range(LSH_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(v, {_PLANES[t][p]!r}) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(LSH_PLANES_PER_TABLE)
        )
        sigs.append(f"{t << LSH_PLANES_PER_TABLE} + {bits}")
    buckets = ", ".join(sigs)
    cos = (
        "list_dot_product(qe.v, ce.v) / "
        "(sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v)))"
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {VALID_EMBEDDINGS_SQL}),
b AS (SELECT vec_id, bucket FROM e, unnest([{buckets}]) AS u(bucket)),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
scored AS (
  SELECT query_id, neighbor_id, {cos} AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY {cos} DESC NULLS LAST, neighbor_id) AS rank
  FROM cand JOIN e qe ON qe.vec_id = query_id JOIN e ce ON ce.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine FROM scored WHERE rank <= {TOP_K}
"""


@query("q_ann_lsh", oracle=_lsh_oracle())
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH ANN: candidates = pairs
    colliding in ANY of the {LSH_TABLES} tables (equi-join on bucket id
    — this is what replaces the corpus cross join at scale), exact
    cosine re-rank of the deduped candidates, top-{TOP_K} per query.
    Recall vs q_ann_cosine is asserted in tests/test_similarity.py."""
    e = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])).select(
        "vec_id", _as_double_array(F.col("embedding")).alias("v")
    )
    buckets = e.select("vec_id", F.explode(lsh_buckets(F.col("v"))).alias("bucket"))
    q_buckets = buckets.filter(F.col("vec_id") < N_QUERIES)
    cands = (
        buckets.alias("c")
        .join(
            F.broadcast(q_buckets.alias("q")),
            (F.col("q.bucket") == F.col("c.bucket")) & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(F.col("q.vec_id").alias("query_id"), F.col("c.vec_id").alias("neighbor_id"))
        .distinct()
    )
    en = with_norm(e)
    qv = en.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn"))
    cv = en.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("norm").alias("cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.try_divide(dot(F.col("qv"), F.col("cv")), F.col("qn") * F.col("cn")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


IVF_NPROBE = 2
# Same iteration budget as clustering.ITERATIONS so the IVF index and
# the standalone k-means query share ONE trained quantizer (the
# centroid memo keys on (corpus, k, iterations)).
IVF_TRAIN_ITERS = 5


# No oracle possible: the cell layout comes from the float-iterative
# k-means trainer (see q_kmeans_embeddings' note — cross-engine float
# reduction order), and nprobe pruning inherits any cell-boundary
# difference. Recall vs exact top-k is bounded in
# tests/test_similarity.py instead.
@query("q_ann_ivf", oracle=None)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: the k-means coarse quantizer
    (clustering.kmeans) partitions the corpus into K cells; each query
    probes its IVF_NPROBE nearest cells and exact-cosine re-ranks only
    those cells' vectors. This is the third point on the ANN
    cost/recall curve alongside brute force (q_ann_cosine: exact,
    query×corpus) and hyperplane LSH (q_ann_lsh: bucket equi-join):
    at 100 TB the cell assignment is a write-time partition key, so a
    probe reads nprobe/K of the corpus — partition pruning does the
    candidate generation for free at scan time.

    Cell selection is a codegen'd expression: K centroid distances →
    array of (dist, cell) structs → array_sort → slice nprobe — no
    UDF, no explode of the full distance matrix. Recall vs the exact
    baseline is asserted in tests/test_similarity.py."""
    from grader_etl_spark.operators.clustering import K, kmeans

    emb = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    assigned, centroids = kmeans(
        emb, k=K, iterations=IVF_TRAIN_ITERS, cache_key=(sf_dir, "embeddings")
    )
    # Persist: the cell-assigned corpus feeds the probe computation,
    # its broadcast, and the candidate join — without this the K
    # distance/argmin expressions re-evaluate once per consumer.
    corpus = with_norm(
        assigned.select("vec_id", "cluster", _as_double_array(F.col("embedding")).alias("v"))
    ).persist()

    qv = corpus.filter(F.col("vec_id") < N_QUERIES)
    dist_structs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("v"),
                        lit_doubles(c),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probes = qv.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(
            F.slice(F.array_sort(dist_structs), 1, IVF_NPROBE)
        ).alias("probe"),
    ).select("query_id", "qv", "qn", F.col("probe.cell").alias("cell"))

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        corpus.join(
            F.broadcast(probes),
            (F.col("cluster") == F.col("cell")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.try_divide(dot(F.col("qv"), F.col("v")), F.col("qn") * F.col("norm")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


@query(
    "q_embedding_quantize",
    oracle=f"""
WITH scaled AS (
  SELECT vec_id,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS maxabs,
         CAST(embedding AS DOUBLE[]) AS v
  FROM {VALID_EMBEDDINGS_SQL}
)
SELECT vec_id,
       CASE WHEN abs(maxabs) < 4.5e9 THEN floor((maxabs) * 1e6 + 0.5) / 1e6 ELSE (maxabs) END AS scale6,
       array_to_string(list_transform(v, x -> CAST(round(x * 127.0 / maxabs) AS INT)), ',') AS q_codes,
       CAST(list_sum(list_transform(v, x -> abs(CAST(round(x * 127.0 / maxabs) AS INT))))
            AS BIGINT) AS l1_q
FROM scaled
WHERE maxabs > 0
""",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the storage-ETL pass
    that cuts a float32 embedding column 4× before writing a corpus
    (dequantize: x ≈ q * maxabs / 127). Pure higher-order array
    expressions (transform/array_max/aggregate), fully codegen'd, no
    UDF, no shuffle at all — a map-only pass, which is exactly what a
    100 TB re-encode job must be. Both engines compute the identical
    IEEE double ops, so the quantized codes match bit-exact."""
    e = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])).select(
        "vec_id", _as_double_array(F.col("embedding")).alias("v")
    )
    maxabs = F.array_max(F.transform("v", lambda x: F.abs(x)))
    e = e.withColumn("maxabs", maxabs).filter(F.col("maxabs") > 0)
    q = F.transform("v", lambda x: F.round(x * 127.0 / F.col("maxabs")).cast("int"))
    return e.select(
        "vec_id",
        floor_quantize("maxabs", 6).alias("scale6"),
        F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))).alias("q_codes"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x).cast("long")
        ).alias("l1_q"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion: lexical (BM25) ⊕ dense (cosine) retrieval
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_TOP = 20


def _rrf_oracle() -> str:
    from grader_etl_spark.registry import REGISTRY

    bm25_sql = REGISTRY["q_bm25"].oracle
    return f"""
WITH text_scores AS (
  SELECT doc_id, CASE WHEN abs(sum(bm25)) < 4.5e9 THEN floor((sum(bm25)) * 1e4 + 0.5) / 1e4 ELSE (sum(bm25)) END AS text_score
  FROM ({bm25_sql}) GROUP BY doc_id
),
text_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY text_score DESC, doc_id) AS tr
  FROM text_scores
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {VALID_EMBEDDINGS_SQL}),
qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
vec_rank AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (
           ORDER BY CASE WHEN abs(list_dot_product(v, q)
                    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q)))) < 4.5e9 THEN floor((list_dot_product(v, q)
                    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q)))) * 1e6 + 0.5) / 1e6 ELSE (list_dot_product(v, q)
                    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q)))) END DESC NULLS LAST,
                    vec_id) AS vr
  FROM e CROSS JOIN qv WHERE vec_id <> 0
)
SELECT doc_id,
       CAST(tr AS BIGINT) AS text_rank,
       CAST(vr AS BIGINT) AS vec_rank,
       CASE WHEN abs(COALESCE(1.0 / ({RRF_K} + tr), 0.0)
             + COALESCE(1.0 / ({RRF_K} + vr), 0.0)) < 4.5e9 THEN floor((COALESCE(1.0 / ({RRF_K} + tr), 0.0)
             + COALESCE(1.0 / ({RRF_K} + vr), 0.0)) * 1e6 + 0.5) / 1e6 ELSE (COALESCE(1.0 / ({RRF_K} + tr), 0.0)
             + COALESCE(1.0 / ({RRF_K} + vr), 0.0)) END AS rrf
FROM text_rank FULL OUTER JOIN vec_rank USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT {RRF_TOP}
"""


@query("q_rank_fusion", oracle=None)  # oracle assigned below (needs q_bm25 registered first)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the lexical
    ranking (summed BM25 over the fixed query terms) and the dense
    ranking (cosine to the query vector, doc_id ≡ vec_id) merge as
    Σ 1/(60 + rank) — rank-space fusion needs no score calibration
    between the two retrievers, which is why RRF is the default
    hybrid-search combiner. Both rank windows run over CANDIDATE
    lists (retriever outputs, thousands of rows at most), so the
    unpartitioned row_number sort is bounded regardless of corpus
    size; the full-outer join unions the candidate sets and absent
    ranks contribute 0. Scores rounded before ranking so engine ulps
    can't swap adjacent ranks."""
    from grader_etl_spark.operators.corpus_filters import q_bm25

    text_scores = (
        q_bm25(spark, sf_dir)
        .groupBy("doc_id")
        .agg(floor_quantize(F.sum("bm25"), 4).alias("text_score"))
    )
    text_rank = text_scores.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("text_score"), F.asc("doc_id")))
        .cast("long")
        .alias("tr"),
    )
    e = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])).select(
        "vec_id", _as_double_array(F.col("embedding")).alias("v")
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("q"), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.zip_with(c, c, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    )
    cos = floor_quantize(F.try_divide(dot, norm(F.col("v")) * norm(F.col("q"))), 6)
    vec_rank = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cos.alias("cosine"),
        )
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), F.asc("doc_id")))
            .cast("long")
            .alias("vr"),
        )
    )
    fused = (
        text_rank.join(vec_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("tr").alias("text_rank"),
            F.col("vr").alias("vec_rank"),
            floor_quantize(
                F.coalesce(1.0 / (RRF_K + F.col("tr")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("vr")), F.lit(0.0)), 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(RRF_TOP)
    )
    return fused


# Late-bind the oracle: q_bm25's SQL is registered by corpus_filters —
# imported here explicitly so importing THIS module alone works too
# (not only through load_all_operators' ordering).
from grader_etl_spark import registry as _registry  # noqa: E402
from grader_etl_spark.operators import corpus_filters as _corpus_filters  # noqa: E402,F401
from grader_etl_spark.functions.quantize import floor_quantize

_registry.REGISTRY["q_rank_fusion"] = _registry.QuerySpec(
    name="q_rank_fusion",
    fn=q_rank_fusion,
    oracle=_rrf_oracle(),
    doc=q_rank_fusion.__doc__ or "",
)


# ---------------------------------------------------------------------------
# q_embedding_norm_outliers — corpus hygiene for the vector table
# ---------------------------------------------------------------------------


@query(
    "q_embedding_norm_outliers",
    oracle=f"""
WITH norms AS (
  SELECT vec_id,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM {VALID_EMBEDDINGS_SQL}
),
stats AS (
  SELECT avg(norm) AS mu, stddev_samp(norm) AS sigma FROM norms
)
SELECT vec_id,
       CASE WHEN abs(norm) < 4.5e9 THEN floor((norm) * 1e6 + 0.5) / 1e6 ELSE (norm) END AS norm6,
       CASE WHEN abs((norm - mu) / sigma) < 4.5e9 THEN floor(((norm - mu) / sigma) * 1e4 + 0.5) / 1e4 ELSE ((norm - mu) / sigma) END AS z
FROM norms CROSS JOIN stats
WHERE ABS((norm - mu) / sigma) > 2.0
""",
)
def q_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene: vectors whose L2 norm sits >2σ from the
    corpus mean — the standard screen for truncated/zeroed/exploded
    embeddings before they poison ANN indexes or cosine thresholds.
    One scan computes norms; the 1-row (μ, σ) aggregate broadcasts
    back onto the same frame (the norms subtree is tiny — vec_id +
    one double — so the double evaluation Catalyst keeps is two scans
    of two pruned columns, not a window over the corpus)."""
    e = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(
                _as_double_array(F.col("embedding")),
                _as_double_array(F.col("embedding")),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    norms = e.select("vec_id", norm.alias("norm"))
    stats = norms.agg(
        F.avg("norm").alias("mu"), F.stddev_samp("norm").alias("sigma")
    )
    z = (F.col("norm") - F.col("mu")) / F.col("sigma")
    return (
        norms.crossJoin(F.broadcast(stats))
        .filter(F.abs(z) > 2.0)
        .select("vec_id", floor_quantize("norm", 6).alias("norm6"), floor_quantize(z, 4).alias("z"))
    )


# ---------------------------------------------------------------------------
# L60 — label centroids (distributed element-wise mean pooling)
# ---------------------------------------------------------------------------


@query(
    "q_label_centroids",
    oracle=f"""
SELECT label,
       CAST(i - 1 AS BIGINT) AS dim,
       CASE WHEN abs(AVG(CAST(v AS DOUBLE))) < 4.5e9 THEN floor((AVG(CAST(v AS DOUBLE))) * 1e6 + 0.5) / 1e6 ELSE (AVG(CAST(v AS DOUBLE))) END AS mean_val
FROM (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM {VALID_EMBEDDINGS_SQL}
)
GROUP BY label, i
""",
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean of embeddings per label — distributed mean
    pooling, the centroid/prototype computation behind class-prototype
    retrieval and cluster summarization. posexplode unrolls (label,
    dim, value) triples MAP-SIDE and the hash aggregate's partial
    combine collapses them to |labels|×dim running (sum, count) states
    per task before any shuffle — so the exchange carries a
    centroid-matrix-sized payload regardless of corpus row count. The
    k-means trainer (clustering.py) keeps its bounded driver sample
    because it needs ITERATED means; this one-shot pooling needs no
    driver at all."""
    emb = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]))
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", F.col("dim").cast("long").alias("dim"))
        .agg(floor_quantize(F.avg(F.col("v").cast("double")), 6).alias("mean_val"))
    )


@query(
    "q_nearest_centroid_confusion",
    oracle=f"""
WITH cent AS (
  SELECT label, i - 1 AS dim, CASE WHEN abs(avg(CAST(v AS DOUBLE))) < 4.5e9 THEN floor((avg(CAST(v AS DOUBLE))) * 1e6 + 0.5) / 1e6 ELSE (avg(CAST(v AS DOUBLE))) END AS c
  FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM {VALID_EMBEDDINGS_SQL})
  GROUP BY label, i - 1
),
dists AS (
  SELECT x.vec_id, x.label AS true_label, cent.label AS cand,
         CASE WHEN abs(SUM((CAST(x.v AS DOUBLE) - cent.c)
                   * (CAST(x.v AS DOUBLE) - cent.c))) < 4.5e9 THEN floor((SUM((CAST(x.v AS DOUBLE) - cent.c)
                   * (CAST(x.v AS DOUBLE) - cent.c))) * 1e6 + 0.5) / 1e6 ELSE (SUM((CAST(x.v AS DOUBLE) - cent.c)
                   * (CAST(x.v AS DOUBLE) - cent.c))) END AS d
  FROM (SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(embedding, 1) - 1 AS dim
        FROM {VALID_EMBEDDINGS_SQL}) x
  JOIN cent ON cent.dim = x.dim
  GROUP BY x.vec_id, x.label, cent.label
),
assigned AS (
  SELECT vec_id, true_label,
         min_by(cand, lpad(CAST(d AS VARCHAR), 24, '0') || '-' ||
                      lpad(CAST(cand AS VARCHAR), 8, '0')) AS predicted
  FROM dists GROUP BY vec_id, true_label
)
SELECT CAST(true_label AS BIGINT) AS true_label,
       CAST(predicted AS BIGINT)  AS predicted,
       CAST(COUNT(*) AS BIGINT)   AS n_vectors
FROM assigned GROUP BY 1, 2
""",
)
def q_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification eval: every embedding is
    assigned to the closest label centroid (mean pooling per label —
    the q_label_centroids computation) and the (true, predicted)
    confusion matrix comes back — the separability probe run before
    trusting embeddings for filtering/retrieval; diagonal mass =
    classes the embedding space actually distinguishes.

    Plan: centroids reduce to a |labels|-row frame (collected
    dim-sorted, like the k-means trainer's bounded driver budget —
    labels×dim doubles), broadcast against the corpus; the distance is
    one codegen'd zip_with/aggregate fold per (vector, label); argmin
    via min_by on the 6-dp-rounded distance with a label tie-break, so
    boundary assignments are bit-stable across engines (the oracle
    replays the identical rounding and tie-break through a sortable
    string key). Output is |labels|²-sized."""
    emb = valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]))
    cent = (
        q_label_centroids(spark, sf_dir)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
                lambda s: s.getField("mean_val"),
            ).alias("centroid")
        )
        .select(F.col("label").alias("cand"), "centroid")
    )
    vd = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    d = floor_quantize(
        F.aggregate(
            F.zip_with("v", "centroid", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ), 6)
    dists = vd.join(F.broadcast(cent)).select(
        "vec_id", "true_label", "cand", d.alias("d")
    )
    assigned = dists.groupBy("vec_id", "true_label").agg(
        F.min_by(
            "cand",
            F.concat_ws(
                "-",
                F.lpad(F.col("d").cast("string"), 24, "0"),
                F.lpad(F.col("cand").cast("string"), 8, "0"),
            ),
        ).alias("predicted")
    )
    return assigned.groupBy(
        F.col("true_label").cast("long").alias("true_label"),
        F.col("predicted").cast("long").alias("predicted"),
    ).agg(F.count(F.lit(1)).alias("n_vectors"))


# ---------------------------------------------------------------------------
# q_hard_negatives — contrastive-training negative mining (L91)
# ---------------------------------------------------------------------------

HN_K = 5  # hard negatives per query


@query(
    "q_hard_negatives",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM {VALID_EMBEDDINGS_SQL}
),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id  AS query_id,
         q.label   AS query_label,
         c.vec_id  AS negative_id,
         c.label   AS negative_label,
         list_dot_product(q.v, c.v)
           / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_dot_product(q.v, c.v)
                    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC NULLS LAST,
                    c.vec_id
         ) AS rank
  FROM q JOIN e c ON q.label != c.label
)
SELECT query_id, query_label, negative_id, negative_label, rank, cosine
FROM scored WHERE rank <= {HN_K}
""",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive training (the DPR/SimCSE
    data-prep step): for each query vector, the {HN_K} most cosine-
    similar vectors with a DIFFERENT label — near the decision
    boundary, which is exactly what makes them informative negatives;
    random negatives are trivially separable and teach nothing.

    Plan shape: q_ann_cosine's broadcast-query brute-force scorer
    with the label inequality applied IN the join condition (a
    negative candidate is filtered before ranking, not after — the
    rank window sees only eligible pairs). At scale the scorer swaps
    for the IVF path exactly as q_ann_cosine→q_ann_ivf documents:
    probe nprobe cells, drop same-label candidates in the cell, rank
    the rest; the label filter commutes with cell pruning. Label here
    stands in for the positive-pair relation (same-document spans,
    query-passage links) — swapping the relation changes the join
    key, not the plan."""
    e = fan_out(valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]))).select(
        "vec_id", "label", _as_double_array(F.col("embedding")).alias("v")
    )
    qs = e.filter(F.col("vec_id") < N_QUERIES)
    # try_divide: zero-norm vectors have NULL cosine (DuckDB /0), not the ANSI throw
    cos = F.try_divide(dot(F.col("q.v"), F.col("c.v")), F.col("q.norm") * F.col("c.norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("negative_id"))
    return (
        with_norm(e).alias("c")
        .join(F.broadcast(with_norm(qs).alias("q")), F.col("q.label") != F.col("c.label"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("q.label").alias("query_label"),
            F.col("c.vec_id").alias("negative_id"),
            F.col("c.label").alias("negative_label"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= HN_K)
    )


# ---------------------------------------------------------------------------
# q_ann_recall — IVF/LSH serving quality audit (V10)
# ---------------------------------------------------------------------------


@query("q_ann_recall", oracle=None)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the IVF ANN path against exact brute force,
    per query — the serving-quality audit that closes the ANN family
    the way V9 closes MinHash: the approximate index answers
    production traffic, the exact scorer answers a validation sample,
    and THIS query is their standing comparison (re-run per index
    rebuild; a recall drop means the quantizer no longer fits the
    corpus). Both sides are existing session plans (the IVF cell memo
    and the broadcast brute-force scorer); the audit join is key-only
    on (query, neighbor). Rows-only: the IVF side inherits k-means'
    float-order sensitivity (the documented reason q_ann_ivf itself
    is rows-only); pytest bounds mean recall from below instead."""
    from grader_etl_spark.operators.similarity import q_ann_cosine, q_ann_ivf

    exact = q_ann_cosine(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("exact_neighbor")
    )
    approx = q_ann_ivf(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (F.col("exact_neighbor") == F.col("ivf_neighbor")),
        "left",
    ).select(exact.query_id.alias("qid"), F.col("ivf_neighbor").isNotNull().alias("hit"))
    return (
        hits.groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("n_hit"),
        )
        .select(
            "query_id",
            "k",
            "n_hit",
            floor_quantize(F.col("n_hit").cast("double") / F.col("k"), 4).alias("recall"),
        )
    )
