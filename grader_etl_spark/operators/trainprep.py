"""Training-corpus preparation beyond measurement: operators that
REWRITE the corpus the way a pretraining pipeline does before
tokenization — substring-level dedup with document reconstruction
(RefinedWeb-style), semantic dedup within embedding clusters
(SemDeDup, Abbas et al. 2023, arXiv:2303.09540), and a distributed
BPE tokenizer trainer (Sennrich et al. 2016, arXiv:1508.07909).

The reference stops at row-level upsert dedup
(/root/reference/main.py:196-204, ON CONFLICT DO NOTHING); these are
the corpus-scale generalizations the north-star pipeline needs
(SURVEY.md §2.9).

Scale shapes:

* chunk-dedup-rewrite moves the corpus text through exactly ONE
  shuffle (the rebuild join); the global first-occurrence decision
  rides a hash-only frame (doc_id, idx, md5) so the wide dedup
  exchange never carries text.
* SemDeDup is pairwise ONLY within a cluster: cost Σ|c|², never n².
  Cluster size is capped by the upstream clusterer (here the fixture
  ``label``), which is the published algorithm's own knob.
* the BPE trainer's per-merge jobs run over the WORD VOCABULARY
  (heavy-hitter compressed via one groupBy over the corpus), not the
  corpus: each round is a pair-count partial-agg + one argmax row to
  the driver + a codegen'd fold rewrite of the symbol arrays.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from grader_etl_spark.io import fan_out, load, valid_vectors, VALID_EMBEDDINGS_SQL
from grader_etl_spark.operators.llm_dedup import dot, with_norm
from grader_etl_spark.registry import checkpoint_frame, query
from grader_etl_spark.functions.quantize import floor_quantize

CHUNK_WORDS = 8  # words per dedup chunk (non-overlapping)
SEMDEDUP_TAU = 0.30  # cosine threshold within a cluster
BPE_MERGES = 6  # merge rounds the trainer runs

# The "shipped tokenizer" q_bpe_encode applies: a FIXED merge table
# (what bpe_train learns on the fixture corpus, pinned as literals so
# the encode step — the part that actually runs at corpus scale — is
# a pure function both engines can evaluate identically). Order
# matters: rule 6 merges 'm' with the token rule 1 created.
BPE_RULES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
]

MIX_BUDGET_FRAC = 0.6  # fraction of available tokens the mixture may spend


def _word_chunks(ws: Column) -> Column:
    """Non-overlapping CHUNK_WORDS-word chunks of a word array, as an
    array of space-joined strings (last chunk may be short)."""
    n_chunks_minus1 = (F.size(ws) - F.lit(1)).cast("int") / F.lit(CHUNK_WORDS)
    return F.transform(
        F.sequence(F.lit(0), F.floor(n_chunks_minus1).cast("int")),
        lambda i: F.array_join(F.slice(ws, i * CHUNK_WORDS + 1, CHUNK_WORDS), " "),
    )


@query(
    "q_chunk_dedup_rewrite",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE length(text) > 0
), ch AS (
  SELECT doc_id, i AS idx,
         array_to_string(ws[i*{CHUNK_WORDS}+1 : i*{CHUNK_WORDS}+{CHUNK_WORDS}], ' ') AS chunk
  FROM (
    SELECT doc_id, ws,
           unnest(generate_series(0, (len(ws)-1)//{CHUNK_WORDS})) AS i
    FROM w
  )
), ranked AS (
  SELECT doc_id, idx, chunk,
         row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) AS rn
  FROM ch
), rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(chunk, ' ' ORDER BY idx) AS new_text
  FROM ranked WHERE rn = 1 GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_chunks AS BIGINT)              AS n_chunks,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT)   AS n_kept,
       COALESCE(r.new_text, '')                AS new_text
FROM tot t LEFT JOIN rebuilt r USING (doc_id)
""",
)
def q_chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup WITH corpus rewrite: split every
    document into non-overlapping {CHUNK_WORDS}-word chunks, keep only
    the globally-first occurrence of each chunk (first = lowest
    (doc_id, position)), and reconstruct each document from its
    surviving chunks in original order — the RefinedWeb/C4 rewrite
    step, not just the q_chunk_dedup_ratio measurement.

    Plan discipline (100 TB): the first-occurrence decision runs on a
    PROJECTED frame of (doc_id, idx, md5(chunk)) — the window exchange
    on the hash shuffles 16-byte digests, never text. Winning
    positions then reduce to one int-array row per doc
    (collect_set(idx), map-side combined), and the rebuild is a single
    doc_id equi-join back to the original scan: the corpus text moves
    through exactly one exchange, and the in-order reconstruction is a
    codegen'd position filter + array_join, no second text shuffle
    (pinned in tests/test_trainprep.py)."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"]).filter(
        F.length("text") > 0
    )
    arr = docs.select("doc_id", _word_chunks(F.split("text", " ")).alias("chunks"))
    ch = arr.select("doc_id", F.posexplode("chunks").alias("idx", "chunk"))
    ids = ch.select("doc_id", "idx", F.md5("chunk").alias("h"))
    w = Window.partitionBy("h").orderBy("doc_id", "idx")
    keep = (
        ids.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("keep_idx"))
    )
    kept_chunks = F.filter(
        F.col("chunks"), lambda c, i: F.array_contains(F.coalesce("keep_idx", F.array()), i)
    )
    return arr.join(keep, "doc_id", "left").select(
        "doc_id",
        F.size("chunks").cast("long").alias("n_chunks"),
        F.size(kept_chunks).cast("long").alias("n_kept"),
        F.array_join(kept_chunks, " ").alias("new_text"),
    )


@query(
    "q_semdedup",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM {VALID_EMBEDDINGS_SQL}
), dup AS (
  SELECT DISTINCT b.label, b.vec_id
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        > {SEMDEDUP_TAU}
)
SELECT CAST(e.label AS BIGINT)                          AS label,
       CAST(count(*) AS BIGINT)                         AS n_members,
       CAST(count(dup.vec_id) AS BIGINT)                AS n_dup,
       CAST(count(*) - count(dup.vec_id) AS BIGINT)     AS n_kept
FROM e LEFT JOIN dup ON dup.label = e.label AND dup.vec_id = e.vec_id
GROUP BY e.label
""",
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup restricted to
    embedding clusters — a vector is a duplicate iff some
    LOWER-vec_id member of its own cluster sits above cosine τ =
    {SEMDEDUP_TAU} (keep-lowest-id is the paper's keep-one policy made
    deterministic). Reports per-cluster members / duplicates / kept.

    The fixture ``label`` plays the k-means cluster id (the trainer
    lives in clustering.py; using the materialized assignment keeps
    this op oracle-checkable). Pairwise work is confined within
    clusters — Σ|c|² not n² — which is exactly the published
    algorithm's scaling argument; the cluster-keyed self-join
    shuffles each vector once, and AQE's skew split handles a jumbo
    cluster. Norms attach ONCE per vector (with_norm) so each pair
    pays one dot-product fold, not three; dot is the shared
    bit-compatible fold (llm_dedup.dot), and sqrt/multiply order
    matches the oracle, so the τ comparison can't flip between
    engines."""
    e = with_norm(
        fan_out(valid_vectors(load(spark, sf_dir, "embeddings"))).select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    a, b = e.alias("a"), e.alias("b")
    dup = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            F.try_divide(
                dot(F.col("a.v"), F.col("b.v")), F.col("a.norm") * F.col("b.norm")
            )
            > SEMDEDUP_TAU
        )
        .select(F.col("b.label").alias("label"), F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        e.join(dup.withColumn("is_dup", F.lit(1)), ["label", "vec_id"], "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.count("is_dup").cast("long").alias("n_dup"),
            (F.count(F.lit(1)) - F.count("is_dup")).cast("long").alias("n_kept"),
        )
    )


def _chars(word: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(word).cast("int")), lambda i: F.substring(word, i, 1)
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol
    pairs — the standard BPE apply — as one codegen'd array fold."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


# Word-count rows below which the merge rounds run on the driver: the
# corpus pass already compressed the data to (word, count), and Heaps'
# law keeps that vocabulary sublinear in corpus size — reference BPE
# trainers (Sennrich's learn_bpe, HF tokenizers) hold exactly this
# dict in memory. 2M rows of short symbol arrays is well under 1 GiB.
BPE_DRIVER_VOCAB_MAX = 2_000_000


def _bpe_train_local(
    words: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge rounds: exact twin of the distributed loop
    (same adjacent-pair counts, same (count desc, left, right)
    byte-order tie-break, same greedy left-to-right fold)."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for syms, cnt in words:
            for pair in zip(syms, syms[1:]):
                pc[pair] = pc.get(pair, 0) + cnt
        if not pc:
            break
        # Binary-collation tie-break (UTF8String / DuckDB both compare
        # bytes): encode before comparing so non-ASCII can't diverge.
        (l, r), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0].encode(), kv[0][1].encode())
        )
        merges.append((rank, l, r, int(n)))
        lr = l + r
        out: list[tuple[list[str], int]] = []
        for syms, cnt in words:
            if l in syms and r in syms:
                acc: list[str] = []
                for x in syms:
                    if acc and acc[-1] == l and x == r:
                        acc[-1] = lr
                    else:
                        acc.append(x)
                out.append((acc, cnt))
            else:
                out.append((syms, cnt))
        words = out
    return merges


def bpe_train(vocab: DataFrame, n_merges: int) -> list[tuple[int, str, str, int]]:
    """Run ``n_merges`` BPE rounds over a (syms array<string>, cnt
    long) word-frequency frame; returns [(rank, left, right, count)].

    The corpus pass that built ``vocab`` (groupBy word) is the 100 TB
    heavy lifting; the merge rounds only ever touch the word-frequency
    table. When that table fits the driver (≤ {BPE_DRIVER_VOCAB_MAX}
    rows — Heaps' law keeps real vocabularies in the low millions, and
    this is the in-memory dict every reference BPE trainer uses), the
    rounds run locally: one limit+collect instead of a Spark job per
    round. Past the bound, the distributed loop below takes over.

    Distributed rounds: one small Spark job over the VOCABULARY each —
    adjacent-pair counts via slice/zip explode + partial-agg, argmax to
    the driver (one row — the k-means centroid-collect class), then the
    fold rewrite of each symbol array, lazily localCheckpoint'd so the
    next round's argmax materializes it while the per-round lambda
    towers never stack into one giant expression tree. The rewrite is
    split-union guarded (the passback discipline): only words
    containing BOTH merged symbols run the O(|word|) fold — a cheap
    array_contains pre-filter skips the overwhelming majority each
    round, since a word lacking either symbol cannot contain the
    adjacency and the fold would return it unchanged. Both paths break
    ties (count desc, left, right) so the merge table is deterministic
    and identical either way."""
    head = vocab.limit(BPE_DRIVER_VOCAB_MAX + 1).collect()
    if len(head) <= BPE_DRIVER_VOCAB_MAX:
        return _bpe_train_local(
            [(list(r["syms"]), int(r["cnt"])) for r in head], n_merges
        )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                        F.slice("syms", 2, F.size("syms") - 1).alias("r"),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        best = pairs[0]
        merges.append((rank, best["l"], best["r"], int(best["n"])))
        hit = F.array_contains("syms", best["l"]) & F.array_contains("syms", best["r"])
        # Lazy checkpoint: the NEXT round's argmax action materializes
        # the rewrite while computing its pair counts — one job per
        # round instead of an eager-materialize job plus an argmax job
        # (measured ~2x on the 6-round trainer; lineage still truncates
        # at every round, so the fold towers never stack).
        vocab = checkpoint_frame(
            vocab.filter(hit)
            .select(_apply_merge(F.col("syms"), best["l"], best["r"]).alias("syms"), "cnt")
            .unionByName(vocab.filter(~hit).select("syms", "cnt")),
            eager=False,
        )
    return merges


def _apply_merges_expr(word_col: str, merges: list[tuple[str, str]]) -> Column:
    """The full merge cascade over ``word_col``'s characters as ONE
    parsed SQL expression — semantically identical to chaining
    ``_apply_merge`` over ``_chars`` (same greedy fold, same CASE
    branches), but a single F.expr parse instead of ~3 py4j lambda
    constructions per rule (~0.5 s of driver time per query build at
    8 rules)."""

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    expr = (
        f"transform(sequence(1, CAST(length({word_col}) AS INT)),"
        f" i -> substring({word_col}, i, 1))"
    )
    for l, r in merges:
        expr = (
            f"aggregate({expr}, CAST(array() AS array<string>), (acc, x) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {q(l)} AND x = {q(r)} "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array({q(l + r)})) "
            f"ELSE concat(acc, array(x)) END)"
        )
    return F.expr(expr)


def _duck_encode(merges: list[tuple[str, str]]) -> str:
    """DuckDB expression applying ``merges`` to word ``w`` — the exact
    list_reduce twin of the Spark fold in _apply_merge."""
    expr = "list_transform(generate_series(1, length(w)), i -> substr(w, i, 1))"
    for l, r in merges:
        expr = (
            f"list_reduce(list_transform({expr}, t -> [t]), "
            f"(acc, x) -> CASE WHEN acc[-1] = '{l}' AND x[1] = '{r}' "
            f"THEN acc[1:len(acc)-1] || ['{l + r}'] ELSE acc || x END)"
        )
    return expr


@query(
    "q_bpe_encode",
    oracle=f"""
WITH wc AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
), enc AS (
  SELECT {_duck_encode(BPE_RULES)} AS toks, c FROM wc
)
SELECT token, CAST(sum(c) AS BIGINT) AS cnt
FROM (SELECT unnest(toks) AS token, c FROM enc)
GROUP BY token
""",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer ENCODE at corpus scale: apply the fixed BPE_RULES
    merge table to every word and report corpus token frequencies —
    the online half of BPE (training is offline, q_bpe_train;
    encoding is what touches all 100 TB).

    Plan: one groupBy compresses the corpus to its word vocabulary
    first, the {len(BPE_RULES)}-rule merge cascade then folds each
    DISTINCT word once (codegen'd array fold, no Python), and token
    counts re-weight by word frequency — per-round work is bounded by
    |vocab|, not corpus size. The DuckDB oracle applies the identical
    fold via nested list_reduce, so the greedy left-to-right merge
    semantics are value-checked, not just row-counted."""
    docs = load(spark, sf_dir, "documents", columns=["text"])
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    syms = _apply_merges_expr("word", BPE_RULES)
    return (
        vocab.select(F.explode(syms).alias("token"), "c")
        .groupBy("token")
        .agg(F.sum("c").alias("cnt"))
    )


@query(
    "q_mixture_waterfill",
    oracle=f"""
WITH avail AS (
  SELECT source,
         -- coalesce: a source of only-NULL texts still participates
         -- with avail 0; an unparsable/NULL source gets weight 1 —
         -- otherwise NULL ratios hit the engines' opposite null sort
         -- order and the whole waterfill shifts (nulls fuzz shape)
         CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT) AS avail,
         CAST(coalesce(CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT), 0) % 4 + 1 AS BIGINT) AS weight
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(avail) AS tot_avail, sum(weight) AS tot_w,
         floor({MIX_BUDGET_FRAC} * sum(avail)) AS budget
  FROM avail
), ranked AS (
  SELECT a.*, t.tot_w, t.budget,
         CAST(avail AS DOUBLE) / weight AS ratio,
         sum(avail)  OVER win AS cum_avail,
         sum(weight) OVER win AS cum_w,
         lead(CAST(avail AS DOUBLE) / weight) OVER win AS next_ratio
  FROM avail a, tot t
  WINDOW win AS (ORDER BY CAST(avail AS DOUBLE) / weight, source NULLS FIRST)
), lam AS (
  SELECT coalesce(
           max(CASE WHEN ratio <= (budget - cum_avail) / (tot_w - cum_w)
                     AND (next_ratio IS NULL
                          OR next_ratio > (budget - cum_avail) / (tot_w - cum_w))
                    THEN (budget - cum_avail) / (tot_w - cum_w) END),
           max(budget / tot_w)) AS lam
  FROM ranked
)
SELECT r.source, r.avail, r.weight,
       CASE WHEN abs(least(CAST(r.avail AS DOUBLE), l.lam * r.weight)) < 4.5e9 THEN floor((least(CAST(r.avail AS DOUBLE), l.lam * r.weight)) * 1e6 + 0.5) / 1e6 ELSE (least(CAST(r.avail AS DOUBLE), l.lam * r.weight)) END AS alloc,
       r.avail <= l.lam * r.weight AS saturated
FROM ranked r, lam l
""",
)
def q_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture budgeting by waterfilling: given per-source
    token availability and target mixture weights, spend a token
    budget (= {MIX_BUDGET_FRAC} of what's available) so every source
    gets min(available, λ·weight) with one global water level λ — the
    DoReMi/Pile-style domain-mixing allocation, solved exactly.

    λ is found closed-form: sort sources by avail/weight, λ(k) =
    (budget − Σ_{{saturated}} avail) / Σ_{{unsaturated}} weight, and the
    unique k where ratio_k ≤ λ(k) < ratio_{{k+1}} wins (λ(0) fallback
    when nothing saturates). One corpus pass reduces to a
    |sources|-row frame; the sort/λ search is window algebra on that
    tiny frame (the single-partition window is post-aggregation — 20
    rows here, domains-not-documents at any scale), and every formula
    is written with identical operation order in both engines so the
    float comparisons can't flip."""
    docs = load(spark, sf_dir, "documents", columns=["source", "text"])
    # localCheckpoint: the |sources|-row aggregate feeds four separate
    # subtrees (totals, ranking, λ search, final projection) — without
    # it each one re-runs the corpus scan+agg (plan audit showed 8
    # parquet scans; with the memo, 1).
    avail = (
        docs.groupBy("source")
        .agg(F.coalesce(F.sum(F.size(F.split("text", " "))), F.lit(0)).cast("long").alias("avail"))
        .withColumn(
            "weight",
            (
                F.coalesce(
                    F.regexp_extract("source", r"src(\d+)", 1).cast("int"), F.lit(0)
                )
                % 4
                + 1
            ).cast("long"),
        )
    )
    avail = checkpoint_frame(avail, eager=True)
    tot = avail.agg(
        F.sum("avail").alias("tot_avail"),
        F.sum("weight").alias("tot_w"),
        F.floor(F.lit(MIX_BUDGET_FRAC) * F.sum("avail")).alias("budget"),
    )
    ratio = F.col("avail").cast("double") / F.col("weight")
    win = Window.orderBy(ratio, F.col("source").asc_nulls_first())
    ranked = (
        avail.crossJoin(F.broadcast(tot))
        .withColumn("ratio", ratio)
        .withColumn("cum_avail", F.sum("avail").over(win))
        .withColumn("cum_w", F.sum("weight").over(win))
        .withColumn("next_ratio", F.lead("ratio").over(win))
    )
    # try_divide: the final ranked row has tot_w == cum_w; NULL there
    # (matching DuckDB's x/0 => NULL) drops it from the max() search.
    lam_k = F.try_divide(
        F.col("budget") - F.col("cum_avail"), F.col("tot_w") - F.col("cum_w")
    )
    lam = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    (F.col("ratio") <= lam_k)
                    & (F.col("next_ratio").isNull() | (F.col("next_ratio") > lam_k)),
                    lam_k,
                )
            ),
            F.max(F.col("budget") / F.col("tot_w")),
        ).alias("lam")
    )
    return ranked.crossJoin(F.broadcast(lam)).select(
        "source",
        "avail",
        "weight",
        floor_quantize(
            F.least(F.col("avail").cast("double"), F.col("lam") * F.col("weight")), 6).alias("alloc"),
        (F.col("avail") <= F.col("lam") * F.col("weight")).alias("saturated"),
    )


def _bpe_train_oracle() -> str:
    """Value oracle that replays the full {BPE_MERGES}-round trainer as
    unrolled MATERIALIZED CTEs (the MMR / PageRank precedent for
    iterative algorithms): round i's argmax runs on round i-1's
    rewritten vocabulary, the rewrite being the same greedy fold as
    _duck_encode but with the (l, r) pair captured from the 1-row p_i
    CTE inside the lambda. Everything is integer counts and string
    tie-breaks — no floats anywhere — so the learned merge table is
    exactly reproducible cross-engine."""
    parts = [
        "WITH wc AS MATERIALIZED (",
        "  SELECT word, count(*) AS cnt FROM (",
        "    SELECT unnest(string_split(text, ' ')) AS word FROM documents",
        "  ) WHERE length(word) > 0 GROUP BY word),",
        "v0 AS MATERIALIZED (SELECT list_transform(generate_series(1, length(word)),"
        " i -> substr(word, i, 1)) AS syms, cnt FROM wc),",
    ]
    for i in range(1, BPE_MERGES + 1):
        parts += [
            f"p{i} AS MATERIALIZED (",
            "  SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS n",
            f"  FROM v{i - 1}, unnest(generate_series(1, len(syms) - 1)) AS t(i)",
            "  GROUP BY 1, 2 ORDER BY n DESC, l, r LIMIT 1),",
            f"v{i} AS MATERIALIZED (",
            "  SELECT list_reduce(list_transform(syms, t -> [t]),",
            f"    (acc, x) -> CASE WHEN acc[-1] = p{i}.l AND x[1] = p{i}.r",
            f"    THEN acc[1:len(acc)-1] || [p{i}.l || p{i}.r] ELSE acc || x END) AS syms, cnt",
            f"  FROM v{i - 1}, p{i}),",
        ]
    sel = " UNION ALL ".join(
        f'SELECT CAST({i} AS BIGINT) AS rank, l AS "left", r AS "right",'
        f" CAST(n AS BIGINT) AS pair_count FROM p{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return "\n".join(parts)[:-1] + f"\n{sel}"


@query("q_bpe_train", oracle=_bpe_train_oracle())
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016):
    learn the first {BPE_MERGES} merge rules from the documents
    corpus. One corpus pass builds the word-frequency vocabulary
    (groupBy word — the heavy-hitter compression that makes BPE
    trainable at 100 TB: every later round touches only the vocab);
    each round counts adjacent symbol pairs weighted by word
    frequency, promotes the argmax pair, and rewrites the symbol
    arrays with a codegen'd fold (no Python UDFs anywhere).
    Returns the merge table: rank, left, right, pair_count."""
    docs = load(spark, sf_dir, "documents", columns=["text"])
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_chars(F.col("word")).alias("syms"), "cnt")
    )
    merges = bpe_train(vocab, BPE_MERGES)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


# ---------------------------------------------------------------------------
# q_tokenizer_fertility — per-language tokens-per-word under the tokenizer
# ---------------------------------------------------------------------------


@query(
    "q_tokenizer_fertility",
    oracle=f"""
WITH wc AS (
  SELECT lang, w, count(*) AS c
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1, 2
), enc AS (
  SELECT lang, c, len({_duck_encode(BPE_RULES)}) AS ntok, length(w) AS nchars FROM wc
)
SELECT lang,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(sum(c * ntok) AS BIGINT) AS n_tokens,
       CAST(sum(c * nchars) AS BIGINT) AS n_chars,
       CASE WHEN abs(CAST(sum(c * ntok) AS DOUBLE) / CAST(sum(c) AS DOUBLE)) < 4.5e9 THEN floor((CAST(sum(c * ntok) AS DOUBLE) / CAST(sum(c) AS DOUBLE)) * 1e4 + 0.5) / 1e4 ELSE (CAST(sum(c * ntok) AS DOUBLE) / CAST(sum(c) AS DOUBLE)) END AS fertility,
       CASE WHEN abs(CAST(sum(c * nchars) AS DOUBLE) / CAST(sum(c * ntok) AS DOUBLE)) < 4.5e9 THEN floor((CAST(sum(c * nchars) AS DOUBLE) / CAST(sum(c * ntok) AS DOUBLE)) * 1e4 + 0.5) / 1e4 ELSE (CAST(sum(c * nchars) AS DOUBLE) / CAST(sum(c * ntok) AS DOUBLE)) END
         AS chars_per_token
FROM enc GROUP BY lang
""",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language — tokens emitted per word and
    characters absorbed per token under the shipped BPE_RULES merge
    table. Fertility is the standard multilingual-tokenizer equity
    metric: a tokenizer trained on one language fragments the others
    (fertility ≫ 1 there), which inflates their effective sequence
    lengths and training cost; this query is the corpus-wide audit
    that exposes it.

    Plan: same vocabulary compression as q_bpe_encode (groupBy (lang,
    word) — per-round fold work bounded by |vocab|, corpus weight
    re-attached via the counts), then ONE grouped sum over exact
    integers; the two float divisions happen per output row (|langs|),
    rounded 4 dp. Cites q_bpe_encode's oracle fold (_duck_encode) so
    the greedy merge semantics stay value-checked here too."""
    docs = load(spark, sf_dir, "documents", columns=["lang", "text"])
    vocab = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    syms = _apply_merges_expr("word", BPE_RULES)
    per_word = vocab.select(
        "lang",
        "c",
        F.size(syms).cast("long").alias("ntok"),
        F.length("word").cast("long").alias("nchars"),
    )
    n_tok = F.sum(F.col("c") * F.col("ntok"))
    n_chr = F.sum(F.col("c") * F.col("nchars"))
    return per_word.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_words"),
        n_tok.cast("long").alias("n_tokens"),
        n_chr.cast("long").alias("n_chars"),
        floor_quantize(n_tok.cast("double") / F.sum("c").cast("double"), 4).alias("fertility"),
        floor_quantize(n_chr.cast("double") / n_tok.cast("double"), 4).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# q_mixture_temperature — temperature-scaled source sampling weights
# ---------------------------------------------------------------------------


@query(
    "q_mixture_temperature",
    oracle="""
WITH avail AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), scaled AS (
  SELECT source, n_tokens,
         CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(28,10)) AS s
  FROM avail
), tot AS (SELECT sum(n_tokens) AS tn, sum(s) AS ts FROM scaled)
SELECT source, n_tokens,
       CASE WHEN abs(CAST(n_tokens AS DOUBLE) / CAST(tn AS DOUBLE)) < 4.5e9 THEN floor((CAST(n_tokens AS DOUBLE) / CAST(tn AS DOUBLE)) * 1e6 + 0.5) / 1e6 ELSE (CAST(n_tokens AS DOUBLE) / CAST(tn AS DOUBLE)) END AS raw_share,
       CASE WHEN abs(CAST(s AS DOUBLE) / CAST(ts AS DOUBLE)) < 4.5e9 THEN floor((CAST(s AS DOUBLE) / CAST(ts AS DOUBLE)) * 1e6 + 0.5) / 1e6 ELSE (CAST(s AS DOUBLE) / CAST(ts AS DOUBLE)) END AS temp_share
FROM scaled CROSS JOIN tot
""",
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual-sampling
    rule of mBERT/XLM-R, p_i ∝ n_i^τ): flattens the source
    distribution so heavy domains stop drowning small ones while
    still respecting size. τ = 1/2 here, deliberately: n^0.5 is
    sqrt — IEEE-correctly-rounded, so the scaled weights are
    bit-identical cross-engine with no transcendental-rounding
    caveat (general τ would use pow() under the 6-dp rounding
    discipline of q_math_funcs). Complements q_mixture_waterfill
    (hard budget) with the soft-reweighting alternative.

    Plan: one corpus pass partial-aggregates token counts per source;
    the scaled weights are |sources| rows; Σsqrt goes through
    DECIMAL(28,10) so the total is order-independent (the repo's
    standard float-sum discipline); shares are one rounded division
    per output row against a 1-row broadcast total."""
    docs = load(spark, sf_dir, "documents", columns=["source", "text"])
    avail = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    scaled = avail.select(
        "source",
        "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(28,10)").alias("s"),
    )
    tot = scaled.agg(F.sum("n_tokens").alias("tn"), F.sum("s").alias("ts"))
    return scaled.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        floor_quantize(F.col("n_tokens").cast("double") / F.col("tn").cast("double"), 6).alias("raw_share"),
        floor_quantize(F.col("s").cast("double") / F.col("ts").cast("double"), 6).alias("temp_share"),
    )
