"""Graph-shaped operators: connected components over the near-dup pair
graph — the missing last step of corpus dedup. The pair producers
(llm_dedup: Jaccard / MinHash-LSH / SimHash) emit EDGES; curation
needs CLUSTERS, because near-dup similarity is not transitive-closed:
A~B and B~C must collapse to one keeper even when A~C was never
emitted. (North-star operator; the reference has no graph surface —
its only dedup is the keyed insert at main.py:202.)

Scale design: Boruvka-style min-hook CONTRACTION — every round each
vertex hooks to the min of its neighborhood and the edge set is
relabeled through the hooks and deduped, so dense near-dup graphs
collapse geometrically (the per-round join runs on the shrinking
quotient graph, not the original edge list — the decisive difference
from min-label propagation, whose every round re-joins the full edge
set for diameter rounds). Frames are checkpointed per round through
``registry.checkpoint_frame`` so Catalyst never sees an O(2^rounds)
lineage — executor-local blocks by default, or RELIABLE
``checkpoint()`` into ``SPARK_GRAFT_CHECKPOINT_DIR`` (the cluster
profile, where a lost executor must not kill the iteration); the full
registry runs green under that env (BASELINE.md §robustness).
Contraction's adversary is the long chain (O(1) edges removed per
round) — a shrink-stall detector hands the contracted graph to the
alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public),
same join/agg primitives, O(log² n) rounds regardless of diameter
(:func:`_star_components`), and the label mappings compose.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.io import load
from grader_etl_spark.operators.llm_dedup import (
    _JACCARD_THRESHOLD,
    SHINGLE_K,
    jaccard_pairs_memo,
    q_neardup_jaccard,
)
from grader_etl_spark.registry import checkpoint_frame, memo_checkpoint, query
from grader_etl_spark.functions.quantize import floor_quantize
from grader_etl_spark.functions.textnorm import norm_lower

# Resolved-cluster memo (keyed by corpus dir): localCheckpointed, so
# it survives catalog cache clears and is shared by every consumer of
# the cluster map within a session — the engine-side analogue of the
# maintained cluster table a production dedup pipeline keeps.
_COMPONENT_CACHE: dict[tuple, DataFrame] = {}

_SSET_SQL = f"""
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - {SHINGLE_K - 2}, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM documents
"""


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int = 25,
    tail_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components by Boruvka-style min-hook contraction,
    with an alternating-star fallback for adversarially deep graphs
    and a driver-side union-find finish for the contracted tail.

    ``vertices``: one column ``id``;  ``edges``: columns ``src``,
    ``dst`` (directed — pass both directions for an undirected graph).
    Returns (id, component) where component = min id reachable.

    Each round hooks every vertex to m(u) = min(N(u) ∪ {u}) and
    CONTRACTS: the composed mapping M absorbs the hook, and the edge
    set is relabeled through m and deduped. Dense near-dup graphs
    collapse geometrically — on the sf0.1 entity-resolution graph the
    edge set goes 1.08M → 1.2k after ONE round, ~2.5× faster than
    min-label propagation (whose per-round join stays 2M-edge wide
    for all diameter rounds). min(C) always survives contraction (it
    is its own hook target), so labels stay canonical.

    Once the quotient graph fits under ``tail_threshold`` edges, more
    distributed rounds would be pure job-scheduling overhead, so the
    tail is Arrow-collected and closed with an exact driver
    union-find, then broadcast-joined back — the same
    bounded-driver-state budget as the k-means centroid collect
    (clustering.py). The bound is the threshold (~32 MB at the 2M
    default — a contraction round over that many edges costs several
    shuffles; collecting them costs under a second), independent of
    input scale; an adversarial graph that refuses to shrink below it
    keeps iterating distributed.

    Contraction's weakness is long chains (the edge set shrinks by
    O(1) per round); when a round's shrink factor is poor the loop
    hands the already-contracted graph to :func:`_star_components`
    (diameter-independent O(log² n) rounds) and composes the labels.
    """
    e = checkpoint_frame(
        edges.select(F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mapping = checkpoint_frame(vertices.select("id", F.col("id").alias("label")))
    return _contract_loop(mapping, e, max_rounds, tail_threshold)


def components_from_pairs(
    pairs: DataFrame,
    col_a: str,
    col_b: str,
    max_rounds: int = 25,
    tail_threshold: int = 2_000_000,
) -> DataFrame:
    """:func:`connected_components` for an undirected UNIQUE-pair edge
    list (the shape every near-dup candidate generator emits): skips
    the both-directions union and the canonicalizing distinct — on the
    1M-pair entity graph that is one full 2M-row shuffle saved before
    the first contraction round. Returns (id, component) for
    edge-touched ids only; callers anti-join for singletons (which
    they already do). Duplicate pairs would not break correctness,
    only inflate round-0 work."""
    e = pairs.select(
        F.greatest(col_a, col_b).alias("u"), F.least(col_a, col_b).alias("v")
    ).filter(F.col("u") != F.col("v"))
    n = e.count()  # one scan of the (usually session-memoized) pair frame
    if n <= tail_threshold:
        # Tail-sized from the start: skip the distributed scaffolding
        # entirely (edge checkpoint + ids-distinct + identity-mapping
        # checkpoint + compose join cost ~4 small jobs that measured
        # ~4 s of pure overhead on a 10k-edge graph). Labels root at
        # the min id, so the root IS the component label.
        epdf = e.toPandas()  # Arrow path: ~5x a row-based collect here
        ids, lab = _np_min_labels(epdf["u"].to_numpy(), epdf["v"].to_numpy())
        id_type = e.schema["u"].dataType
        schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("component", id_type)]
        )
        return pairs.sparkSession.createDataFrame(
            pd.DataFrame({"id": ids, "component": ids[lab]}), schema
        )
    e = checkpoint_frame(e)
    # mapping=None: the identity mapping over edge-touched vertices is
    # never materialized — round 1's hook table covers every edge
    # endpoint (each appears as u in the both-directions union), and
    # identity∘hooks = hooks, so building ids-distinct + an identity
    # checkpoint + the first compose join would be three jobs of pure
    # overhead (~1.7s on the sf0.1 entity graph).
    return _contract_loop(None, e, max_rounds, tail_threshold, prev_n=n)


def _np_min_labels(a, b):
    """Vectorized exact connected-components closure over an edge
    list: repeated scatter-min along the edges plus pointer-jump
    compression, iterated to the fixpoint. Labels start as each
    vertex's own dense index and only ever DECREASE toward the
    minimum reachable index, so the loop must terminate, and at the
    fixpoint every edge has equal endpoint labels with the component
    min (its own fixed point) as the shared value — the same answer
    as a min-rooted union-find, at numpy scatter speed instead of a
    Python dict loop (~0.9s → ~50ms on the 1M-edge entity graph).
    Returns (unique vertex ids, per-vertex label INDEX into ids)."""
    import numpy as np

    ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    m = len(a)
    ai, bi = inv[:m], inv[m:]
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        old = lab
        lab = lab.copy()
        np.minimum.at(lab, ai, lab[bi])
        np.minimum.at(lab, bi, lab[ai])
        lab = lab[lab[lab]]  # pointer jumping: O(log) total rounds
        if np.array_equal(lab, old):
            break
    return ids, lab


def _driver_union_find(edge_rows: list, mapping: DataFrame) -> DataFrame:
    """Exact min-label closure over a collected edge tail, composed
    back onto the distributed mapping via a broadcast join."""
    import numpy as np

    ids, lab = _np_min_labels(
        np.array([a for a, _ in edge_rows]), np.array([b for _, b in edge_rows])
    )
    moved = lab != np.arange(len(ids))
    spark = mapping.sparkSession
    tail = spark.createDataFrame(
        pd.DataFrame({"x": ids[moved], "root": ids[lab[moved]]}),
        T.StructType(
            [
                T.StructField("x", mapping.schema["label"].dataType),
                T.StructField("root", mapping.schema["label"].dataType),
            ]
        ),
    )
    return mapping.join(F.broadcast(tail), mapping.label == tail.x, "left").select(
        "id", F.coalesce("root", "label").alias("component")
    )


def _contract_loop(
    mapping: DataFrame | None, e: DataFrame, max_rounds: int, tail_threshold: int,
    prev_n: int | None = None,
) -> DataFrame:
    """Shared contraction loop: ``mapping`` (id, label) composed hook
    mapping, ``e`` canonical (u > v) edge frame, both checkpointed.

    ``mapping=None`` means "identity over the edge-touched vertex
    set": the caller guarantees the loop body runs at least once
    before any terminal branch (prev_n > tail_threshold on entry), so
    the first round's hook table — which contains every edge endpoint
    — becomes the mapping directly instead of composing with a
    materialized identity frame."""
    if prev_n is None:
        prev_n = e.count()
    assert mapping is not None or prev_n > tail_threshold
    for _ in range(max_rounds):
        if prev_n == 0:
            return mapping.select("id", F.col("label").alias("component"))
        if prev_n <= tail_threshold:
            epdf = e.toPandas()  # Arrow path: ~5x a row-based collect
            return _driver_union_find(
                list(zip(epdf["u"].tolist(), epdf["v"].tolist())), mapping
            )
        both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        hooks = checkpoint_frame(
            both.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select(F.col("u").alias("x"), F.least("mn", F.col("u")).alias("lab"))
        )
        if mapping is None:
            # identity ∘ hooks = hooks (hooks covers every endpoint)
            mapping = hooks.select(F.col("x").alias("id"), F.col("lab").alias("label"))
        else:
            mapping = checkpoint_frame(
                mapping.join(hooks, mapping.label == hooks.x, "left")
                .select("id", F.coalesce("lab", "label").alias("label"))
            )
        mu = hooks.select(F.col("x").alias("u"), F.col("lab").alias("lu"))
        mv = hooks.select(F.col("x").alias("v"), F.col("lab").alias("lv"))
        e = checkpoint_frame(
            e.join(mu, "u")
            .join(mv, "v")
            .select(F.greatest("lu", "lv").alias("u"), F.least("lu", "lv").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        n = e.count()
        if n > 0 and n > 0.7 * prev_n:
            break  # chain-like shrink stall — star handles it below
        prev_n = n
    comp = _star_components(
        e.select(F.col("u").alias("id")).unionByName(e.select(F.col("v").alias("id"))).distinct(),
        e.selectExpr("u as src", "v as dst"),
    ).select(F.col("id").alias("star_id"), "component")
    return mapping.join(comp, mapping.label == comp.star_id, "left").select(
        "id", F.coalesce("component", "label").alias("component")
    )


def _star_components(
    vertices: DataFrame, edges: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014 — public algorithm). Converges in O(log² n) rounds
    regardless of graph diameter, so a million-node chain costs ~tens
    of rounds where min-label would need a million.

    Each round is two map-reduce steps over the edge list only (no
    vertex frame in the loop):

    * large-star: every node attaches its strictly-larger neighbors to
      m = min(N(u) ∪ {u})  — groupBy(u).min + self-join.
    * small-star: on the canonicalized (u > v) edge set, every node
      attaches its smaller neighbors and itself to its min neighbor.

    At the fixpoint the edge set is a union of stars: every non-root
    node holds exactly its component root as min neighbor.
    """
    e = checkpoint_frame(
        edges.select(F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev: tuple | None = None
    for _ in range(max_rounds):
        # large-star over both directions
        both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = both.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
        large = (
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.greatest("v", "m").alias("u"), F.least("v", "m").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star on canonical (u > v): min neighbor is the target
        m2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(m2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(m2.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        e = checkpoint_frame(
            small.filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
        )
        # Fixpoint witness: (edge count, order-insensitive content
        # hash). bit_xor never overflows under ANSI mode (sum of
        # hashes would); xxhash64 collisions across rounds are
        # negligible and a false convergence would only stop one round
        # early on an already-star-shaped set.
        sig_row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev:
            break
        prev = sig
    roots = e.groupBy(F.col("u").alias("id")).agg(F.min("v").alias("component"))
    return vertices.join(roots, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


@query(
    "q_dedup_components",
    oracle=f"""
WITH RECURSIVE sh AS ({_SSET_SQL}),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
)
SELECT doc_id, MIN(label) AS component_id FROM reach GROUP BY doc_id
""",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the exact-Jaccard
    pair graph (threshold 0.25), labeling every document with the
    min doc_id of its cluster — the canonical keeper. Downstream
    curation keeps ``doc_id == component_id`` rows. The oracle builds
    the same clusters with a recursive CTE (transitive reachability →
    min reachable id), proving the propagation loop reaches the true
    fixpoint, not an early iterate.

    The resolved (doc_id, component_id) map is session-memoized per
    corpus like the shingle index — cluster resolution is a maintained
    artifact every consumer (savings report, leakage-safe splits,
    curation) reads, not something to re-derive per query. Keyed by
    (session, corpus) — checkpoints die with their session."""
    key = (spark, sf_dir)
    if key in _COMPONENT_CACHE:
        return _COMPONENT_CACHE[key]
    pairs = jaccard_pairs_memo(spark, sf_dir)
    # Only edge-touched vertices enter the contraction loop — in a
    # deduped-enough corpus that's a tiny fraction, so every round's
    # join/agg runs on the near-dup subgraph, not the whole corpus.
    # The untouched majority are singleton components by definition
    # (one anti-join, no iterations).
    comp = components_from_pairs(pairs, "doc_id_1", "doc_id_2")
    docs = load(spark, sf_dir, "documents", columns=["doc_id"])
    singletons = docs.join(
        comp, docs.doc_id == comp.id, "left_anti"
    ).select("doc_id", F.col("doc_id").alias("component_id"))
    out = memo_checkpoint(singletons.unionByName(
        comp.select(F.col("id").alias("doc_id"), F.col("component").alias("component_id"))
    ))
    _COMPONENT_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# PageRank over the nation trade-flow graph
# ---------------------------------------------------------------------------

PR_ITERS = 12
PR_DAMPING = 0.85
_N_NATIONS = 25  # the nation dimension is fixed-size at every SF


def _pr_edges_sql() -> str:
    return """
  SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE cn.n_nationkey <> sn.n_nationkey
  GROUP BY 1, 2
"""


def _pr_oracle() -> str:
    """Unrolled fixed-iteration PageRank: r0..r{PR_ITERS} as chained
    CTEs (DuckDB disallows aggregates in recursive CTEs, and a fixed
    iterate is what the Spark side computes anyway)."""
    step = """
r{i} AS MATERIALIZED (
  SELECT n.n_name,
         0.15 + {d} * (COALESCE(c.contrib, 0.0) + COALESCE(
             (SELECT sum(r.rank) FROM r{p} r LEFT JOIN outw o ON r.n_name = o.src
              WHERE o.src IS NULL), 0.0) / {n}.0) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS n_name, sum(r.rank * e.w / o.w_out) AS contrib
    FROM r{p} r JOIN edges e ON r.n_name = e.src JOIN outw o ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.n_name = c.n_name
)"""
    chain = ",\n".join(
        step.format(i=i, p=i - 1, d=PR_DAMPING, n=_N_NATIONS) for i in range(1, PR_ITERS + 1)
    )
    return f"""
WITH edges AS MATERIALIZED ({_pr_edges_sql()}),
nodes AS (SELECT n_name FROM nation),
outw AS MATERIALIZED (SELECT src, sum(w) AS w_out FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT n_name, 1.0 AS rank FROM nodes),
{chain}
SELECT n_name, CASE WHEN abs(rank) < 4.5e9 THEN floor((rank) * 1e6 + 0.5) / 1e6 ELSE (rank) END AS pagerank FROM r{PR_ITERS}
"""


# Distilled-graph memo: the weighted nation-trade edge list is a
# derived artifact of the fact tables (≤ |V|² = 625 rows) shared by
# every graph query in a session — PageRank and Bellman-Ford each
# re-running the lineitem⋈orders join tree to re-derive the identical
# 625 rows is wasted scan+shuffle. localCheckpoint survives
# catalog-wide cache clears; bound is |V|² rows per scale factor.
_TRADE_EDGE_CACHE: dict[tuple, DataFrame] = {}


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The customer-nation → supplier-nation weighted edge list
    distilled from the fact tables (the SQL twin is _pr_edges_sql):
    one join tree over lineitem⋈orders with broadcast dims, reduced
    to at most |V|² rows and checkpointed (and session-memoized) so
    iterative callers don't re-run the join tree per round or per
    query. Keyed by (session, corpus) — checkpoints die with their
    session."""
    memo_key = (spark, sf_dir)
    if memo_key in _TRADE_EDGE_CACHE:
        return _TRADE_EDGE_CACHE[memo_key]
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src"))),
            cust.c_nationkey == F.col("ck"),
        )
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst"))),
            supp.s_nationkey == F.col("sk"),
        )
        .filter(F.col("ck") != F.col("sk"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = memo_checkpoint(edges)
    _TRADE_EDGE_CACHE[memo_key] = edges
    return edges


@query("q_pagerank_nations", oracle=_pr_oracle())
def q_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer-nation → supplier-nation
    trade graph (12 fixed iterations, damping 0.85, dangling
    mass redistributed uniformly). The expensive part — distilling the
    fact tables into the weighted edge list — is one join tree over
    lineitem⋈orders⋈customer⋈supplier with broadcast nation dims,
    aggregated to |V|² edges max, checkpointed ONCE, and shared with
    every other graph query (_trade_edges memo). The power iteration
    itself runs on the DRIVER over the collected ≤625-row edge list:
    the nation dimension is fixed-size at every SF, so the distilled
    graph is dimension-bounded — 100 TB of lineitem still reduces to
    ≤|V|²=625 edges — and scheduling 12 distributed rounds over a
    25-row frame is pure job overhead (measured ~5s vs ~0.1s; same
    bounded-collect discipline as the d×d covariance and k-centroid
    collects). Vertex-scale graphs take the Pregel/contraction path
    (q_dedup_components); this operator's vertex set cannot grow.
    The oracle replays the same 12 iterates as unrolled CTEs; ranks
    round to 6 dp (damping contracts float-order noise, so iterates
    stay far inside the grain — rounding applied Spark-side so the
    HALF_UP grain matches the previous rendition and DuckDB)."""
    import numpy as np

    nation = load(spark, sf_dir, "nation", columns=["n_name"])
    names = sorted(r[0] for r in nation.collect())  # 25 rows, fixed dim
    erows = _trade_edges(spark, sf_dir).collect()  # ≤ |V|² = 625 rows
    idx = {nm: i for i, nm in enumerate(names)}
    n = len(names)
    src = np.array([idx[r["src"]] for r in erows], dtype=np.int64)
    dst = np.array([idx[r["dst"]] for r in erows], dtype=np.int64)
    w = np.array([r["w"] for r in erows], dtype=np.float64)
    w_out = np.zeros(n)
    np.add.at(w_out, src, w)
    has_out = np.zeros(n, dtype=bool)
    has_out[src] = True
    rank = np.ones(n)
    for _ in range(PR_ITERS):
        dm = float(rank[~has_out].sum())
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] * w / w_out[src])
        rank = 0.15 + PR_DAMPING * (contrib + dm / _N_NATIONS)
    out = spark.createDataFrame(
        [(nm, float(rank[idx[nm]])) for nm in names], "n_name string, rank double"
    )
    return out.select("n_name", floor_quantize("rank", 6).alias("pagerank"))


# ---------------------------------------------------------------------------
# Single-source shortest paths (Bellman-Ford, fixed iterations)
# ---------------------------------------------------------------------------

SP_ITERS = 4
SP_SOURCE = "FRANCE"
_SP_INF = 10**15  # unreachable sentinel; far above any 4-hop cost sum


def _sp_oracle() -> str:
    """Unrolled Bellman-Ford: d0..d{SP_ITERS} chained CTEs (same
    fixed-iterate staging as _pr_oracle; MATERIALIZED or the chain
    re-expands exponentially)."""
    step = """
d{i} AS MATERIALIZED (
  SELECT p.n_name,
         LEAST(p.dist, COALESCE(m.best, {inf})) AS dist
  FROM d{p} p
  LEFT JOIN (
    SELECT e.dst AS n_name, MIN(q.dist + e.cost) AS best
    FROM d{p} q JOIN edges e ON q.n_name = e.src
    GROUP BY e.dst
  ) m ON m.n_name = p.n_name
)"""
    chain = ",\n".join(step.format(i=i, p=i - 1, inf=_SP_INF) for i in range(1, SP_ITERS + 1))
    return f"""
WITH edges AS MATERIALIZED (
  SELECT src, dst, CAST(FLOOR(1000000.0 / w) AS BIGINT) AS cost
  FROM ({_pr_edges_sql()})
),
d0 AS MATERIALIZED (
  SELECT n_name,
         CAST(CASE WHEN n_name = '{SP_SOURCE}' THEN 0 ELSE {_SP_INF} END
              AS BIGINT) AS dist
  FROM nation
),
{chain}
SELECT n_name,
       CASE WHEN dist >= {_SP_INF} THEN CAST(NULL AS BIGINT) ELSE dist END
         AS dist
FROM d{SP_ITERS}
"""


@query("q_shortest_cost_paths", oracle=_sp_oracle())
def q_shortest_cost_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths over the nation trade graph
    (Bellman-Ford, SP_ITERS fixed relaxation rounds = paths up to
    SP_ITERS hops). Edge cost = floor(1e6 / trade volume): heavily
    traded lanes are cheap, so the result ranks every nation by its
    cheapest multi-hop trade route from the source — and because
    costs are exact integers, every min/+ is bit-exact in both
    engines with no rounding anywhere.

    The edge distillation is the shared _trade_edges join tree
    (checkpointed once, distributed); the relaxation rounds run on
    the DRIVER over the collected ≤|V|²=625-row edge list — the
    nation graph is dimension-bounded at every SF, so 4 synchronous
    Bellman-Ford rounds over ≤625 integer edges cost microseconds
    where 4 distributed join+agg rounds cost whole Spark jobs (same
    rationale and bound as the PageRank power iteration above).
    Every min/+ is exact integer arithmetic in both engines. The
    oracle replays the identical rounds as unrolled MATERIALIZED
    CTEs."""
    import math

    nation = load(spark, sf_dir, "nation", columns=["n_name"])
    names = sorted(r[0] for r in nation.collect())  # 25 rows, fixed dim
    # cost = FLOOR(1e6 / w): same double division + floor as the SQL twin.
    edges = [
        (r["src"], r["dst"], int(math.floor(1000000.0 / r["w"])))
        for r in _trade_edges(spark, sf_dir).collect()  # ≤ 625 rows
    ]
    dist = {nm: (0 if nm == SP_SOURCE else _SP_INF) for nm in names}
    for _ in range(SP_ITERS):
        # Synchronous rounds: relax against the PREVIOUS round's frame,
        # exactly like the join-per-round staging and the CTE chain.
        best: dict[str, int] = {}
        for s, d, c in edges:
            cand = dist[s] + c
            if cand < best.get(d, _SP_INF):
                best[d] = cand
        dist = {nm: min(dist[nm], best.get(nm, _SP_INF)) for nm in names}
    return spark.createDataFrame(
        [(nm, None if dist[nm] >= _SP_INF else dist[nm]) for nm in names],
        "n_name string, dist long",
    )


_DEDUP_CC_SQL = f"""
WITH RECURSIVE sh AS ({_SSET_SQL}),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
),
comp AS (SELECT doc_id, MIN(label) AS component_id FROM reach GROUP BY doc_id)
"""


@query(
    "q_dedup_savings",
    oracle=_DEDUP_CC_SQL
    + """
SELECT CAST(COUNT(*) AS BIGINT)                                   AS n_docs,
       CAST(COUNT(CASE WHEN c.doc_id = c.component_id THEN 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(d.n_chars) AS BIGINT)                             AS bytes_total,
       CAST(SUM(CASE WHEN c.doc_id = c.component_id
                     THEN d.n_chars ELSE 0 END) AS BIGINT)        AS bytes_kept,
       CASE WHEN abs(1.0 - CAST(SUM(CASE WHEN c.doc_id = c.component_id
                                 THEN d.n_chars ELSE 0 END) AS DOUBLE)
                   / SUM(d.n_chars)) < 4.5e9 THEN floor((1.0 - CAST(SUM(CASE WHEN c.doc_id = c.component_id
                                 THEN d.n_chars ELSE 0 END) AS DOUBLE)
                   / SUM(d.n_chars)) * 1e6 + 0.5) / 1e6 ELSE (1.0 - CAST(SUM(CASE WHEN c.doc_id = c.component_id
                                 THEN d.n_chars ELSE 0 END) AS DOUBLE)
                   / SUM(d.n_chars)) END                           AS savings_ratio
FROM comp c JOIN documents d ON d.doc_id = c.doc_id
""",
)
def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup APPLY step: after cluster resolution
    (q_dedup_components), keep one canonical document per cluster
    (doc_id == component min) and report the corpus-level savings —
    the number every dedup run is judged by. One broadcast-join of the
    tiny component map onto doc sizes plus a single global aggregate;
    the oracle recomputes the clusters with the recursive CTE and the
    identical keep rule."""
    comp = q_dedup_components(spark, sf_dir)
    sizes = load(spark, sf_dir, "documents", columns=["doc_id", "n_chars"])
    kept = F.col("doc_id") == F.col("component_id")
    return (
        sizes.join(comp, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.sum("n_chars").alias("bytes_total"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0))).alias("bytes_kept"),
        )
        .select(
            "n_docs",
            "n_kept",
            "bytes_total",
            "bytes_kept",
            floor_quantize(
                F.lit(1.0) - F.col("bytes_kept").cast("double") / F.col("bytes_total"), 6).alias("savings_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# G42 — near-dup graph degree distribution
# ---------------------------------------------------------------------------


@query(
    "q_dedup_graph_degree",
    oracle=f"""
WITH sh AS ({_SSET_SQL}),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
),
deg AS (
  SELECT doc_id, COUNT(*) AS degree
  FROM (SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)
  GROUP BY doc_id
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree
""",
)
def q_dedup_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup pair graph — the
    graph-shape diagnostic read BEFORE running component resolution:
    a heavy tail (one doc near-dup to thousands) predicts a giant
    component and motivates the star-fallback path in
    connected_components; near-uniform low degrees mean min-hook
    contraction converges in one or two rounds. Rides the shared pair
    machinery; degrees are one union+agg over the (already tiny) pair
    list, the distribution one more agg over the degree table."""
    pairs = jaccard_pairs_memo(spark, sf_dir)
    deg = (
        pairs.select(F.col("doc_id_1").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_id_2").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy(F.col("degree").cast("long").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# ---------------------------------------------------------------------------
# G47 — triangle counting + local clustering coefficient
# ---------------------------------------------------------------------------


@query(
    "q_triangle_count",
    oracle=f"""
WITH sh AS ({_SSET_SQL}),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
),
tri AS (
  SELECT e1.d1 AS a, e1.d2 AS b, e2.d2 AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.d1 = e1.d2
  JOIN pairs e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2
),
node_tri AS (
  SELECT doc_id, COUNT(*) AS triangles
  FROM (SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY 1
),
deg AS (
  SELECT doc_id, COUNT(*) AS degree
  FROM (SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(d.degree AS BIGINT)                  AS degree,
       CAST(COALESCE(t.triangles, 0) AS BIGINT)  AS triangles,
       CASE WHEN abs(CASE WHEN d.degree >= 2
                  THEN 2.0 * COALESCE(t.triangles, 0)
                       / (d.degree * (d.degree - 1))
                  ELSE 0.0 END) < 4.5e9 THEN floor((CASE WHEN d.degree >= 2
                  THEN 2.0 * COALESCE(t.triangles, 0)
                       / (d.degree * (d.degree - 1))
                  ELSE 0.0 END) * 1e6 + 0.5) / 1e6 ELSE (CASE WHEN d.degree >= 2
                  THEN 2.0 * COALESCE(t.triangles, 0)
                       / (d.degree * (d.degree - 1))
                  ELSE 0.0 END) END               AS local_cc
FROM deg d LEFT JOIN node_tri t ON t.doc_id = d.doc_id
""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over
    the near-dup pair graph — the cohesion diagnostic beside G42's
    degree distribution: high clustering means near-dup neighborhoods
    are genuine CLIQUES (one canonical doc survives per group), while
    high degree with low clustering means chain/star topology
    (transitive merging may over-collapse distinct documents).

    Compact-forward algorithm on the canonically-ordered edge list
    (a < b): a triangle a<b<c is found exactly once by joining
    e1=(a,b) with e2=(b,c) and closing via e3=(a,c) — two equi-joins
    on an edge list that is already candidate-pruned and tiny relative
    to the corpus. At adversarial skew the documented refinement is
    degree-ordered ranking (each edge oriented low-degree→high-degree
    before the wedge join, bounding wedges by arboricity) — same plan
    shape, different orientation rule. local_cc = 2T/(d(d−1)) from
    exact integers, rounded 6 dp; isolated-from-triangles nodes
    left-join to 0."""
    pairs = jaccard_pairs_memo(spark, sf_dir)
    e1 = pairs.select(F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b"))
    e2 = pairs.select(F.col("doc_id_1").alias("b2"), F.col("doc_id_2").alias("c"))
    e3 = pairs.select(F.col("doc_id_1").alias("a3"), F.col("doc_id_2").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    node_tri = (
        tri.select(F.col("a").alias("doc_id"))
        .unionByName(tri.select(F.col("b").alias("doc_id")))
        .unionByName(tri.select(F.col("c").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        pairs.select(F.col("doc_id_1").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_id_2").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    t = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    return deg.join(node_tri, "doc_id", "left").select(
        "doc_id",
        "degree",
        t.alias("triangles"),
        floor_quantize(
            F.when(
                F.col("degree") >= 2,
                2.0 * t / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)), 6).alias("local_cc"),
    )


# ---------------------------------------------------------------------------
# q_dedup_keeper — quality-based representative selection per cluster
# ---------------------------------------------------------------------------


@query(
    "q_dedup_keeper",
    oracle=f"""
WITH RECURSIVE sh AS ({_SSET_SQL}),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
),
comp AS (SELECT doc_id, MIN(label) AS component_id FROM reach GROUP BY doc_id),
scored AS (
  SELECT c.component_id, c.doc_id,
         len(list_distinct(regexp_extract_all(lower(d.text), '[a-z]+'))) AS score
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT component_id, doc_id, score,
         row_number() OVER (PARTITION BY component_id ORDER BY score DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY component_id) AS cluster_size
  FROM scored
)
SELECT component_id, doc_id AS keeper_doc_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(score AS BIGINT) AS keeper_score
FROM ranked WHERE rn = 1 AND cluster_size >= 2
""",
)
def q_dedup_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper SELECTION policy for near-dup clusters: instead of the
    canonical min-id keeper (q_dedup_components' downstream default),
    keep the highest-QUALITY member of each multi-document cluster —
    the RefinedWeb-style policy where dedup should retain the best
    copy, not the earliest-crawled one. Quality proxy = vocabulary
    richness (the q_quality_budget_curve score); ties fall back to
    min doc_id, keeping the choice total-ordered and reproducible.

    Plan: reads the session-memoized cluster map (cluster resolution
    is a maintained artifact, not per-query work), joins quality
    features computed in one corpus pass, and picks per-cluster
    argmax via a component-keyed window — the shuffle is keyed on
    cluster id and carries (id, score) pairs only. Only genuine
    clusters (size ≥ 2) are emitted: the keeper decision for
    singletons is vacuous. The oracle recomputes closure + argmax
    from scratch, so the memo path is value-checked end to end."""
    comp = q_dedup_components(spark, sf_dir)
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    score = F.size(
        F.array_distinct(F.regexp_extract_all(norm_lower("text"), F.lit("[a-z]+"), 0))
    ).alias("score")
    scored = comp.join(docs.select("doc_id", score), "doc_id")
    w = Window.partitionBy("component_id")
    ranked = scored.select(
        "component_id",
        "doc_id",
        "score",
        F.row_number()
        .over(Window.partitionBy("component_id").orderBy(F.desc("score"), "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("cluster_size") >= 2)).select(
        "component_id",
        F.col("doc_id").alias("keeper_doc_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("score").cast("long").alias("keeper_score"),
    )


# ---------------------------------------------------------------------------
# G53 — k-core decomposition of the near-dup graph
# ---------------------------------------------------------------------------

KCORE_K = 2        # minimum within-core degree
_KCORE_ROUNDS = 6  # pinned parallel-peel rounds (pytest asserts convergence)
# Edge count under which the peel runs on the driver (one collect);
# matches the connected-components union-find tail_threshold class.
_KCORE_DRIVER_EDGES_MAX = 100_000


def _kcore_oracle() -> str:
    """Unrolled MATERIALIZED-CTE parallel peel: each round drops ALL
    vertices with degree < k at once — deterministic, so after the
    pinned round count both engines hold identical state whether or
    not the peel has converged (convergence itself is pytest's job)."""
    rounds = []
    prev = "e0"
    for i in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
d{i} AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT d1 AS doc_id FROM {prev} UNION ALL SELECT d2 FROM {prev}
  ) GROUP BY doc_id HAVING COUNT(*) >= {KCORE_K}
),
e{i} AS MATERIALIZED (
  SELECT d1, d2 FROM {prev}
  WHERE d1 IN (SELECT doc_id FROM d{i}) AND d2 IN (SELECT doc_id FROM d{i})
)""")
        prev = f"e{i}"
    return f"""
WITH sh AS ({_SSET_SQL}),
e0 AS MATERIALIZED (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
),{','.join(rounds)}
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (SELECT d1 AS doc_id FROM {prev} UNION ALL SELECT d2 FROM {prev})
GROUP BY doc_id
"""


@query("q_kcore", oracle=_kcore_oracle())
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the near-dup pair graph: the maximal subgraph
    where every document keeps ≥ {KCORE_K} near-duplicate neighbors —
    the dense boilerplate/mirror clusters, separated from incidental
    pairwise matches (degree-1 fringe) that G42's distribution only
    counts. Standard parallel peeling: every round simultaneously
    removes ALL vertices below degree {KCORE_K}, then prunes edges
    with a dropped endpoint; the fixpoint is the k-core (Matula &
    Beck 1983; peeling is order-independent, so the parallel rounds
    and any sequential peel agree).

    Scale shape: each round is one degree partial-agg plus two
    SEMI-joins on the shrinking edge list — the same join/agg
    primitives as connected_components, cost geometric in practice
    (most fringe peels in round 1). Rounds are PINNED at
    {_KCORE_ROUNDS} with localCheckpoint every 3rd (shallow lineage,
    VERDICT r1 #8 discipline); the peel being deterministic, the
    oracle's unrolled rounds reach the identical state, and pytest
    asserts the fixpoint arrived before the ceiling (a deeper graph
    degrades to more rounds, not wrong output). Rides the session
    pair machinery (shingle memo) like q_triangle_count.

    Below {_KCORE_DRIVER_EDGES_MAX} edges the peel runs on the driver
    off one limit+collect — the same threshold-gated tail discipline
    as connected_components' union-find (tail_threshold above): the
    verified near-dup pair set is a tiny quotient of the corpus, and
    6 rounds × 3 shuffles over a few hundred rows is pure job
    overhead. The distributed rounds below are the past-the-bound
    path, byte-identical in semantics."""
    # The session pair memo is already checkpointed — each peel
    # round's degree agg re-reads columnar state instead of the
    # inverted-index join subtree (measured 9.4s → ~2s at sf0.1).
    edges = jaccard_pairs_memo(spark, sf_dir).select(
        F.col("doc_id_1").alias("d1"), F.col("doc_id_2").alias("d2")
    )
    head = edges.limit(_KCORE_DRIVER_EDGES_MAX + 1).collect()
    if len(head) <= _KCORE_DRIVER_EDGES_MAX:
        from collections import Counter

        E = [(r["d1"], r["d2"]) for r in head]
        for _ in range(_KCORE_ROUNDS):
            deg = Counter()
            for a, b in E:
                deg[a] += 1
                deg[b] += 1
            keep = {v for v, d in deg.items() if d >= KCORE_K}
            E = [(a, b) for a, b in E if a in keep and b in keep]
        core = Counter()
        for a, b in E:
            core[a] += 1
            core[b] += 1
        id_type = edges.schema["d1"].dataType
        schema = T.StructType(
            [
                T.StructField("doc_id", id_type),
                T.StructField("core_degree", T.LongType()),
            ]
        )
        return spark.createDataFrame(sorted(core.items()), schema)
    for i in range(1, _KCORE_ROUNDS + 1):
        deg = (
            edges.select(F.col("d1").alias("doc_id"))
            .unionByName(edges.select(F.col("d2").alias("doc_id")))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("doc_id")
        )
        edges = (
            edges.join(deg.withColumnRenamed("doc_id", "d1"), "d1", "left_semi")
            .join(deg.withColumnRenamed("doc_id", "d2"), "d2", "left_semi")
            .select("d1", "d2")
        )
        if i % 3 == 0:
            edges = checkpoint_frame(edges)
    return (
        edges.select(F.col("d1").alias("doc_id"))
        .unionByName(edges.select(F.col("d2").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


# ---------------------------------------------------------------------------
# G57 — degree assortativity of the near-dup graph
# ---------------------------------------------------------------------------


@query(
    "q_assortativity",
    oracle=f"""
WITH sh AS ({_SSET_SQL}),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
),
deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)
  GROUP BY doc_id
),
ends AS (
  SELECT ga.degree AS ka, gb.degree AS kb
  FROM pairs JOIN deg ga ON pairs.d1 = ga.doc_id JOIN deg gb ON pairs.d2 = gb.doc_id
),
sym AS (
  SELECT CAST(ka AS DECIMAL(19,0)) AS ka, CAST(kb AS DECIMAL(19,0)) AS kb
  FROM (SELECT ka, kb FROM ends UNION ALL SELECT kb, ka FROM ends)
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS k,
         CAST(sum(ka) AS DOUBLE) AS sx, CAST(sum(kb) AS DOUBLE) AS sy,
         CAST(sum(ka * kb) AS DOUBLE) AS sxy,
         CAST(sum(ka * ka) AS DOUBLE) AS sxx,
         CAST(sum(kb * kb) AS DOUBLE) AS syy,
         COUNT(*) AS cnt
  FROM sym
)
SELECT CAST(cnt / 2 AS BIGINT) AS n_edges,
       CASE WHEN abs(r) < 4.5e9 THEN floor(r * 1e6 + 0.5) / 1e6 ELSE r END
         AS assortativity
FROM (
  SELECT cnt,
         CASE WHEN (k * sxx - sx * sx) * (k * syy - sy * sy) > 0
              THEN (k * sxy - sx * sy)
                   / sqrt((k * sxx - sx * sx) * (k * syy - sy * sy))
              ELSE NULL END AS r
  FROM m) t
""",
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the near-dup graph: the
    Pearson correlation of endpoint degrees over the symmetrized edge
    list. Positive ⇒ hubs connect to hubs (one giant boilerplate
    blob — expect a monster component); negative ⇒ hub-and-spoke
    (template + many one-off variants — star-fallback territory).
    Completes the pre-flight graph triage beside G42 (degree
    distribution), G47 (clustering), and G53 (k-core): shape, local
    density, dense subgraphs, and now MIXING, all from the shared
    session pair machinery.

    Cost: two key-only joins of the (tiny) pair list against the
    degree table + one moment aggregate — a mergeable 6-number state
    on exact integers. The correlation is spelled as EXPLICIT moment
    sums in DECIMAL (degrees are integers, so the sums are exact) and
    ONE identical IEEE double tree on both engines (q_autocorr_daily /
    q_spearman_corr discipline; F.corr is also out because a graph
    whose degrees are all EQUAL — a corpus of exact-duplicate
    cliques — has zero degree variance, where DuckDB's corr is NULL
    but Spark's corr ANSI-throws DIVIDE_BY_ZERO; here the guard is
    the same CASE predicate both sides). Rounded 6 dp."""
    from grader_etl_spark.operators.llm_dedup import q_neardup_jaccard

    pairs = jaccard_pairs_memo(spark, sf_dir).select(
        F.col("doc_id_1").alias("d1"), F.col("doc_id_2").alias("d2")
    )
    deg = (
        pairs.select(F.col("d1").alias("doc_id"))
        .unionByName(pairs.select(F.col("d2").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    ga = deg.select(F.col("doc_id").alias("d1"), F.col("degree").alias("ka"))
    gb = deg.select(F.col("doc_id").alias("d2"), F.col("degree").alias("kb"))
    ends = pairs.join(F.broadcast(ga), "d1").join(F.broadcast(gb), "d2").select("ka", "kb")
    sym = ends.unionByName(
        ends.select(F.col("kb").alias("ka"), F.col("ka").alias("kb"))
    ).select(
        F.col("ka").cast("decimal(19,0)").alias("ka"),
        F.col("kb").cast("decimal(19,0)").alias("kb"),
    )
    x, y = F.col("ka"), F.col("kb")
    m = sym.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.count(F.lit(1)).alias("cnt"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    denprod = (k * sxx - sx * sx) * (k * syy - sy * sy)
    r = F.when(denprod > F.lit(0.0), (k * sxy - sx * sy) / F.sqrt(denprod))
    return m.select(
        (F.col("cnt") / 2).cast("long").alias("n_edges"),
        floor_quantize(r, 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# G47b — degree-ordered triangle counting (the skew refinement, executable)
# ---------------------------------------------------------------------------


@query(
    "q_triangle_count_ordered",
    oracle=f"""
WITH sh AS ({_SSET_SQL}),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
),
tri AS (
  SELECT e1.d1 AS a, e1.d2 AS b, e2.d2 AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.d1 = e1.d2
  JOIN pairs e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2
),
node_tri AS (
  SELECT doc_id, COUNT(*) AS triangles
  FROM (SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY 1
),
deg AS (
  SELECT doc_id, COUNT(*) AS degree
  FROM (SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(d.degree AS BIGINT)                  AS degree,
       CAST(COALESCE(t.triangles, 0) AS BIGINT)  AS triangles
FROM deg d LEFT JOIN node_tri t ON t.doc_id = d.doc_id
""",
)
def q_triangle_count_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_triangle_count's documented SKEW refinement, executable:
    orient every edge from its lower-(degree, id) endpoint to the
    higher one before the wedge join. Wedges then form only at each
    node's OUT-neighbors, whose count is bounded by graph arboricity
    (Chiba–Nishizeki) instead of raw degree — on a star graph the hub
    builds zero wedges instead of d², which is the difference between
    a join that finishes and one that doesn't once near-dup hubs
    appear. Identical output to the id-ordered version (every
    triangle found exactly once under any total order), so the SAME
    naive oracle hash-checks it — the machinery changes, the contract
    doesn't (the V4/J13/O5 discipline). Rides the session pair
    machinery."""
    pairs = jaccard_pairs_memo(spark, sf_dir).select(
        F.col("doc_id_1").alias("d1"), F.col("doc_id_2").alias("d2")
    )
    deg = (
        pairs.select(F.col("d1").alias("doc_id"))
        .unionByName(pairs.select(F.col("d2").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # Total-order rank key: degree·2^32 + id (both long, id < 2^32).
    key = (F.col("degree") * F.lit(1 << 32) + F.col("doc_id")).alias("k")
    keyed = deg.select("doc_id", key)
    k1 = keyed.select(F.col("doc_id").alias("d1"), F.col("k").alias("k1"))
    k2 = keyed.select(F.col("doc_id").alias("d2"), F.col("k").alias("k2"))
    ek = pairs.join(F.broadcast(k1), "d1").join(F.broadcast(k2), "d2")
    oriented = ek.select(
        F.when(F.col("k1") < F.col("k2"), F.col("d1")).otherwise(F.col("d2")).alias("src"),
        F.when(F.col("k1") < F.col("k2"), F.col("d2")).otherwise(F.col("d1")).alias("dst"),
        F.when(F.col("k1") < F.col("k2"), F.col("k2")).otherwise(F.col("k1")).alias("kdst"),
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    closing = oriented.select(F.col("src").alias("cy"), F.col("dst").alias("cz"))
    tri = (
        o1.join(o2, (F.col("o1.src") == F.col("o2.src")) & (F.col("o1.kdst") < F.col("o2.kdst")))
        .select(
            F.col("o1.src").alias("x"),
            F.col("o1.dst").alias("y"),
            F.col("o2.dst").alias("z"),
        )
        .join(closing, (F.col("y") == F.col("cy")) & (F.col("z") == F.col("cz")))
        .select("x", "y", "z")
    )
    node_tri = (
        tri.select(F.col("x").alias("doc_id"))
        .unionByName(tri.select(F.col("y").alias("doc_id")))
        .unionByName(tri.select(F.col("z").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return deg.join(node_tri, "doc_id", "left").select(
        "doc_id",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
    )
