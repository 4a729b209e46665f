"""Corpus deduplication operators (north star, BASELINE.json): exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding near-dup.

Scale design: the exact/fingerprint paths are hash-groupBys (one
shuffle, map-side partial). The pairwise paths NEVER do an unblocked
cross join — even the EXACT Jaccard query generates candidates from a
shared-shingle inverted index (lossless pruning) and computes
intersection sizes as join-hit counts; MinHash/LSH banding and SimHash
prefix-bucketing are the probabilistic variants for corpora where the
shared-token candidate set itself is too large — pytest-verified
against the exact output (tests/test_llm_dedup.py) AND value-oracled:
both pipelines are integer-deterministic on the cross-engine md5_32
base hash (functions/hashing.py), so the DuckDB oracles replay them
bit-exactly.

No Python UDFs anywhere: shingles, MinHash permutations, SimHash bit
votes and Hamming distances are all higher-order array expressions
(md5/conv/transform/aggregate), so signature computation stays inside
whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from grader_etl_spark.functions.hashing import MD5_32_SQL, md5_32
from grader_etl_spark.io import (
    VALID_EMBEDDINGS_SQL,
    fan_out,
    kernel_scatter_cap,
    load,
    valid_vectors,
)
from grader_etl_spark.registry import memo_checkpoint, query
from grader_etl_spark.functions.quantize import floor_quantize
from grader_etl_spark.functions.textnorm import WS_RE, norm_lower

SHINGLE_K = 3  # words per shingle

# MinHash parameters: 64 permutations → 16 bands × 4 rows.
MINHASH_PERMS = 64
LSH_BANDS = 16
_MERSENNE_P = (1 << 31) - 1
# Deterministic permutation coefficients (a must be non-zero mod p).
_PERM_A = [(2 * i + 1) * 2654435761 % _MERSENNE_P for i in range(MINHASH_PERMS)]
_PERM_B = [(i + 1) * 40503 * 65537 % _MERSENNE_P for i in range(MINHASH_PERMS)]


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles as an array column (empty-safe).

    Built as zip_with over k shifted views of the token array, NOT as
    transform(i -> element_at(toks, i+j)): Catalyst's projection
    collapse inlines the tokenizing split() into every element_at
    reference, so the per-index form re-splits the document ~k×len
    times (measured ~50× slower on the documents fixture). The token
    array is let-bound through a single-element-array transform (the
    same trick as winnow_fingerprints), so split() runs exactly ONCE
    per row and each shifted view is an attribute read. zip_with pads
    the shorter shifted arrays with null, F.concat propagates the
    null, and the filter drops the k-1 tail slots — leaving exactly
    len-k+1 shingles."""

    def build(toks: Column) -> Column:
        out = toks
        for j in range(1, k):
            shifted = F.slice(toks, j + 1, 1 << 30)
            out = F.zip_with(out, shifted, lambda acc, t: F.concat(acc, F.lit(" "), t))
        return F.array_distinct(F.filter(out, lambda s: s.isNotNull()))

    return F.element_at(
        F.transform(F.array(F.split(F.trim(text), WS_RE)), build), 1
    )


def _jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter.cast("double") / union


# Corpus shingle-index memo: (doc_id, sset) materialized once per
# corpus per session. Production analogue: a MAINTAINED shingle /
# inverted-index table living next to the corpus — every near-dup
# operator (exact Jaccard, MinHash, cluster resolution, curation)
# reads the same artifact; re-tokenizing the corpus inside each query
# would never happen at 100 TB. localCheckpoint (not persist) so
# catalog-wide cache clears between queries don't silently drop it;
# the bound is one shingle array per document per scale factor.
_SHINGLE_CACHE: dict[tuple, DataFrame] = {}


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyed by session too: a checkpointed frame is unusable after a
    # session restart, so a new session rebuilds rather than replays.
    key = (spark, sf_dir)
    if key not in _SHINGLE_CACHE:
        docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
        _SHINGLE_CACHE[key] = memo_checkpoint(
            fan_out(docs).select("doc_id", shingles(F.col("text")).alias("sset"))
        )
    return _SHINGLE_CACHE[key]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact_docs",
    oracle="""
SELECT md5(text) AS fp,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*)    AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content fingerprint, keep min id.
    At 100 TB this is the cheapest dedup pass (shuffle carries the
    16-byte hash, not the document)."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (the exact verification semantics)
# ---------------------------------------------------------------------------

def shared_shingle_pairs(sh: DataFrame, id_col: str = "doc_id", shingle_col: str = "sset") -> DataFrame:
    """BASELINE exact candidate generation via the plain inverted
    index: explode shingles, equi-join on the shingle, distinct the
    (a, b) pairs. Any pair with Jaccard > 0 shares >= 1 shingle, so no
    qualifying pair can be missed — unlike LSH this is a lossless
    pruning.

    Scale math: candidates = sum over shingles of C(freq, 2) — bounded
    by the corpus's shingle-frequency SKEW, not by n², and that skew
    is exactly what blows up on real corpora (the round-4 shuffle
    audit measured this family at 27× bytes for 10× input). The
    production path is therefore ``prefix_filtered_candidates`` below,
    which prunes the skew head losslessly; this plain form stays as
    the audit baseline the prefix path is pytest-pinned equal to
    (restricted to pairs at the threshold)."""
    ex = sh.select(id_col, F.explode(shingle_col).alias("__s"))
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_id_1"), F.col(f"b.{id_col}").alias("doc_id_2"))
        .distinct()
    )


# df-ordered index memo, keyed by the IDENTITY of the shingle frame it
# derives from (the shingle memo returns one stable frame per
# (session, corpus), so identity is the right key — and when
# clear_session_memos drops the shingle cache, the rebuilt frame is a
# new object and this index rebuilds with it). The value tuple holds a
# strong ref to the key frame so a GC'd id can never alias. Three
# consumers share it per session: the pair-memo build, q_neardup_prefix
# and q_containment_dup.
_DF_ORDER_CACHE: dict[int, tuple[DataFrame, DataFrame]] = {}


def _df_ordered_arrays(sh: DataFrame) -> DataFrame:
    """(doc_id, sz, ids): every document's shingles as INT64 SHINGLE
    IDS, sorted under the global (document-frequency asc, shingle asc)
    TOTAL order — the shared, session-memoized index every
    prefix-filter candidate generator slices and every verify
    intersects. The df table is vocabulary-sized (partial-agg before
    its shuffle); hot shingles sort to the END of the order, which is
    what lets a prefix slice drop the frequency-skew head.

    The ids come from ``monotonically_increasing_id`` over the DISTINCT
    vocabulary — an INJECTIVE shingle→int64 map (no window, no
    single-partition sort, no hash-collision caveat), frozen by the
    memo checkpoint so every consumer sees one consistent dictionary
    per session. Intersection COUNTS and the candidate join are
    invariant to the id values, so results are deterministic even
    though the ids themselves are not. Carrying 8-byte ids instead of
    ~20-char shingle strings cuts the candidate-join key width and —
    the measured win — the verify stage's per-pair payload ~10×
    (string-array assembly dominated the profile at sf0.1)."""
    key = id(sh)
    if key not in _DF_ORDER_CACHE:
        ex = sh.select("doc_id", F.explode("sset").alias("s"))
        freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        vocab = freq.withColumn("sid", F.monotonically_increasing_id())
        built = (
            ex.join(vocab, "s")
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("df", "s", "sid"))).alias("arr"))
            .select(
                "doc_id",
                F.size("arr").alias("sz"),
                F.transform("arr", lambda x: x["sid"]).alias("ids"),
            )
        )
        _DF_ORDER_CACHE[key] = (sh, memo_checkpoint(built))
    return _DF_ORDER_CACHE[key][1]


def prefix_filtered_candidates(sh: DataFrame, tau_num: int, tau_den: int) -> DataFrame:
    """PPJoin-style prefix-filtered candidate pairs (Xiao et al., WWW
    2008), LOSSLESS for Jaccard ≥ τ = tau_num/tau_den: every pair with
    J ≥ τ appears in the output; pairs below τ may or may not.

    Each document indexes only its PREFIX under the global
    (document-frequency asc, shingle asc) total order — the first
    |d| − ⌈τ·|d|⌉ + 1 shingles. The classical prefix lemma makes this
    lossless: J(A,B) ≥ τ ⟹ |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉, and two sets
    with overlap ≥ α under a shared total order must collide within
    their first |X| − α + 1 elements. The real win at scale: the HOT
    shingles (high df) sort to the END of the order, so the
    frequency-skewed posting lists that make Σ C(freq,2) super-linear
    in the plain inverted index are exactly the ones dropped from the
    candidate join — the round-4 shuffle audit's one super-linear
    family, pruned at the source.

    A second integer POSITIONAL filter (PPJoin's other lemma) prunes
    per collision row: the c common tokens appear in the same relative
    order in both lists, so at the pair's first common token
    (positions i, j) c ≤ min(|A|−i, |B|−j); rows whose bound cannot
    reach the τ requirement ((n+d)·c ≥ n·(|A|+|B|)) drop before the
    distinct, and a qualifying pair's first-common-token row always
    survives — still lossless. At (0,0) it subsumes the classic
    length filter.

    All threshold tests are pure INTEGER arithmetic (τ rational), so
    no float boundary exists anywhere in candidate generation."""
    n, d = tau_num, tau_den
    # Prefix length p = sz − ⌈n·sz/d⌉ + 1, in integer arithmetic.
    plen = f"sz - ((sz * {n} + {d - 1}) div {d}) + 1"
    pref = _df_ordered_arrays(sh).select(
        "doc_id",
        "sz",
        F.posexplode(F.expr(f"slice(ids, 1, {plen})")).alias("pos", "s"),
    )
    a = pref.alias("a")
    b = pref.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                (n + d)
                * F.least(
                    F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
                )
                >= n * (F.col("a.sz") + F.col("b.sz"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )


def containment_prefix_candidates(sh: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """Candidate (doc_id_1=smaller, doc_id_2=larger) pairs, LOSSLESS
    for directed containment c/|src| ≥ t = t_num/t_den in EITHER
    direction. A pair can qualify in some direction iff
    c ≥ ⌈t·min(|A|,|B|)⌉ (the smaller side is always the easier
    source), so candidates come from a ONE-SIDED prefix filter: the
    size-ordered smaller doc indexes only its df-ordered prefix of
    length |A| − ⌈t·|A|⌉ + 1, probed against the larger doc's FULL
    token list. (The larger side cannot be prefix-pruned at all — a
    tiny doc can sit entirely inside a huge doc's hot-shingle
    suffix — which is exactly why symmetric-Jaccard prefix filtering
    does not transfer to containment unchanged.)

    Losslessness: if all c common tokens sat outside A's prefix,
    A would hold ≥ (|A| − ⌈t·|A|⌉ + 1) non-common tokens before them,
    so |A| ≥ that + c ⟹ c ≤ ⌈t·|A|⌉ − 1 < ⌈t·min⌉ — contradiction.
    The positional filter is the same first-common-token suffix bound
    as the symmetric case: c ≤ min(|A|−i, |B|−j), so rows with
    t_den·min(...) < t_num·|A| drop losslessly. All integer
    arithmetic. Candidate mass is Σ_s pref_freq(s)·freq(s) instead of
    the plain index's Σ_s C(freq(s), 2): the hot head collapses
    because hot shingles rarely make a prefix."""
    n, d = t_num, t_den
    base = _df_ordered_arrays(sh)
    plen = f"sz - ((sz * {n} + {d - 1}) div {d}) + 1"
    a = base.select(
        "doc_id", "sz", F.posexplode(F.expr(f"slice(ids, 1, {plen})")).alias("pos", "s")
    ).alias("a")
    b = base.select("doc_id", "sz", F.posexplode("ids").alias("pos", "s")).alias("b")
    # Strict (size, id) total order: each unordered pair is generated
    # exactly once with `a` the smaller side.
    size_order = (F.col("a.sz") < F.col("b.sz")) | (
        (F.col("a.sz") == F.col("b.sz")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & size_order
            & (
                d
                * F.least(
                    F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
                )
                >= n * F.col("a.sz")
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )


_JACCARD_THRESHOLD = 0.25
# The same threshold as an exact rational for the prefix filter's
# integer arithmetic (J ≥ 1/4 ⟺ 5·|A∩B| ≥ |A| + |B|).
_JACCARD_TAU = (1, 4)
assert _JACCARD_TAU[0] / _JACCARD_TAU[1] == _JACCARD_THRESHOLD


# Session memo of the verified Jaccard pair list (keyed by corpus
# dir): the near-dup EDGE SET feeds eight downstream consumers
# (components, keeper, degree distribution, triangles ×2, k-core,
# assortativity, cross-source matrix, PRF audit) — localCheckpointed
# once so each pays a columnar re-read instead of re-running the
# inverted-index self-join (~1-2 s each at sf0.1). Engine-side
# analogue of the maintained pair table a production dedup keeps;
# same discipline as the shingle memo above.
_JACCARD_PAIR_CACHE: dict[tuple, DataFrame] = {}


def jaccard_pairs_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id_1, doc_id_2) near-dup pairs at the session threshold,
    computed once per (session, corpus dir)."""
    key = (spark, sf_dir)
    if key not in _JACCARD_PAIR_CACHE:
        _JACCARD_PAIR_CACHE[key] = memo_checkpoint(
            q_neardup_jaccard(spark, sf_dir).select("doc_id_1", "doc_id_2")
        )
    return _JACCARD_PAIR_CACHE[key]


@query(
    "q_neardup_jaccard",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - {SHINGLE_K - 2}, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM documents
)
SELECT a.doc_id AS doc_id_1,
       b.doc_id AS doc_id_2,
       CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
         / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
         AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
        / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
      >= {_JACCARD_THRESHOLD}
""",
)
def q_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.25.

    Exact END-TO-END and never all-pairs: candidates come from the
    PPJoin PREFIX-FILTERED index (``prefix_filtered_candidates`` at
    τ = 1/4) rather than the plain shared-shingle inverted index —
    the plain index's candidate mass is Σ C(freq,2) over the
    shingle-frequency distribution, whose skew head made this family
    the repo's one measured super-linear shuffle (27× bytes at 10×
    input, round-4 audit); the df-ordered prefix drops exactly that
    head while the prefix lemma keeps every J ≥ 1/4 pair. Since this
    query feeds ``jaccard_pairs_memo``, all downstream edge-set
    consumers (components, keeper, triangles, k-core, …) inherit the
    near-linear shape.

    Verification ships shingle ARRAYS only for surviving candidates
    (array_intersect per pair — bounded by the candidate count, not
    the corpus), then J = c / (|A| + |B| − c) as one float division
    of bit-identical integers; the ≥ 0.25 boundary cannot flip
    cross-engine because c/(s−c) = 0.25 exactly iff 5c = s and the
    correctly-rounded quotient is > 2⁻⁵⁴ away from 0.25 otherwise.
    The DuckDB oracle computes the naive all-pairs semantics, proving
    the pruning loses nothing. q_neardup_minhash below is the
    probabilistic variant for corpora where even prefix-filtered
    exact verification is too expensive."""
    sh = shingled_docs(spark, sf_dir)
    idx = _df_ordered_arrays(sh)
    # fan_out: AQE coalesces the MiB-scale candidate pairs to ~1
    # partition, single-tasking the per-pair array_intersect verify
    # (q_containment_dup measurement); scattering the 16-byte pairs is
    # near-free. Guarded no-op at volume.
    # Kernel-class byte gate (round-9): gate on the CORPUS scan's
    # file-backed stats (via the shingle memo's source), not the pair
    # join's multiplicative estimate (~1000× inflated at sf0.1) —
    # candidate mass is near-linear in corpus bytes, so past the cap
    # the pair exchange has real volume and AQE no longer coalesces
    # it to ~1 task (the only failure the scatter exists to fix).
    cand = fan_out(
        prefix_filtered_candidates(sh, *_JACCARD_TAU),
        max_bytes=kernel_scatter_cap(),
        stats_of=sh,
    )
    # Verify on the index's INT64 id arrays (injective dictionary, so
    # |ids_1 ∩ ids_2| IS |A∩B| exactly); both sides are |docs|-row
    # frames (MiB-scale) broadcast so the candidate frame never
    # shuffles, and the per-pair payload is 8-byte ids, not shingle
    # strings (~10x lighter — this stage dominated the sf0.1 profile).
    s1 = idx.select(F.col("doc_id").alias("doc_id_1"), F.col("sz").alias("sz_1"), F.col("ids").alias("ids_1"))
    s2 = idx.select(F.col("doc_id").alias("doc_id_2"), F.col("sz").alias("sz_2"), F.col("ids").alias("ids_2"))
    c = F.size(F.array_intersect("ids_1", "ids_2"))
    return (
        cand.join(F.broadcast(s1), "doc_id_1")
        .join(F.broadcast(s2), "doc_id_2")
        .withColumn("c", c)
        .select(
            "doc_id_1",
            "doc_id_2",
            (
                F.col("c").cast("double")
                / (F.col("sz_1") + F.col("sz_2") - F.col("c"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding (the scale path; rows-only + pytest recall)
# ---------------------------------------------------------------------------


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", shingle_col: str = "sset") -> DataFrame:
    """64-permutation MinHash signatures: h_j(S) = min over s∈S of
    (a_j * md5_32(s) + b_j) mod p. Returns (id_col, sig array<long>).
    md5_32 is the cross-engine hash (functions/hashing.py), which is
    what lets the DuckDB oracle replay the whole LSH pipeline
    value-exactly; a*h stays < 2^63 (a < 2^31, h < 2^32).

    Shape matters here: explode shingles to rows, hash each ONCE, then
    64 ``min`` aggregates over the hash column. A nested
    array-expression version is semantically identical but Catalyst's
    projection collapse re-inlines the shingle+crc32 computation into
    every permutation (64× recompute — measured ~40× slower); the
    explode+groupBy form hashes once, partial-aggregates map-side, and
    shuffles only 64 longs per document."""
    hashed = sh.select(id_col, F.explode(shingle_col).alias("s")).select(
        id_col, md5_32(F.col("s")).alias("h")
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % _MERSENNE_P).alias(f"mh{j}")
        for j, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    ]
    sig_df = hashed.groupBy(id_col).agg(*mins)
    return sig_df.select(
        id_col, F.array(*[F.col(f"mh{j}") for j in range(MINHASH_PERMS)]).alias("sig")
    )


# MinHash machinery memos (keyed by session + corpus dir, like the
# shingle index): signatures and LSH candidate pairs are derived
# artifacts shared by three consumers (the near-dup query itself and
# the calibration/PRF audits) — each was re-running the 64-permutation
# signature pass and the banding self-join per query.
_MINHASH_SIG_CACHE: dict[tuple, DataFrame] = {}
_LSH_CAND_CACHE: dict[tuple, DataFrame] = {}


def minhash_signatures_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _MINHASH_SIG_CACHE:
        _MINHASH_SIG_CACHE[key] = memo_checkpoint(
            minhash_signatures(shingled_docs(spark, sf_dir))
        )
    return _MINHASH_SIG_CACHE[key]


def lsh_candidates_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _LSH_CAND_CACHE:
        _LSH_CAND_CACHE[key] = memo_checkpoint(
            lsh_candidate_pairs(minhash_signatures_memo(spark, sf_dir))
        )
    return _LSH_CAND_CACHE[key]


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the signature into LSH buckets and equi-join for candidate
    pairs. This is the anti-cross-join: the only join key is the
    band-bucket string, so at 100 TB the shuffle is (bands × docs)
    rows of ~50 bytes, and AQE's skew split handles hot buckets."""
    rows = MINHASH_PERMS // LSH_BANDS
    bands = F.array(
        *[
            F.concat_ws(
                ",",
                F.lit(i),
                *[F.element_at("sig", i * rows + r + 1) for r in range(rows)],
            )
            for i in range(LSH_BANDS)
        ]
    )
    buckets = sig_df.select(id_col, F.explode(bands).alias("bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_id_1"), F.col(f"b.{id_col}").alias("doc_id_2"))
        .distinct()
    )


def _minhash_ctes() -> str:
    """Shared WITH-body replaying the MinHash+LSH pipeline in DuckDB
    through the candidate stage: sh → hashed → sig → buckets → cands.
    Every stage is integer-deterministic (md5_32 base hash, affine
    perms mod p, band strings, equi-join), generated from the same
    _PERM_A/_PERM_B/_MERSENNE_P constants the Spark side uses."""
    rows = MINHASH_PERMS // LSH_BANDS
    h = MD5_32_SQL.format(expr="s")
    mins = ",\n         ".join(
        f"MIN(({a} * h + {b}) % {_MERSENNE_P}) AS mh{j}"
        for j, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    bands = ",\n      ".join(
        f"CONCAT_WS(',', '{i}', "
        + ", ".join(f"mh{i * rows + r}" for r in range(rows))
        + ")"
        for i in range(LSH_BANDS)
    )
    return f"""sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - {SHINGLE_K - 2}, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM documents
),
hashed AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest(sset) AS s FROM sh)
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
),
buckets AS (
  SELECT doc_id, unnest([
      {bands}
  ]) AS bucket
  FROM sig
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""


_JAC_AB_SQL = (
    "CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)"
    " / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))"
)


def _minhash_oracle() -> str:
    """Full LSH pipeline + exact-Jaccard verify — a true value check,
    not a recall bound (see _minhash_ctes)."""
    return f"""
WITH {_minhash_ctes()}
SELECT c.doc_id_1, c.doc_id_2, {_JAC_AB_SQL} AS jaccard
FROM cands c
JOIN sh a ON a.doc_id = c.doc_id_1
JOIN sh b ON b.doc_id = c.doc_id_2
WHERE {_JAC_AB_SQL} >= {_JACCARD_THRESHOLD}
"""


@query("q_neardup_minhash", oracle=_minhash_oracle())
def q_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle → 64-perm signature → 16-band
    buckets → candidate equi-join → exact-Jaccard verification of
    candidates only. Output shape matches q_neardup_jaccard; recall
    against it is asserted in tests/test_llm_dedup.py, and the DuckDB
    oracle (_minhash_oracle) replays the identical integer pipeline
    end to end — the md5_32 cross-engine base hash is what makes the
    signatures engine-portable."""
    # Consumed by the signature pass and both exact-verify branches —
    # all reading the session-materialized shingle/candidate memos.
    sh = shingled_docs(spark, sf_dir)
    cands = lsh_candidates_memo(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("sset").alias("sset_1"))
    b = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("sset").alias("sset_2"))
    return (
        cands.join(a, "doc_id_1")
        .join(b, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            _jaccard(F.col("sset_1"), F.col("sset_2")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# SimHash (rows-only + pytest)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(text: Column) -> Column:
    """32-bit SimHash over word md5_32 hashes: per bit, the sign of
    the ±1 vote sum across tokens; bits packed into a long.

    The bit loop is a Python-side loop over 32 fixed masks (shift
    amounts must be Python ints in Spark), emitting one aggregate
    lambda per bit — still a single codegen'd projection."""
    hashes = F.transform(F.split(F.trim(text), WS_RE), lambda t: md5_32(t))

    def vote(mask: int) -> Column:
        # closure (not a default arg — pyspark counts lambda params)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        mask = 1 << i
        sig = sig + F.when(vote(mask) > 0, F.lit(mask).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash via explode+groupBy — each token is hashed ONCE, then
    32 conditional-sum votes partial-aggregate map-side. The column
    function ``simhash`` above is semantically identical but inlines
    the tokenize+crc32 into each of its 32 per-bit aggregates under
    projection collapse (32× recompute) — fine for unit-test rows,
    wrong shape for a corpus scan."""
    hashed = docs.select(
        id_col, F.explode(F.split(F.trim(F.col(text_col)), WS_RE)).alias("t")
    ).select(id_col, md5_32(F.col("t")).alias("h"))
    # One F.expr parse per tower instead of ~128 py4j column calls
    # (~0.9s of driver time per construction) — the parsed trees are
    # the exact per-bit CASE sums the oracle replays.
    votes = [
        F.expr(f"sum(CASE WHEN (h & {1 << i}) != 0 THEN 1 ELSE -1 END)").alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    sig = F.expr(
        "CAST(0 AS BIGINT) + "
        + " + ".join(
            f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END)"
            for i in range(SIMHASH_BITS)
        )
    )
    # Docs whose text yields no tokens simply have no signature row —
    # they can't near-dup anything, so no join-back is needed.
    return hashed.groupBy(id_col).agg(*votes).select(id_col, sig.alias("sig"))


def _simhash_oracle() -> str:
    """DuckDB replay of the SimHash pipeline — like _minhash_oracle,
    integer-deterministic end to end on the md5_32 base hash: token
    hashes → 32 ±1 vote sums → packed signature → top-16-bit bucket
    join → bit_count Hamming verify."""
    h = MD5_32_SQL.format(expr="t")
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h & {1 << i}) != 0 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    pack = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(SIMHASH_BITS)
    )
    return f"""
WITH hashed AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS t
        FROM documents)
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hashed GROUP BY doc_id
),
sig AS (
  SELECT doc_id, CAST({pack} AS BIGINT) AS sig FROM votes
),
b AS (SELECT doc_id, sig, sig >> {SIMHASH_BITS - 16} AS bucket FROM sig)
SELECT x.doc_id AS doc_id_1,
       y.doc_id AS doc_id_2,
       CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
FROM b x JOIN b y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.sig, y.sig)) <= 6
"""


@query("q_dedup_simhash", oracle=_simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: bucket on the top 16 bits (candidate
    blocking), then keep pairs with Hamming distance ≤ 6 on the full
    32-bit signature. bit_count is built-in, so the verify stays in
    codegen. Value-oracled: every stage is integer math on the
    cross-engine md5_32 hash, so the DuckDB oracle replays it
    exactly."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    # Both self-join sides read the signatures; hash the corpus once.
    sig = simhash_signatures(docs).withColumn(
        "bucket", F.shiftright("sig", SIMHASH_BITS - 16)
    ).persist()
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (oracle-checked)
# ---------------------------------------------------------------------------

# The fixture's same-label cosine tops out near 0.47 (no planted
# duplicates); 0.40 keeps the operator's output non-trivial.
def with_norm(e: DataFrame, v_col: str = "v") -> DataFrame:
    """Attach the L2 norm once per vector — pairwise cosine then costs
    one dot product, not a dot plus two re-derived norms (projection
    collapse would otherwise inline the double-cast transform and both
    norm folds into every pair)."""
    v = F.col(v_col)
    return e.withColumn(
        "norm",
        F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)),
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot product (DuckDB list_dot_product
    bit-compatible)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


_COSINE_THRESHOLD = 0.40


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns — sequential
    left-to-right fold, bit-compatible with DuckDB's list_dot_product."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    # try_divide: an all-zero vector is VALID input with an undefined
    # cosine — NULL (DuckDB's /0), not the ANSI throw.
    return F.try_divide(dot, na * nb)


@query(
    "q_neardup_embedding",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM {VALID_EMBEDDINGS_SQL}
)
SELECT a.vec_id AS vec_id_1,
       b.vec_id AS vec_id_2,
       list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {_COSINE_THRESHOLD}
""",
)
def q_neardup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: candidate blocking on the coarse cluster
    column (label — the IVF idea: compare only within a cell), exact
    cosine ≥ threshold on candidates. At 100 TB the label comes from a
    cheap coarse quantizer; the pairwise work is per-cell, not global.
    Norms are precomputed per vector; each candidate pair pays exactly
    one 64-dim dot product."""
    emb = fan_out(valid_vectors(load(spark, sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])))
    e = with_norm(
        emb.select(
            "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = F.try_divide(dot(F.col("a.v"), F.col("b.v")), F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_id_1"),
            F.col("b.vec_id").alias("vec_id_2"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= _COSINE_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# q_incremental_dedup — new-batch vs existing-corpus dedup (ingestion shape)
# ---------------------------------------------------------------------------

INCR_SPLIT = 400  # doc_id < INCR_SPLIT plays the existing corpus


@query(
    "q_incremental_dedup",
    oracle=f"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS fp
  FROM documents
),
existing AS (SELECT DISTINCT fp FROM fp WHERE doc_id < {INCR_SPLIT}),
batch AS (SELECT * FROM fp WHERE doc_id >= {INCR_SPLIT})
SELECT b.doc_id,
       b.fp,
       (e.fp IS NOT NULL) AS dup_of_corpus
FROM batch b LEFT JOIN existing e ON b.fp = e.fp
""",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup: label each NEW-batch document (doc_id ≥
    {INCR_SPLIT} stands in for the arriving batch) by whether its
    normalized fingerprint already exists in the corpus (doc_id <
    {INCR_SPLIT}). This is the document-corpus twin of the event
    store's idempotent append (plans/pipeline.py): the probe side
    carries 16-byte fingerprints, never text, and at 100 TB the
    existing-fingerprint set is a maintained table (the dedup ledger),
    not a rescan — exactly how incremental corpus ingestion dedups
    against history. Left join (not anti) so the query also reports
    WHICH batch docs were dropped."""
    fp = F.md5(F.regexp_replace(norm_lower("text"), WS_RE, " "))
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"]).select(
        "doc_id", fp.alias("fp")
    )
    existing = (
        docs.filter(F.col("doc_id") < INCR_SPLIT).select("fp").distinct()
        .withColumn("_hit", F.lit(1))
    )
    batch = docs.filter(F.col("doc_id") >= INCR_SPLIT)
    return batch.join(F.broadcast(existing), "fp", "left").select(
        "doc_id", "fp", F.col("_hit").isNotNull().alias("dup_of_corpus")
    )


# ---------------------------------------------------------------------------
# L62 — cross-source near-dup matrix (doc-level redundancy between sources)
# ---------------------------------------------------------------------------


@query(
    "q_cross_source_dup",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - {SHINGLE_K - 2}, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
          / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
        >= {_JACCARD_THRESHOLD}
)
SELECT LEAST(s1.source, s2.source)    AS source_1,
       GREATEST(s1.source, s2.source) AS source_2,
       CAST(COUNT(*) AS BIGINT)       AS n_pairs
FROM pairs
JOIN documents s1 ON s1.doc_id = pairs.d1
JOIN documents s2 ON s2.doc_id = pairs.d2
GROUP BY 1, 2
""",
)
def q_cross_source_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level near-dup counts BETWEEN sources — the companion
    readout to q_source_vocab_overlap's term-level matrix: vocab
    overlap says two sources talk about the same things; this says
    they contain the same DOCUMENTS (the re-crawl / mirror-site
    signal that changes a mixture plan immediately). Reuses the
    session near-dup pair machinery (inverted-index candidates, exact
    Jaccard verify) and attaches sources with two key-only broadcast
    joins; pairs are canonicalized least/greatest so the matrix is
    upper-triangular (diagonal = within-source duplication). Output
    is ≤ C(sources+1, 2) rows at any corpus scale."""
    pairs = jaccard_pairs_memo(spark, sf_dir)
    src = load(spark, sf_dir, "documents", columns=["doc_id", "source"])
    s1 = src.select(F.col("doc_id").alias("doc_id_1"), F.col("source").alias("src1"))
    s2 = src.select(F.col("doc_id").alias("doc_id_2"), F.col("source").alias("src2"))
    return (
        pairs.join(F.broadcast(s1), "doc_id_1")
        .join(F.broadcast(s2), "doc_id_2")
        .groupBy(
            F.least("src1", "src2").alias("source_1"),
            F.greatest("src1", "src2").alias("source_2"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# L66 — asymmetric containment near-dup (doc-inside-doc detection)
# ---------------------------------------------------------------------------

_CONTAINMENT_THRESHOLD = 0.6


@query(
    "q_containment_dup",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - {SHINGLE_K - 2}, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM documents
)
SELECT a.doc_id                                   AS src_doc,
       b.doc_id                                   AS dst_doc,
       CAST(length(list_intersect(a.sset, b.sset)) AS BIGINT) AS overlap,
       CAST(length(a.sset) AS BIGINT)             AS src_sz,
       CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
         / length(a.sset)                         AS containment
FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
WHERE length(a.sset) > 0
  AND CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE) / length(a.sset)
      >= {_CONTAINMENT_THRESHOLD}
""",
)
def q_containment_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: directed pairs where
    C(src→dst) = |sh(src) ∩ sh(dst)| / |sh(src)| ≥ 0.6 — the
    quote/excerpt/boilerplate-wrapper case symmetric Jaccard MISSES
    (a page embedding a whole smaller doc has low Jaccard when the
    host is large, but src-side containment is ~1). This is the
    Broder containment measure; dedup policy usually drops the
    contained doc and keeps the superset.

    Candidates come from ``containment_prefix_candidates`` — the
    ONE-SIDED prefix filter (smaller doc's df-ordered prefix probed
    against the larger doc's full list, lossless for containment
    ≥ 0.6 in either direction; see its docstring for the lemma). The
    plain undirected inverted index here was the last remaining
    super-linear shuffle row of the round-4 audit after the pair memo
    switched to prefix filtering; the one-sided prefix collapses its
    Σ C(freq,2) hot head to Σ pref_freq·freq. Intersection sizes are
    then exact array_intersect counts per surviving candidate, and
    both directed readings are emitted from that one undirected frame
    (a 2× projection, not a second join). The DuckDB oracle runs the
    naive directed all-pairs semantics, proving parity."""
    sh = shingled_docs(spark, sf_dir)
    idx = _df_ordered_arrays(sh)
    # fan_out the candidate pairs before verification: the pair table
    # is MiB-scale here, so AQE coalesces the distinct's output to ~1
    # partition and the whole verify stage (two hash-relation probes +
    # one array_intersect per pair) runs on one core (measured 2.9 s of
    # the query's 3.6 s at sf0.1). Scattering the 16-byte pairs is
    # near-free and parallelizes the per-pair kernel; guarded no-op
    # once the pair table has real volume.
    # 0.6 = 3/5 exact; kernel-class byte gate (round-9): gated on the
    # corpus scan's file-backed stats (stats_of=sh) — the pair join's
    # own estimate is multiplicative and ~1000× inflated — so the
    # added exchange stays absolute-bounded at 100 TB pair volumes.
    cand = fan_out(
        containment_prefix_candidates(sh, 3, 5),
        max_bytes=kernel_scatter_cap(),
        stats_of=sh,
    )
    # Verify on the index's int64 id arrays (injective dictionary —
    # counts are exact); broadcast the |docs|-row sides.
    s1 = idx.select(F.col("doc_id").alias("doc_id_1"), F.col("sz").alias("sz_a"), F.col("ids").alias("ids_1"))
    s2 = idx.select(F.col("doc_id").alias("doc_id_2"), F.col("sz").alias("sz_b"), F.col("ids").alias("ids_2"))
    inter = (
        cand.join(F.broadcast(s1), "doc_id_1")
        .join(F.broadcast(s2), "doc_id_2")
        .select(
            F.col("doc_id_1").alias("id_a"),
            F.col("doc_id_2").alias("id_b"),
            F.size(F.array_intersect("ids_1", "ids_2")).cast("bigint").alias("overlap"),
            F.col("sz_a").cast("bigint").alias("sz_a"),
            F.col("sz_b").cast("bigint").alias("sz_b"),
        )
        .filter(F.col("overlap") > 0)
    )
    # Both directed readings explode MAP-SIDE from the one undirected
    # row. The previous unionByName duplicated the `inter` subtree in
    # the physical plan (no exchange between inter and the union, so
    # nothing reuses it): every candidate's array_intersect ran TWICE.
    directed = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_doc"), F.col("id_b").alias("dst_doc"),
                    F.col("overlap").alias("overlap"), F.col("sz_a").alias("src_sz"),
                ),
                F.struct(
                    F.col("id_b").alias("src_doc"), F.col("id_a").alias("dst_doc"),
                    F.col("overlap").alias("overlap"), F.col("sz_b").alias("src_sz"),
                ),
            )
        ).alias("d")
    ).select("d.src_doc", "d.dst_doc", "d.overlap", "d.src_sz")
    return (
        directed.withColumn(
            "containment", F.col("overlap").cast("double") / F.col("src_sz")
        )
        .filter(F.col("containment") >= _CONTAINMENT_THRESHOLD)
        .select("src_doc", "dst_doc", "overlap", "src_sz", "containment")
    )


# ---------------------------------------------------------------------------
# q_minhash_calibration — sketch-vs-ground-truth accuracy audit
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    """Same integer pipeline as _minhash_oracle, but instead of
    thresholding it reports, per LSH candidate pair, the signature
    agreement next to the exact Jaccard — the estimator audit."""
    rows = MINHASH_PERMS // LSH_BANDS
    h = MD5_32_SQL.format(expr="s")
    mins = ",\n         ".join(
        f"MIN(({a} * h + {b}) % {_MERSENNE_P}) AS mh{j}"
        for j, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    bands = ",\n      ".join(
        f"CONCAT_WS(',', '{i}', "
        + ", ".join(f"mh{i * rows + r}" for r in range(rows))
        + ")"
        for i in range(LSH_BANDS)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END)" for j in range(MINHASH_PERMS)
    )
    jac = (
        "CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)"
        " / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))"
    )
    return f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - {SHINGLE_K - 2}, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM documents
),
hashed AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest(sset) AS s FROM sh)
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
),
buckets AS (
  SELECT doc_id, unnest([
      {bands}
  ]) AS bucket
  FROM sig
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT c.doc_id_1, c.doc_id_2,
       CAST({agree} AS BIGINT) AS n_agree,
       CAST({agree} AS DOUBLE) / {MINHASH_PERMS} AS est_jaccard,
       {jac} AS exact_jaccard,
       abs(CAST({agree} AS DOUBLE) / {MINHASH_PERMS} - ({jac})) AS abs_err
FROM cands c
JOIN sig sa ON sa.doc_id = c.doc_id_1
JOIN sig sb ON sb.doc_id = c.doc_id_2
JOIN sh a ON a.doc_id = c.doc_id_1
JOIN sh b ON b.doc_id = c.doc_id_2
"""


@query("q_minhash_calibration", oracle=_calibration_oracle())
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch CALIBRATION audit: for every LSH candidate pair, the
    MinHash estimate (signature agreement / {MINHASH_PERMS}) next to
    the exact shingle Jaccard and the absolute error. This is how a
    pipeline owner validates the (perms, bands) operating point
    before trusting the sketch at a scale where exact verification is
    unaffordable — E[agreement/n] = J, and the audit shows the
    realized spread on THIS corpus rather than the textbook bound.

    Cost shape: rides the session shingle index and the same
    signature/banding aggregates as q_neardup_minhash (64 longs per
    doc through the shuffle); the audit join adds one signature
    lookup per side of each candidate pair. Exactness: agreement is
    an integer count, est = n/{MINHASH_PERMS} is dyadic, the exact
    Jaccard is one integer division — every output column bit-equal
    cross-engine."""
    sh = shingled_docs(spark, sf_dir)
    sig = minhash_signatures_memo(spark, sf_dir)
    cands = lsh_candidates_memo(spark, sf_dir)
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_1"), F.col("sig_2"), lambda x, y: x == y), lambda b: b
        )
    ).cast("long")
    sa = sig.select(F.col("doc_id").alias("doc_id_1"), F.col("sig").alias("sig_1"))
    sb = sig.select(F.col("doc_id").alias("doc_id_2"), F.col("sig").alias("sig_2"))
    a = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("sset").alias("sset_1"))
    b = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("sset").alias("sset_2"))
    est = agree.cast("double") / F.lit(MINHASH_PERMS)
    jac = _jaccard(F.col("sset_1"), F.col("sset_2"))
    return (
        cands.join(sa, "doc_id_1")
        .join(sb, "doc_id_2")
        .join(a, "doc_id_1")
        .join(b, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            agree.alias("n_agree"),
            est.alias("est_jaccard"),
            jac.alias("exact_jaccard"),
            F.abs(est - jac).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# q_neardup_prefix — PPJoin-style prefix-filtered exact similarity join
# ---------------------------------------------------------------------------

# τ = 1/2, chosen dyadic so every threshold test is pure integer
# arithmetic: J ≥ 1/2  ⟺  3·|A∩B| ≥ |A| + |B|.
_PREFIX_TAU_SQL = "3 * length(list_intersect(a.sset, b.sset)) >= length(a.sset) + length(b.sset)"


@query(
    "q_neardup_prefix",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) - {SHINGLE_K - 2}, 0)),
           i -> string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+1] || ' ' ||
                string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[i+2]
         )) AS sset
  FROM documents
)
SELECT a.doc_id AS doc_id_1,
       b.doc_id AS doc_id_2,
       CAST(length(list_intersect(a.sset, b.sset)) AS DOUBLE)
         / (length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)))
         AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE {_PREFIX_TAU_SQL} AND length(a.sset) > 0 AND length(b.sset) > 0
""",
)
def q_neardup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 1/2 similarity join with PPJoin-style PREFIX
    FILTERING (Xiao et al., WWW 2008) — the documented refinement of
    q_neardup_jaccard's inverted index for corpora with hot shingles.

    Candidate generation indexes only each document's PREFIX: its
    shingles sorted by ascending global document frequency (rarest
    first, ties broken by shingle text for a stable total order),
    truncated to the first |d| − ⌈τ·|d|⌉ + 1 elements. The classical
    prefix-filtering lemma makes this LOSSLESS for J ≥ τ: two sets
    with overlap ≥ ⌈τ·max(|A|,|B|)⌉ under a shared total order must
    collide inside these prefixes. With τ = 1/2 the prefix is ~half of
    each posting list, and — the real win at scale — the HOT shingles
    (high df) sort to the END of the order, so the frequency-skewed
    posting lists that dominate Σ C(freq,2) in the plain inverted
    index are exactly the ones pruned out of the candidate join.

    A second integer POSITIONAL filter (PPJoin's other lemma) prunes
    per collision row: all common tokens lie in the suffixes from the
    pair's first shared prefix token, so rows whose suffix bound
    3·min(|A|−i, |B|−j) can't reach the τ requirement drop before the
    distinct — it subsumes the classic 2·min ≥ max length filter
    (its (0,0) instance) and cut candidates ~30% here.
    Verification then ships shingle ARRAYS for the surviving
    candidates only (array_intersect per pair), with the threshold
    test in exact integers (3c ≥ |A|+|B|) so the boundary cannot flip
    between engines; the reported jaccard is one float division of
    identical integers. Oracle = the naive all-pairs semantics,
    proving the pruning loses nothing.

    100 TB shape: shingle-df table is vocabulary-sized (partial-agg
    before its shuffle); the prefix join shuffles about half the
    (shingle, id) volume of the plain inverted index with its skew
    head removed; candidate verification is bounded by surviving
    pairs. Candidate generation is the SHARED
    ``prefix_filtered_candidates`` machinery (one implementation, τ
    as an exact rational) that also powers q_neardup_jaccard and
    therefore the session pair memo. Reference parity: extends
    main.py's exact-key dedup (/root/reference/main.py:192-211) to
    near-duplicate content."""
    sh = shingled_docs(spark, sf_dir)
    idx = _df_ordered_arrays(sh)
    cand = prefix_filtered_candidates(sh, 1, 2)
    s1 = idx.select(F.col("doc_id").alias("doc_id_1"), F.col("sz").alias("sz_1"), F.col("ids").alias("ids_1"))
    s2 = idx.select(F.col("doc_id").alias("doc_id_2"), F.col("sz").alias("sz_2"), F.col("ids").alias("ids_2"))
    c = F.size(F.array_intersect("ids_1", "ids_2"))
    return (
        cand.join(F.broadcast(s1), "doc_id_1")
        .join(F.broadcast(s2), "doc_id_2")
        .withColumn("c", c)
        .filter(
            (3 * F.col("c") >= F.col("sz_1") + F.col("sz_2"))
            & (F.col("sz_1") > 0)
            & (F.col("sz_2") > 0)
        )
        .select(
            "doc_id_1",
            "doc_id_2",
            (
                F.col("c").cast("double")
                / (F.col("sz_1") + F.col("sz_2") - F.col("c"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q_minhash_prf — LSH candidate precision/recall vs exact truth (V9)
# ---------------------------------------------------------------------------


def _prf_oracle() -> str:
    return f"""
WITH {_minhash_ctes()},
truth AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE {_JAC_AB_SQL} >= {_JACCARD_THRESHOLD}
),
conf AS (
  SELECT CAST(COUNT(CASE WHEN c.doc_id_1 IS NOT NULL AND t.doc_id_1 IS NOT NULL THEN 1 END) AS BIGINT) AS tp,
         CAST(COUNT(CASE WHEN c.doc_id_1 IS NOT NULL AND t.doc_id_1 IS NULL THEN 1 END) AS BIGINT)     AS fp,
         CAST(COUNT(CASE WHEN c.doc_id_1 IS NULL AND t.doc_id_1 IS NOT NULL THEN 1 END) AS BIGINT)     AS fn
  FROM cands c FULL OUTER JOIN truth t
    ON c.doc_id_1 = t.doc_id_1 AND c.doc_id_2 = t.doc_id_2
)
SELECT tp, fp, fn,
       CASE WHEN abs(CAST(tp AS DOUBLE) / (tp + fp)) < 4.5e9 THEN floor((CAST(tp AS DOUBLE) / (tp + fp)) * 1e6 + 0.5) / 1e6 ELSE (CAST(tp AS DOUBLE) / (tp + fp)) END AS precision,
       CASE WHEN abs(CAST(tp AS DOUBLE) / (tp + fn)) < 4.5e9 THEN floor((CAST(tp AS DOUBLE) / (tp + fn)) * 1e6 + 0.5) / 1e6 ELSE (CAST(tp AS DOUBLE) / (tp + fn)) END AS recall
FROM conf
"""


@query("q_minhash_prf", oracle=_prf_oracle())
def q_minhash_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-set PRECISION/RECALL of the MinHash-LSH operating
    point against exact ground truth — the confusion-matrix
    completion of q_minhash_calibration's per-pair error audit. FN
    here is the number a production pipeline can never see once the
    exact pass is retired (LSH misses are silent), which is exactly
    why the audit runs at validation scale before the operating point
    ships; FP measures wasted verification work, the knob the band
    count trades against FN.

    Cost shape: candidate pairs ride the session signature/banding
    machinery; truth pairs ride the shared-shingle inverted index —
    both already session-memoized; the confusion counts are one
    full-outer pair join + one global aggregate. All counts integer
    (hash-oracled); the two ratios are single divisions rounded 6 dp."""
    cands = lsh_candidates_memo(spark, sf_dir)
    truth = jaccard_pairs_memo(spark, sf_dir)
    j = cands.withColumn("c", F.lit(1)).join(
        truth.withColumn("t", F.lit(1)), ["doc_id_1", "doc_id_2"], "full_outer"
    )
    conf = j.agg(
        F.count(F.when(F.col("c").isNotNull() & F.col("t").isNotNull(), 1)).cast("long").alias("tp"),
        F.count(F.when(F.col("c").isNotNull() & F.col("t").isNull(), 1)).cast("long").alias("fp"),
        F.count(F.when(F.col("c").isNull() & F.col("t").isNotNull(), 1)).cast("long").alias("fn"),
    )
    # try_divide: a corpus with no candidates (tp+fp=0) or no true
    # pairs (tp+fn=0) must yield NULL precision/recall like the
    # DuckDB oracle's x/0, not ANSI-throw (fuzz: test_fuzz_oracle).
    return conf.select(
        "tp",
        "fp",
        "fn",
        floor_quantize(F.try_divide(F.col("tp").cast("double"), F.col("tp") + F.col("fp")), 6).alias("precision"),
        floor_quantize(F.try_divide(F.col("tp").cast("double"), F.col("tp") + F.col("fn")), 6).alias("recall"),
    )
