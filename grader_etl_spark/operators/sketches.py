"""Bounded-memory frequency sketches (SURVEY.md §2.9 L56).

The reference has no sketch machinery (its whole corpus fits one
Python list, main.py:128); at 100 TB the vocabulary of a token stream
does NOT fit executor memory, so exact `groupBy(term)` top-k —
whose shuffle carries every distinct term — stops being an option.
The classical answer is a two-phase heavy-hitters plan:

1. **Candidate generation** — per-partition Misra-Gries summaries
   (k counters, constant memory regardless of vocabulary size),
   merged by union. MG's guarantee (undercount ≤ n_p/(k+1)) makes
   the union a SUPERSET of every term with global freq > n/k, so
   phase 1 can never drop a true heavy hitter.
2. **Exact verify** — one broadcast semi-join of the candidate set
   (≤ partitions × k rows) against the token stream, exact counts,
   integer threshold `freq * k > n`. Only candidate terms ever
   shuffle; the long tail — the part that explodes at scale — stays
   map-side and is discarded there.

The final output is therefore EXACT (hash-oracle-checkable), while
memory and shuffle stay bounded by k, not vocabulary. Misra-Gries
and its mergeability are public (Misra & Gries 1982; Agarwal et al.,
"Mergeable Summaries", PODS 2012).

The MG loop is the one genuinely sequential piece (per-partition
fold), so it runs as an Arrow-batched mapInPandas kernel over
per-document token ARRAYS (one row per doc crosses Arrow, not one
per token); counting inside a batch uses collections.Counter over
chained arrays (C-speed), and the decrement step runs only when the
counter table overflows k.

Cost honesty: phase 1 does move ~1× corpus token bytes through
Arrow — but strictly MAP-SIDE (no network, no disk spill), replacing
the alternative's vocabulary-wide shuffle, which serializes a
comparable volume AND crosses the network AND spills when the
vocabulary exceeds memory. The sketch's win is what it deletes, not
free Python.
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from grader_etl_spark.functions.hashing import MD5_LANE_SQL, md5_lane
from grader_etl_spark.io import load
from grader_etl_spark.registry import query
from grader_etl_spark.operators.text_analysis import tokens

# Heavy-hitter threshold: report terms with freq > total_tokens / HH_K.
# Phase-1 summaries keep HH_K counters — enough, since MG with k
# counters retains every item with partition freq > n_p/(k+1), and a
# global heavy hitter must exceed n_p/HH_K > n_p/(HH_K+1) in at least
# one partition (pigeonhole).
HH_K = 40


def misra_gries_candidates(counter_budget: int):
    """mapInPandas kernel factory: fold a partition's token arrays
    into one Misra-Gries summary, yield its surviving terms."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: collections.Counter = collections.Counter()
        for pdf in batches:
            # NULL text → None token array: skip (explode-side exact
            # counts and the DuckDB oracle's unnest drop it the same
            # way; without the guard a single NULL doc kills the task).
            counters.update(
                itertools.chain.from_iterable(
                    t for t in pdf["toks"] if t is not None
                )
            )
            if len(counters) > counter_budget:
                # Mergeable-summaries shrink: subtract the (k+1)-th
                # largest counter from all, drop non-positives — at
                # most k survive, undercount stays ≤ n_p/(k+1).
                sub = sorted(counters.values(), reverse=True)[counter_budget]
                counters = collections.Counter(
                    {t: c - sub for t, c in counters.items() if c > sub}
                )
        yield pd.DataFrame({"term": sorted(counters.keys())})

    return fold


@query(
    "q_heavy_hitters",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS term FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM toks),
c AS (SELECT term, COUNT(*) AS freq FROM toks GROUP BY term)
SELECT term, freq,
       CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
FROM c, tot WHERE freq * {HH_K} > n
""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (freq > n/{HH_K}) via Misra-Gries candidate
    generation + exact broadcast-verify — see module docstring for the
    two-phase scale argument. Threshold comparison is integer
    (freq * k > n), so the output is bit-deterministic and fully
    hash-oracle-checked despite the approximate phase 1."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    doc_toks = docs.select(tokens(F.col("text")).alias("toks"))

    cands = doc_toks.mapInPandas(
        misra_gries_candidates(HH_K), "term string"
    ).distinct()

    toks = doc_toks.select(F.explode("toks").alias("term"))
    total = doc_toks.agg(F.sum(F.size("toks")).cast("long").alias("n"))
    counts = (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), "term")
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * HH_K > F.col("n"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("term", "freq", "rank")
    )


# ---------------------------------------------------------------------------
# q_count_min — Count-Min sketch point queries, exactness-audited
# ---------------------------------------------------------------------------

# d=4 hash rows × w=64 buckets. w is deliberately SMALL relative to the
# fixture vocabulary so collisions actually occur and the overcount
# column exercises the CM guarantee (est ≥ true; est ≤ true + εn w.h.p.).
CMS_D = 4
CMS_W = 64

# Pinned probe terms: frequent fixture terms + one absent term (its
# nonzero estimate, if any, is pure collision mass — the clearest
# demonstration of the one-sided error).
CMS_PROBES = ("join", "hash", "row", "batch", "scan", "zz_absent_term")


def _cms_bucket_sql(row: str, term: str) -> str:
    """DuckDB twin of the Spark bucket expression: row r's bucket is
    lane r of ONE md5 digest of the term (not d prefixed digests)."""
    h = MD5_LANE_SQL.format(expr=term, lane=row)
    return f"({h}) % {CMS_W}"


_CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS term FROM documents
),
rs AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(r)),
cells AS (
  SELECT r, {_cms_bucket_sql('r', 'term')} AS b FROM toks CROSS JOIN rs
),
sketch AS (SELECT r, b, COUNT(*) AS cnt FROM cells GROUP BY r, b),
probes AS (
  SELECT * FROM (VALUES {', '.join(f"('{t}')" for t in CMS_PROBES)}) AS p(term)
),
pc AS (
  SELECT term, r, {_cms_bucket_sql('r', 'term')} AS b FROM probes CROSS JOIN rs
),
est AS (
  SELECT term, MIN(COALESCE(cnt, 0)) AS cm_est
  FROM pc LEFT JOIN sketch USING (r, b) GROUP BY term
),
ex AS (
  SELECT p.term, COUNT(t.term) AS freq
  FROM probes p LEFT JOIN toks t ON p.term = t.term GROUP BY p.term
)
SELECT est.term,
       CAST(cm_est AS BIGINT)          AS cm_est,
       CAST(freq AS BIGINT)            AS exact_freq,
       CAST(cm_est - freq AS BIGINT)   AS overcount
FROM est JOIN ex ON est.term = ex.term
"""


@query("q_count_min", oracle=_CMS_ORACLE)
def q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) point queries
    over the token stream, audited against exact counts.

    The sketch is a {CMS_D}×{CMS_W} integer grid: every token
    increments one bucket per hash row, and a point query reads the
    MIN of its {CMS_D} buckets — never an undercount, overcount
    bounded by collision mass. As a DataFrame plan the grid IS a
    bounded groupBy: explode each token into its {CMS_D} (row, bucket)
    cells map-side, then aggregate — the shuffle carries at most
    d·w = {CMS_D * CMS_W} cells per partition after partial
    aggregation, CONSTANT in vocabulary size. That is the entire
    point at 100 TB: exact per-term counting shuffles the vocabulary
    (unbounded, skewed); the sketch shuffles a fixed grid, and
    estimates for any later probe set cost a broadcast lookup, not a
    corpus rescan.

    The probe side here also computes exact counts (one extra
    broadcast semi-join) so the output exposes the realized
    overcount per probe — the calibration view a pipeline owner
    checks before trusting the sketch where the exact pass is
    unaffordable (same audit discipline as q_minhash_calibration).

    Hash budget: the d row hashes are the d disjoint 32-bit lanes of
    ONE md5 digest per term (md5_lane / MD5_LANE_SQL) — one md5 per
    token instead of the d prefixed md5s an independent-hash-family
    reading would spend. Pairwise-independence across lanes is
    md5-grade, which is the standard Count-Min practice (Cormode's
    reference implementations derive all rows from one universal
    seed); the whole pipeline stays integer-deterministic and fully
    hash-oracled despite being an approximation structure.

    Reference parity: none (the reference counts exactly in one
    Python list, /root/reference/main.py:128); this is the bounded-
    memory swap mandated by the north-star scale target."""
    docs = load(spark, sf_dir, "documents", columns=["text"])
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term"))

    def lane_cells(df, keep: list[str]):
        # Project the digest FIRST so Catalyst's cheap-expression
        # guard (CollapseProject) keeps md5 single-evaluated; the d
        # bucket slices above it are substring+conv — near-free.
        dug = df.withColumn("__dig", F.md5(F.col("term")))
        return dug.select(
            *keep,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).cast("int").alias("r"),
                            (md5_lane(F.col("__dig"), j) % CMS_W).alias("b"),
                        )
                        for j in range(CMS_D)
                    ]
                )
            ).alias("cell"),
        ).select(*keep, F.col("cell.r").alias("r"), F.col("cell.b").alias("b"))

    cells = lane_cells(toks, [])
    sketch = cells.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))

    probe = spark.range(len(CMS_PROBES)).select(
        F.element_at(
            F.array(*[F.lit(t) for t in CMS_PROBES]), (F.col("id") + 1).cast("int")
        ).alias("term")
    )
    pc = lane_cells(probe, ["term"])
    est = (
        pc.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cm_est"))
    )
    # A left-join miss must report exact_freq = 0, so count a marker
    # column from the token side (count() skips its nulls), not the
    # join key itself (never null). The token stream is pre-filtered
    # MAP-SIDE to the literal probe set before any aggregation: the
    # previous spelling left-joined the probes against the FULL token
    # stream, shipping every corpus token into the join (measured ~0.5 s
    # of the query's 1.9 s at sf0.1; at 100 TB it is a corpus-sized
    # shuffle for a 6-term answer). The filtered counts are
    # probe-set-bounded, then the left join only fills in the zeros.
    probe_counts = (
        toks.filter(F.col("term").isin(*CMS_PROBES))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )
    exact = probe.join(F.broadcast(probe_counts), "term", "left").select(
        "term", F.coalesce(F.col("__freq"), F.lit(0)).cast("long").alias("freq")
    )
    return (
        est.join(exact, "term")
        .select(
            "term",
            "cm_est",
            F.col("freq").alias("exact_freq"),
            (F.col("cm_est") - F.col("freq")).cast("long").alias("overcount"),
        )
    )
