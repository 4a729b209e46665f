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
            counters.update(itertools.chain.from_iterable(pdf["toks"]))
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
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents
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
