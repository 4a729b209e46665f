"""Corpus-filter operators: scale-shape plan pins + the sequence-
packing invariants the recursive oracle alone doesn't spell out.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from grader_etl_spark.operators.grouped_map import PACK_BUDGET, pack_greedy
from grader_etl_spark.registry import REGISTRY, all_queries
from tests.test_plans import plan_of

all_queries()


def test_map_only_filters_have_no_shuffle(spark, sf_dir):
    """PII redaction and weighted sampling must stay map-side: one
    scan, zero Exchange — the property that makes them linear at
    100 TB."""
    for name in ("q_pii_redact", "q_sample_weighted"):
        p = plan_of(spark, sf_dir, name)
        assert "Exchange" not in p, name


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The eval-set gram index must ride a broadcast; a SortMergeJoin
    on the gram key would shuffle the full corpus explode."""
    p = plan_of(spark, sf_dir, "q_decontaminate")
    assert "BroadcastHashJoin" in p


def test_pack_sequences_invariants(spark, sf_dir):
    from grader_etl_spark.io import load

    docs = load(spark, sf_dir, "documents", columns=["source", "doc_id", "n_chars"])
    packed = pack_greedy(docs).collect()

    # Every document is packed exactly once.
    assert sorted(r.doc_id for r in packed) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )

    by_pack: dict[tuple, list] = {}
    for r in packed:
        by_pack.setdefault((r.source, r.pack_id), []).append(r)
    for (source, _), rows in by_pack.items():
        total = sum(r.n_chars for r in rows)
        # A pack only exceeds the budget when a single oversized doc
        # forces it; fixture docs are all under budget.
        assert total <= PACK_BUDGET, (source, total)

    # Greedy tightness: within a source, consecutive packs can't be
    # merged — pack k's fill plus pack k+1's first doc must overflow.
    rows_by_source: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r.source, r.doc_id)):
        rows_by_source.setdefault(r.source, []).append(r)
    for source, rows in rows_by_source.items():
        for prev, cur in zip(rows, rows[1:]):
            if cur.pack_id != prev.pack_id:
                assert prev.pack_fill + cur.n_chars > PACK_BUDGET, source


def test_gap_fill_is_dense_and_monotone(spark, sf_dir):
    """Every user gets every calendar day exactly once, and filled
    values only change on observed days."""
    df = REGISTRY["q_gap_fill"].fn(spark, sf_dir)
    n_users = df.select("user_id").distinct().count()
    assert df.count() == n_users * 30
    assert df.groupBy("user_id", "day").count().filter(F.col("count") > 1).count() == 0
    rows = sorted(df.collect(), key=lambda r: (r.user_id, r.day))
    prev = {}
    for r in rows:
        if not r.observed and r.user_id in prev:
            assert r.v_filled == prev[r.user_id], r
        prev[r.user_id] = r.v_filled


def test_filter_overlap_matrix_consistency(spark, sf_dir):
    from grader_etl_spark.operators.corpus_filters import q_filter_overlap

    rows = {(r["rule_a"], r["rule_b"]): r["n_docs"] for r in q_filter_overlap(spark, sf_dir).collect()}
    diag = {a: n for (a, b), n in rows.items() if a == b}
    for (a, b), n in rows.items():
        assert a <= b  # canonical ordering, no mirrored duplicates
        if a != b:
            # co-failures can never exceed either rule's own kill count
            assert n <= diag[a] and n <= diag[b]
    assert diag  # at least one rule fires on the fixture corpus


def test_interp_logprob_smooths_rare_continuations(spark, sf_dir):
    from grader_etl_spark.operators.text_analysis import (
        q_bigram_logprob,
        q_interp_logprob,
    )

    interp = {r["doc_id"]: r for r in q_interp_logprob(spark, sf_dir).collect()}
    mle = {r["doc_id"]: r["mean_neg_logprob"] for r in q_bigram_logprob(spark, sf_dir).collect()}
    import math

    assert set(interp) == set(mle)  # same docs qualify (>= 2 tokens)
    # p_interp >= 0.75 * p_mle per bigram, so the smoothed surprisal
    # is bounded by the MLE surprisal + ln(4/3) — exactly, per doc.
    for d, r in interp.items():
        assert r["n_bigrams"] >= 1
        assert 0 < r["mean_neg_logprob"] <= mle[d] + math.log(4 / 3) + 1e-3


def test_ccnet_buckets_are_per_lang_terciles(spark, sf_dir):
    import collections

    from grader_etl_spark.operators.text_analysis import q_ccnet_buckets

    rows = q_ccnet_buckets(spark, sf_dir).collect()
    assert rows
    by_lang = collections.defaultdict(list)
    for r in rows:
        assert r["bucket"] in ("head", "middle", "tail")
        by_lang[r["lang"]].append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        counts = collections.Counter(r["bucket"] for r in rs)
        # NTILE(3): bucket sizes differ by at most 1.
        assert max(counts.values()) - min(counts.values()) <= 1, lang
        # Score ordering respects buckets: every head score <= every
        # tail score (ties broken by doc_id inside NTILE).
        if counts["head"] and counts["tail"]:
            assert max(r["mean_neg_logprob"] for r in rs if r["bucket"] == "head") <= min(
                r["mean_neg_logprob"] for r in rs if r["bucket"] == "tail"
            ), lang
