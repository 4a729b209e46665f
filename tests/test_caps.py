"""Driver-bound caps as CONTRACTS, not comments.

Every bounded driver collect in the engine documents a cap (k-core's
edge head, BPE's vocabulary head, MMR's top-C candidate pool, the
Bloom filter's fixed-geometry bitmap). These tests CROSS each bound
and pin the over-bound behavior — fallback to the distributed path
with identical results, or a structurally bounded artifact — so a
future edit cannot silently turn a cap into an unbounded collect or a
divergent fallback.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_bpe_train_distributed_fallback_matches_local(spark, monkeypatch):
    """Past BPE_DRIVER_VOCAB_MAX the trainer must take the distributed
    per-round argmax path and produce the EXACT merge table of the
    driver-local path (same tie-breaks, same counts)."""
    from grader_etl_spark.operators import trainprep

    words = [
        ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
        ("lowest", 4), ("new", 7), ("wide", 2), ("newer", 3),
    ]
    vocab = spark.createDataFrame(
        [(list(w), c) for w, c in words], "syms array<string>, cnt long"
    )
    local = trainprep.bpe_train(vocab, n_merges=6)  # 8 rows << cap: local path
    monkeypatch.setattr(trainprep, "BPE_DRIVER_VOCAB_MAX", 2)
    distributed = trainprep.bpe_train(vocab, n_merges=6)  # 8 > 2: fallback
    assert distributed == local
    assert len(local) == 6


def test_kcore_distributed_fallback_matches_driver_peel(spark, monkeypatch):
    """Past _KCORE_DRIVER_EDGES_MAX the peel must run distributed and
    return the same core degrees as the driver path."""
    from grader_etl_spark.operators import graph
    from grader_etl_spark.registry import clear_session_memos

    clear_session_memos(spark)
    baseline = sorted(
        (r["doc_id"], r["core_degree"]) for r in graph.q_kcore(spark, SF).collect()
    )
    assert baseline, "fixture graph must have a non-empty core"
    monkeypatch.setattr(graph, "_KCORE_DRIVER_EDGES_MAX", 1)
    over = sorted(
        (r["doc_id"], r["core_degree"]) for r in graph.q_kcore(spark, SF).collect()
    )
    assert over == baseline
    clear_session_memos(spark)


def test_mmr_candidate_pool_is_capped_at_C(spark):
    """The MMR greedy collects a C×C similarity matrix; the pool must
    be exactly MMR_C rows even when the corpus offers more candidates
    (the fixture does), and the final selection stays MMR_K rows —
    the driver state is bounded by the constants, not the corpus."""
    from grader_etl_spark.io import load
    from grader_etl_spark.operators import selection

    n_vec = load(spark, SF, "embeddings", columns=["vec_id"]).count()
    assert n_vec - 1 > selection.MMR_C, "fixture must exceed the candidate cap"
    out = selection.q_mmr_select(spark, SF)
    rows = out.collect()
    assert len(rows) == selection.MMR_K


def test_bloom_bitmap_stays_fixed_size_past_capacity_with_no_false_negatives(spark):
    """The Bloom bitmap is bounded by its GEOMETRY (M_BITS/64 longs),
    not the key count: loading ~3x more keys than bits must still
    yield the same 2048-word artifact, keep the no-false-negative
    guarantee (every true key survives the prune), and the documented
    consequence of over-capacity is only a false-positive rate rising
    toward 1 — never a wrong exact-join result downstream."""
    from grader_etl_spark.operators import bloom

    n_keys = 3 * bloom.M_BITS  # ~393k keys into 131k bits: way past capacity
    keys = spark.range(0, 2 * n_keys, 2).select(F.col("id").alias("k"))  # evens
    words = bloom.build_bloom_words(keys, "k")
    assert len(words) == bloom.M_BITS // 64  # fixed geometry, key-count-free

    probe = spark.range(0, 10_000).select(F.col("id").alias("k"))
    kept = bloom.bloom_prune(probe, "k", words)
    # no false negatives: every even key in the probe range survives
    missing = kept.filter(F.col("k") % 2 == 0).count()
    assert missing == 10_000 // 2
    # over capacity the filter may pass odds too (FP rate -> high); the
    # exact semi-join downstream is what removes them — prune + exact
    # filter equals the direct filter, multiset-identical.
    exact_after_prune = sorted(
        r["k"] for r in kept.filter(F.col("k") % 2 == 0).collect()
    )
    direct = sorted(r["k"] for r in probe.filter(F.col("k") % 2 == 0).collect())
    assert exact_after_prune == direct
