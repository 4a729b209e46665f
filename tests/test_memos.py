"""Session-memo lifecycle: memo builders checkpoint through
``registry.memo_checkpoint`` so ``clear_session_memos(spark)`` can
(1) drop every ``*_CACHE`` dict, (2) unpersist the backing
localCheckpoint blocks immediately — a long-lived service rolling to
a new corpus version must free the old version's checkpoint storage
deterministically, not wait on JVM GC — and (3) leave the operators
able to rebuild correctly from scratch."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _persistent_rdd_ids(spark) -> set[int]:
    ids = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def test_clear_session_memos_evicts_checkpoint_blocks_and_rebuilds(spark):
    from grader_etl_spark.operators.llm_dedup import _SHINGLE_CACHE, shingled_docs
    from grader_etl_spark.registry import _MEMO_RDD_IDS, clear_session_memos

    clear_session_memos(spark)  # isolate from earlier tests in this session
    before = _persistent_rdd_ids(spark)

    first = shingled_docs(spark, SF)
    n1 = first.count()
    assert (spark, SF) in _SHINGLE_CACHE
    built = _persistent_rdd_ids(spark) - before
    assert built, "memo build must persist a checkpoint block"
    app_id = spark.sparkContext.applicationId
    recorded = {rid for aid, rid in _MEMO_RDD_IDS if aid == app_id}
    assert built & recorded, "memo_checkpoint must record the backing RDD id"

    clear_session_memos(spark)
    assert not _SHINGLE_CACHE, "memo dict must be empty after clear"
    assert not (_persistent_rdd_ids(spark) & built), (
        "checkpoint blocks must be unpersisted immediately, not GC'd eventually"
    )
    assert not _MEMO_RDD_IDS, "tracked ids reset once evicted"

    # rebuild is correct: a consumer that reads the memo end-to-end
    # (near-dup Jaccard pairs) produces identical rows after eviction
    from grader_etl_spark.operators.llm_dedup import q_neardup_jaccard

    again = shingled_docs(spark, SF)
    assert again.count() == n1
    pairs = sorted(
        (r["doc_id_1"], r["doc_id_2"])
        for r in q_neardup_jaccard(spark, SF).select("doc_id_1", "doc_id_2").collect()
    )
    clear_session_memos(spark)
    pairs_rebuilt = sorted(
        (r["doc_id_1"], r["doc_id_2"])
        for r in q_neardup_jaccard(spark, SF).select("doc_id_1", "doc_id_2").collect()
    )
    assert pairs == pairs_rebuilt
    clear_session_memos(spark)


def test_clear_session_memos_without_spark_still_clears_dicts(spark):
    from grader_etl_spark.operators.fuzzy import _PAIR_CACHE, fuzzy_pairs
    from grader_etl_spark.registry import clear_session_memos

    from grader_etl_spark.registry import _MEMO_RDD_IDS

    fuzzy_pairs(spark, SF)
    assert _PAIR_CACHE
    assert _MEMO_RDD_IDS
    clear_session_memos()  # legacy no-arg form keeps working
    assert not _PAIR_CACHE
    # The no-arg path must also forget the recorded ids: after a
    # SparkContext restart, RDD ids re-number from ~0, so a stale id
    # kept here would collide with a NEW session's unrelated persistent
    # RDDs and the next clear_session_memos(spark) would unpersist them.
    assert not _MEMO_RDD_IDS, "no-arg clear must drop recorded ids too"
    clear_session_memos(spark)


def test_clear_session_memos_skips_ids_from_other_contexts(spark):
    """Recorded ids are scoped by applicationId: an id recorded under a
    dead context must never be unpersisted against the current one,
    even when the numeric id collides with a live user-persisted RDD."""
    from grader_etl_spark.registry import _MEMO_RDD_IDS, clear_session_memos

    clear_session_memos(spark)
    user_df = spark.range(50).selectExpr("id", "id + 1 AS y").localCheckpoint()
    assert user_df.count() == 50
    live_ids = _persistent_rdd_ids(spark)
    # Simulate a stale recording from a previous SparkContext whose
    # RDD ids collide with the live user frame's ids.
    _MEMO_RDD_IDS.update(("app-from-a-previous-context", rid) for rid in live_ids)
    clear_session_memos(spark)
    assert user_df.count() == 50  # survived: the stale ids were not ours
    assert not _MEMO_RDD_IDS
    user_df.unpersist()


def test_reliable_checkpoint_env_writes_files_and_eviction_reclaims(spark, tmp_path, monkeypatch):
    """With SPARK_GRAFT_CHECKPOINT_DIR set (the cluster profile —
    localCheckpoint blocks die with their executor), memo frames take
    a RELIABLE checkpoint: files must land under the directory, the
    memo must read back correctly from them, and
    clear_session_memos(spark) must delete the files deterministically
    (storage eviction on rollover, same contract as the block path)."""
    import os

    from grader_etl_spark.operators.llm_dedup import shingled_docs
    from grader_etl_spark.registry import _MEMO_CKPT_FILES, clear_session_memos

    clear_session_memos(spark)
    ckdir = tmp_path / "reliable-ckpt"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(ckdir))

    memo = shingled_docs(spark, SF)
    n = memo.count()
    assert n > 0
    app_id = spark.sparkContext.applicationId
    recorded = [p for aid, p in _MEMO_CKPT_FILES if aid == app_id]
    assert recorded, "reliable profile must record the checkpoint file"
    files = [
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(ckdir)
        for f in fs
        if f.startswith("part-")
    ]
    assert files, "checkpoint part-files must land under SPARK_GRAFT_CHECKPOINT_DIR"
    # the memo serves from the reliable checkpoint, not a re-scan
    assert memo.count() == n

    clear_session_memos(spark)
    leftover = [
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(ckdir)
        for f in fs
        if f.startswith("part-")
    ]
    assert not leftover, "eviction must delete the reliable checkpoint files"
    assert not _MEMO_CKPT_FILES

    # back on the default profile, the memo rebuilds cleanly
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR")
    assert shingled_docs(spark, SF).count() == n
    clear_session_memos(spark)


def test_clear_session_memos_spares_unrelated_persisted_frames(spark):
    """Eviction is scoped to MEMO checkpoints: a user-persisted frame
    (or catalog cache) must survive clear_session_memos(spark)."""
    from grader_etl_spark.operators.pca import covariance_frame
    from grader_etl_spark.registry import clear_session_memos

    clear_session_memos(spark)
    user_df = spark.range(100).selectExpr("id", "id * 3 AS y").localCheckpoint()
    assert user_df.count() == 100
    covariance_frame(spark, SF)  # builds a memo checkpoint
    clear_session_memos(spark)
    assert user_df.count() == 100  # still readable — its blocks survived
    user_df.unpersist()

def test_non_memo_session_checkpoints_evicted_on_rollover(spark, tmp_path, monkeypatch):
    """NON-memo reliable checkpoints — the per-round frames inside
    iterative operators (graph contraction, BPE merges, MMR rounds) —
    must also be deleted at rollover: Spark never reclaims
    reliable-checkpoint files while the context lives (cleanCheckpoints
    is GC-driven and off by default), so a long-lived session would
    otherwise grow its checkpoint dir by one file set per registry lap
    forever. Found by tools/soak.py (post-evict bytes 21007 -> 42014
    -> 63021 over three laps before the fix)."""
    import os

    from grader_etl_spark.registry import (
        _SESSION_CKPT_FILES,
        checkpoint_frame,
        clear_session_memos,
    )

    clear_session_memos(spark)
    ckdir = tmp_path / "session-ckpt"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(ckdir))

    # a direct checkpoint_frame call, exactly like an iterative round —
    # NOT routed through memo_checkpoint
    df = checkpoint_frame(spark.range(100).selectExpr("id", "id * 2 AS v"))
    assert df.count() == 100
    app_id = spark.sparkContext.applicationId
    recorded = [p for aid, p in _SESSION_CKPT_FILES if aid == app_id]
    assert recorded, "reliable profile must record every session checkpoint file"
    local_paths = [p.removeprefix("file:") for p in recorded]
    assert all(os.path.exists(p) for p in local_paths)

    clear_session_memos(spark)
    assert not any(os.path.exists(p) for p in local_paths), (
        "rollover must delete non-memo reliable checkpoints"
    )
    assert not _SESSION_CKPT_FILES
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR")


def test_doc_bigram_memo_shared_across_lm_trio_and_equivalent(spark):
    """The three bigram LM scorers read ONE session memo of the
    per-doc bigram counts (round-9: the fact-sized tokenize + pair
    explode + group ran three times before), and a rebuilt-from-
    scratch run after memo eviction produces identical rows — the
    memo is a pure cache, not a semantic change."""
    from grader_etl_spark.operators.text_analysis import (
        _DOC_BIGRAM_CACHE,
        q_bigram_logprob,
        q_interp_logprob,
        q_kneser_ney,
    )
    from grader_etl_spark.registry import clear_session_memos

    clear_session_memos(spark)  # isolate from earlier tests
    r_big = {tuple(r) for r in q_bigram_logprob(spark, SF).collect()}
    assert (spark, SF) in _DOC_BIGRAM_CACHE
    memo_obj = _DOC_BIGRAM_CACHE[(spark, SF)]
    r_kn = {tuple(r) for r in q_kneser_ney(spark, SF).collect()}
    r_jm = {tuple(r) for r in q_interp_logprob(spark, SF).collect()}
    assert _DOC_BIGRAM_CACHE[(spark, SF)] is memo_obj, (
        "one build must serve all three scorers"
    )
    # the memoized (checkpointed) table appears in each plan as an
    # RDD scan instead of a re-run corpus tokenize/explode subtree
    for fn in (q_bigram_logprob, q_interp_logprob, q_kneser_ney):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan

    clear_session_memos(spark)
    assert (spark, SF) not in _DOC_BIGRAM_CACHE
    assert {tuple(r) for r in q_bigram_logprob(spark, SF).collect()} == r_big
    assert {tuple(r) for r in q_kneser_ney(spark, SF).collect()} == r_kn
    assert {tuple(r) for r in q_interp_logprob(spark, SF).collect()} == r_jm
    clear_session_memos(spark)
