"""Physical-plan regression tests: the scale properties .explain
promised are pinned here so a refactor can't silently trade them away
— pushdown reaching the parquet reader, broadcast of dim tables,
top-k without a global sort, and no nested-loop/cartesian fallbacks in
the pairwise operators.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from grader_etl_spark.registry import REGISTRY, all_queries

all_queries()  # populate REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan" in p
    # Column pruning: the 16-column lineitem scan reads only 7.
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert read_schema.count(":") - 1 <= 8


def test_time_range_reaches_scan(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_time_range_filter")
    assert "GreaterThanOrEqual(ts," in p and "LessThan(ts," in p


def test_broadcast_joins_broadcast(spark, sf_dir):
    for name in ("q_join_broadcast", "q_shipping_priority", "q_local_supplier_volume"):
        assert "BroadcastHashJoin" in plan_of(spark, sf_dir, name), name


def test_topk_avoids_global_sort(spark, sf_dir):
    assert "TakeOrderedAndProject" in plan_of(spark, sf_dir, "q_topk")


def test_sharding_plans_hold_scale_promises(spark, sf_dir):
    """q_corpus_shards is a pure projection (zero Exchange — the
    shard/order hashes compile into the scan projection);
    q_mixture_rates aggregates the corpus ONCE (one scan, totals via a
    window over the per-source frame); the quality gate's window rides
    exactly one source-partitioned Exchange."""
    p = plan_of(spark, sf_dir, "q_corpus_shards")
    assert "Exchange" not in p
    tree = plan_of(spark, sf_dir, "q_mixture_rates").split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    p = plan_of(spark, sf_dir, "q_quality_percentile_gate")
    tree = p.split("\n\n")[0]
    assert tree.count("Exchange") == 1 and "Window" in p


def test_passback_udf_sees_only_fallback_rows(spark, sf_dir):
    """Split-union contract (functions/passback.py:with_passback_parsed):
    the literal-eval pandas UDF must run only on the from_json-null
    subset — its ArrowEvalPython node's direct child is the Filter that
    selects malformed rows, and the fast branch has no Python at all."""
    p = plan_of(spark, sf_dir, "q_passback_parse")
    # In the formatted tree, ArrowEvalPython (n)'s child line is the
    # next line down one indent level — it must be a Filter.
    tree = p.split("\n\n")[0].splitlines()
    assert sum("ArrowEvalPython" in l for l in tree) == 1
    idx = next(i for i, l in enumerate(tree) if "ArrowEvalPython" in l)
    assert "Filter" in tree[idx + 1], tree[idx + 1]
    # And that Filter selects exactly the from_json-null, raw-not-null rows.
    filt = next(
        b for b in p.split("\n\n") if b.startswith(f"({tree[idx + 1].split('(')[1]}")
    )
    assert "isnull(from_json" in filt and "isnotnull(" in filt


@pytest.mark.parametrize(
    "name",
    [
        "q_neardup_jaccard",
        "q_neardup_minhash",
        "q_dedup_simhash",
        "q_neardup_embedding",
        "q_interval_overlap",
    ],
)
def test_pairwise_ops_never_nested_loop(spark, sf_dir, name):
    """The dedup operators must candidate-join on equi keys; a
    CartesianProduct or BroadcastNestedLoopJoin in the plan means the
    blocking strategy silently fell back to all-pairs."""
    p = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in p, name
    assert "BroadcastNestedLoopJoin" not in p, name


# q_join_range's 4-row literal band table comes from createDataFrame —
# an ExistingRDD scan of O(1) rows is fine; nothing else may have one.
# q_dedup_components localCheckpoints the label/edge frames between
# propagation rounds (lineage truncation), and the near-dup family
# reads the session-materialized shingle index (llm_dedup.
# shingled_docs, also a localCheckpoint); a checkpointed frame scans
# as ExistingRDD by construction — still JVM-columnar data, not a
# Python RDD fallback.
_LITERAL_TABLE_OK = {
    "q_join_range",
    "q_join_null_safe",  # 3-row literal 'unknown-bucket' dim, broadcast
    "q_dedup_components",
    "q_pagerank_nations",
    "q_entity_resolution",
    "q_shortest_cost_paths",
    "q_neardup_jaccard",
    "q_neardup_minhash",
    "q_containment_dup",   # shingle-memo consumer (checkpointed index)
    "q_triangle_count",    # rides q_neardup_jaccard's pair machinery
    "q_ngram_novelty",
    "q_cross_source_dup",
    "q_dedup_graph_degree",
    "q_curate_corpus",
    "q_curation_funnel",
    "q_dedup_savings",
    "q_fuzzy_match",  # serves the session pair memo (checkpointed blocked join)
    "q_mmr_select",   # checkpointed bounded candidate set + k-row literal result
    "q_mixture_waterfill",  # serves the memoized per-source aggregate
    "q_bpe_train",    # localCheckpoints the word-count frame between merge rounds
    "q_minhash_calibration",  # shingle-memo consumer (checkpointed index)
    "q_dedup_keeper",  # serves the session cluster memo (checkpointed components)
    "q_neardup_prefix",  # shingle-memo consumer (checkpointed index)
    "q_kcore",  # shingle-memo consumer + checkpointed peel rounds
    "q_minhash_prf",  # shingle-memo consumer (checkpointed index)
    "q_assortativity",  # rides q_neardup_jaccard's pair machinery
    "q_triangle_count_ordered",  # rides q_neardup_jaccard's pair machinery
    "q_embedding_covariance",  # serves the session covariance memo (checkpointed d² frame)
    "q_pca_project",  # covariance-memo consumer
    # round-9: the bigram LM trio shares the doc-bigram-count session
    # memo (text_analysis.doc_bigram_counts_memo, checkpointed)
    "q_bigram_logprob",
    "q_interp_logprob",
    "q_kneser_ney",
}


def test_no_rdd_fallback_anywhere(spark, sf_dir):
    """Every registered query is DataFrame-planned from files (no RDD
    scans) — the whole registry compiles through Catalyst."""
    for name in all_queries():
        if name in _LITERAL_TABLE_OK:
            continue
        p = plan_of(spark, sf_dir, name)
        assert "Scan ExistingRDD" not in p, name

@pytest.mark.parametrize(
    "name",
    [
        "q_nation_volume",
        "q_market_share",
        "q_returned_revenue",
        "q_promo_revenue",
        "q_parts_supplier_count",
        "q_small_qty_revenue",
        "q_idle_customers",
        "q_waiting_suppliers",
    ],
)
def test_tpch_more_dims_broadcast(spark, sf_dir, name):
    """Every dim/threshold side in the Q7-Q22 shapes must broadcast —
    a shuffled or sort-merge join of a dim table against the fact
    spine is a silent 100× shuffle regression."""
    assert "BroadcastHashJoin" in plan_of(spark, sf_dir, name), name


def test_disjunctive_residuals_push_to_both_scans(spark, sf_dir):
    """Q19 shape: Catalyst must derive single-side residuals from the
    OR-of-conjuncts — the lineitem scan gets the quantity-range union,
    the part scan gets the brand/size disjunction. If either scan's
    PushedFilters loses its Or(...), the join degenerates to
    filter-after-join over the full scan."""
    p = plan_of(spark, sf_dir, "q_disjunctive_pushdown")
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l and "Or(" in l for l in pushed), pushed
    assert any("p_brand" in l and "Or(" in l for l in pushed), pushed


def test_promo_revenue_date_range_reaches_scan(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_promo_revenue")
    assert "GreaterThanOrEqual(l_shipdate,1997-09-01" in p
    assert "LessThan(l_shipdate,1997-10-01" in p


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime Bloom-filter join pruning (AQE companion): with a
    selective filter on the build side of a shuffle join, Catalyst
    injects bloom_filter_agg → might_contain on the probe side's scan,
    cutting shuffled probe rows before the exchange. The size
    thresholds are lowered here because the fixtures are tiny; at the
    10GB+ scans this engine targets, the DEFAULT thresholds fire with
    no configuration. Restores session confs so other tests see the
    stock profile."""
    import pyspark.sql.functions as F
    from grader_etl_spark.io import load

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).filter(
            F.col("o_totalprice") > 400000
        )
        li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
        plan = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "name",
    [
        "q_gini_nations",
        "q_market_concentration",
        "q_trend_slope",
        "q_bm25",
        "q_unigram_logprob",
    ],
)
def test_stat_ops_broadcast_small_sides(spark, sf_dir, name):
    """The dim/vocab/stats side of every statistical operator must
    broadcast — a shuffled join of a tiny frame against the fact or
    token stream is the silent scale regression."""
    assert "BroadcastHashJoin" in plan_of(spark, sf_dir, name), name


def test_psi_totals_ride_broadcast(spark, sf_dir):
    """q_psi_drift's only join is the 1-row totals frame — it must
    arrive by broadcast (a 1-row nested-loop broadcast is the correct
    physical plan for a keyless cross join), never an exchange of the
    bucket counts."""
    p = plan_of(spark, sf_dir, "q_psi_drift")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_pmi_pair_join_is_hash_join(spark, sf_dir):
    """The per-document term self-join must plan as an equi hash join
    on doc_id (term inequality as residual condition), never a
    cartesian pair blowup. The single BroadcastNestedLoopJoin allowed
    is the keyless 1-row n_docs cross join."""
    p = plan_of(spark, sf_dir, "q_term_pmi")
    assert "CartesianProduct" not in p
    # formatted plans print each operator twice (tree + detail)
    assert p.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in p


def test_heavy_hitters_verify_phase_broadcasts_candidates(spark, sf_dir):
    """Phase 2 of q_heavy_hitters must semi-join the token stream
    against BROADCAST candidates (a shuffled join of the full token
    stream on term is exactly the vocabulary-sized shuffle the sketch
    exists to avoid), and phase 1's Python surface must be the single
    mapInPandas kernel."""
    p = plan_of(spark, sf_dir, "q_heavy_hitters")
    assert "BroadcastHashJoin" in p
    tree = p.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1
    assert "CartesianProduct" not in p


def test_stratified_sample_is_two_phase(spark, sf_dir):
    """q_sample_stratified must rank twice — the salted phase-1 window
    (parallel across strata×salt groups) feeding the stratum-level
    re-rank — instead of one window keyed only by the 3-value stratum
    column (a 3-task sort at any cluster size)."""
    p = plan_of(spark, sf_dir, "q_sample_stratified")
    tree = p.split("\n\n")[0]
    # exactly two rank windows ("Window (" — not the WindowGroupLimit
    # rank-pushdown nodes Spark 3.5 inserts around each)
    assert tree.count("Window (") == 2
    # phase-1 partition spec carries the salt column
    detail = next(b for b in p.split("\n\n") if "Window" in b and "salt" in b)
    assert "l_returnflag" in detail


def test_new_corpus_ops_single_scan(spark, sf_dir):
    """q_zipf_slope / q_bpe_pairs: one corpus scan each — the
    rank/slope algebra must run over aggregated frames, never re-scan
    the corpus. q_skyline_parts re-scans the (3-column, pruned) part
    table once for the verdict join-back — two scans, and the frontier
    side must arrive by broadcast."""
    for name in ("q_zipf_slope", "q_bpe_pairs"):
        tree = plan_of(spark, sf_dir, name).split("\n\n")[0]
        assert tree.count("Scan parquet") == 1, name
    p = plan_of(spark, sf_dir, "q_skyline_parts")
    tree = p.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2
    assert "BroadcastHashJoin" in p


def test_parquet_aggregate_pushdown_min_max_count(spark, sf_dir):
    """Footer-stats aggregate pushdown: with the v2 parquet source and
    spark.sql.parquet.aggregatePushdown on, un-grouped MIN/MAX/COUNT
    compile to PushedAggregation on the scan — the row groups' footer
    statistics answer the query and the data pages are never decoded.
    At 100 TB this turns a full-table min/max probe (e.g. the bounds
    discovery q_histogram/compaction planning run first) into a
    metadata-only operation. Confs restored so other tests see the
    stock v1 profile."""
    import contextlib as _ctx
    import io as _io

    confs = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        import pyspark.sql.functions as F

        agg = spark.read.parquet(f"{sf_dir}/part.parquet").agg(
            F.min("p_retailprice").alias("mn"),
            F.max("p_size").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        buf = _io.StringIO()
        with _ctx.redirect_stdout(buf):
            agg.explain("formatted")
        p = buf.getvalue()
        assert "PushedAggregation: [MIN(p_retailprice), MAX(p_size), COUNT(*)]" in p
        row = agg.collect()[0]
        assert row["n"] > 0 and row["mn"] is not None
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_round2_late_ops_plan_shapes(spark, sf_dir):
    """Plan pins for the late round-2 operators: single corpus scans
    where promised, broadcasts on small sides, no cartesian anywhere."""
    # one-scan column-algebra ops
    for name in ("q_variant_extract", "q_collation_distinct", "q_log_histogram",
                 "q_ohlc_daily", "q_twap", "q_disorder_profile"):
        tree = plan_of(spark, sf_dir, name).split("\n\n")[0]
        assert tree.count("Scan parquet") == 1, name
        assert "CartesianProduct" not in tree, name
    # snapshot diff: exactly two scans (two version predicates), the
    # older one with the pushed time filter
    p = plan_of(spark, sf_dir, "q_snapshot_diff")
    tree = p.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2
    assert "LessThan(ts" in p
    # centroid eval: centroid side arrives by broadcast, never shuffle
    p = plan_of(spark, sf_dir, "q_nearest_centroid_confusion")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # salted join still hash-joins on the salted key
    p = plan_of(spark, sf_dir, "q_salted_join_agg")
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "CartesianProduct" not in p


def test_round2b_new_ops_plan_shapes(spark, sf_dir):
    """Plan pins for the survival/dependence/scale batch: fact tables
    reduce before tiny windows, the Bloom probe stays in the scan
    stage (no shuffle before the filter), and the exact-integer ops
    keep single scans."""
    # one-scan reduce-then-window ops
    for name in ("q_kaplan_meier", "q_cusum_changepoint", "q_decay_ltv",
                 "q_mutual_information", "q_corr_matrix"):
        tree = plan_of(spark, sf_dir, name).split("\n\n")[0]
        assert tree.count("Scan parquet") == 1, name
        assert "CartesianProduct" not in tree, name
    # weighted quantiles: one scan, windows share the per-flag shuffle
    tree = plan_of(spark, sf_dir, "q_weighted_quantiles").split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    # Bloom join: the bit-probe filter sits in the fact scan stage —
    # the plan's first Exchange happens only at/after the join, and
    # the probe compiles into a Filter over the parquet scan (the
    # literal bitmap never joins).
    p = plan_of(spark, sf_dir, "q_bloom_join")
    tree = p.split("\n\n")[0]
    assert "CartesianProduct" not in p
    # the probe is a projection-level filter (element_at bit test), not
    # a join: exactly the two real scans (fact + dim), and the bitmap
    # literal introduces no third input or exchange of its own
    assert tree.count("Scan parquet") == 2
    assert "element_at" in p
    # quantile normalization: the rank-keyed equi-join is a hash join
    p = plan_of(spark, sf_dir, "q_quantile_normalize")
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p
    assert "CartesianProduct" not in p


def test_selection_ops_plan_shapes(spark, sf_dir):
    """Scale promises of the selection/audit batch: DSIR broadcasts
    its vocab-sized model and takes the top-100 without a global sort;
    the dup-span and calibration pair generators never fall back to
    nested-loop; the filter-overlap audit is ONE corpus scan."""
    p = plan_of(spark, sf_dir, "q_dsir_select")
    assert "BroadcastHashJoin" in p          # model + totals ride broadcasts
    assert "TakeOrderedAndProject" in p      # top-100 via per-partition heaps
    for name in ("q_dup_span", "q_minhash_calibration"):
        p = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    tree = plan_of(spark, sf_dir, "q_filter_overlap").split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    tree = plan_of(spark, sf_dir, "q_wilson_quality").split("\n\n")[0]
    assert tree.count("Exchange") == 1       # one partial-agg shuffle, float tail on top


def test_mixture_temperature_single_scan(spark, sf_dir):
    """One corpus pass: the per-source aggregate is computed once and
    the 1-row total rides a broadcast back onto it."""
    p = plan_of(spark, sf_dir, "q_mixture_temperature")
    tree = p.split("\n\n")[0]
    assert tree.count("Scan parquet") <= 2   # avail + total derive from one agg chain
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_wide_denorm_all_dims_broadcast(spark, sf_dir):
    """The denormalization chain must be all-broadcast: three
    BroadcastHashJoins, no SortMergeJoin, one fact scan."""
    p = plan_of(spark, sf_dir, "q_wide_denorm")
    tree = p.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in tree
