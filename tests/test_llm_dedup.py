"""Approximate-dedup quality gates (SURVEY.md §5.2; the pytest half of
the rows-only queries' correctness story).

- MinHash+LSH candidates, after exact-Jaccard verification, must be a
  SUBSET of the exact all-pairs result (precision = 1 by construction)
  and recover nearly all high-similarity pairs (recall floor).
- SimHash must give identical signatures for identical text and
  near-identical signatures under a small edit.
- shingles() edge cases: short docs, exact-k docs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from grader_etl_spark.operators.llm_dedup import (
    q_dedup_simhash,
    q_neardup_jaccard,
    q_neardup_minhash,
    shingles,
    simhash,
)


def _pairs(df) -> set[tuple]:
    return {(r["doc_id_1"], r["doc_id_2"]) for r in df.select("doc_id_1", "doc_id_2").collect()}


def test_minhash_subset_and_recall(spark, sf_dir):
    exact = q_neardup_jaccard(spark, sf_dir)
    approx = q_neardup_minhash(spark, sf_dir)
    exact_pairs = _pairs(exact)
    approx_pairs = _pairs(approx)
    # Verified candidates can never include a below-threshold pair.
    assert approx_pairs <= exact_pairs
    # High-similarity pairs (jaccard >= 0.5) collide in >=1 of 16 bands
    # with overwhelming probability at 64 perms / 4 rows.
    strong = _pairs(exact.filter(F.col("jaccard") >= 0.5))
    if strong:
        recall = len(approx_pairs & strong) / len(strong)
        assert recall >= 0.9, f"strong-pair recall {recall:.2f} < 0.9"
    # Overall recall at the 0.25 threshold is lower (banding theory),
    # but must stay non-trivial on the fixture.
    if exact_pairs:
        assert len(approx_pairs) / len(exact_pairs) >= 0.5


def test_simhash_identical_and_near_identical(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = base.replace("lazy", "sleepy")
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, edited)], "doc_id int, text string"
    ).select("doc_id", simhash(F.col("text")).alias("sig"))
    sigs = {r["doc_id"]: r["sig"] for r in df.collect()}
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    hamming = bin(sigs[1] ^ sigs[3]).count("1")
    assert hamming <= 10, f"one-word edit moved {hamming}/32 bits"


def test_simhash_query_pairs_are_symmetric_free(spark, sf_dir):
    pairs = _pairs(q_dedup_simhash(spark, sf_dir))
    assert all(a < b for a, b in pairs)  # no self/dup/reversed pairs


def test_shingles_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),  # 2 shingles of k=3
            (2, "a b"),  # shorter than k -> empty
            (3, "a b c"),  # exactly k -> 1 shingle
            (4, "a a a a"),  # repeats collapse (distinct)
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: sorted(r["s"]) for r in df.select("doc_id", shingles(F.col("text")).alias("s")).collect()}
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []
    assert got[3] == ["a b c"]
    assert got[4] == ["a a a"]


def test_minhash_calibration_estimator_properties(spark, sf_dir):
    from grader_etl_spark.operators.llm_dedup import MINHASH_PERMS, q_minhash_calibration

    rows = q_minhash_calibration(spark, sf_dir).collect()
    assert rows  # LSH surfaces candidates on the fixture corpus
    for r in rows:
        assert 0 <= r["n_agree"] <= MINHASH_PERMS
        assert r["est_jaccard"] == r["n_agree"] / MINHASH_PERMS
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1e-12
    # The estimator is unbiased; on candidate pairs the MEAN absolute
    # error should sit well inside the 1/sqrt(64) standard error.
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err < 0.125


def test_prefix_filter_is_lossless_vs_plain_jaccard(spark, sf_dir):
    """q_neardup_prefix (prefix-filtered candidates) must return
    EXACTLY the plain inverted-index pairs at J >= 1/2 — the
    prefix-filtering lemma in executable form."""
    from grader_etl_spark.operators.llm_dedup import q_neardup_jaccard, q_neardup_prefix

    plain = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in q_neardup_jaccard(spark, sf_dir).collect()
        if r["jaccard"] >= 0.5
    }
    pref = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in q_neardup_prefix(spark, sf_dir).collect()
    }
    assert pref == plain


def test_jaccard_default_path_matches_plain_inverted_index(spark, sf_dir):
    """q_neardup_jaccard (and therefore the session pair memo feeding
    its 14 consumers) generates candidates via the PPJoin prefix
    filter at τ = 1/4; its verified pair set must EXACTLY equal the
    plain shared-shingle inverted-index baseline verified the same
    way — the losslessness of the default path, pinned on real data."""
    import pyspark.sql.functions as F

    from grader_etl_spark.operators.llm_dedup import (
        _JACCARD_THRESHOLD,
        q_neardup_jaccard,
        shared_shingle_pairs,
        shingled_docs,
    )

    sh = shingled_docs(spark, sf_dir)
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("sset").alias("sset_1"))
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("sset").alias("sset_2"))
    c = F.size(F.array_intersect("sset_1", "sset_2"))
    baseline = (
        shared_shingle_pairs(sh)
        .join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            (c.cast("double") / (F.size("sset_1") + F.size("sset_2") - c)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )
    plain = {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"] for r in baseline.collect()}
    new = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in q_neardup_jaccard(spark, sf_dir).collect()
    }
    assert new == plain
    assert new, "fixture must actually contain near-dup pairs"


def test_prefix_filter_lemma_holds_on_random_sets():
    """Pure-Python property check of the prefix-filtering lemma at
    BOTH production thresholds (τ = 1/2 for q_neardup_prefix, τ = 1/4
    for q_neardup_jaccard / the pair memo), with the generalized
    parameters of prefix_filtered_candidates: prefix length
    sz − ⌈n·sz/d⌉ + 1 under the (df asc, token asc) order. Any pair
    with Jaccard ≥ τ must share an element within both prefixes AND
    pass the positional suffix bound — no Spark, validates the
    pruning rule itself."""
    import collections
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    docs_st = st.lists(
        st.sets(st.integers(min_value=0, max_value=40), min_size=1, max_size=20),
        min_size=2,
        max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(docs=docs_st)
    def check(docs):
        df = collections.Counter(x for s in docs for x in s)
        for n, d in ((1, 2), (1, 4)):
            orders, prefixes = [], []
            for s in docs:
                order = sorted(s, key=lambda x: (df[x], x))
                orders.append(order)
                plen = len(s) - (n * len(s) + d - 1) // d + 1
                prefixes.append(order[:plen])
            for (s1, o1, p1), (s2, o2, p2) in itertools.combinations(
                zip(docs, orders, prefixes), 2
            ):
                inter = len(s1 & s2)
                j = inter / (len(s1) + len(s2) - inter)
                if j >= n / d:
                    common = set(p1) & set(p2)
                    assert common, (n, d, s1, s2)
                    # positional lemma (the Spark join's third
                    # conjunct): some shared prefix token must ALSO
                    # pass the suffix bound
                    # (n+d)·min(|A|−i, |B|−j) ≥ n·(|A|+|B|) at its
                    # 0-based positions — qualifying pairs always
                    # survive it.
                    assert any(
                        (n + d) * min(len(s1) - o1.index(t), len(s2) - o2.index(t))
                        >= n * (len(s1) + len(s2))
                        for t in common
                    ), (n, d, s1, s2)

    check()


def test_containment_prefix_lemma_holds_on_random_sets():
    """Pure-Python property check of the ONE-SIDED containment prefix
    filter (containment_prefix_candidates at t = 3/5): any pair with
    c/min(|A|,|B|) ≥ t — i.e. qualifying as src→dst in SOME direction
    — must collide between the SMALLER doc's df-ordered prefix
    (length |A| − ⌈t·|A|⌉ + 1) and the larger doc's FULL list, with
    some colliding token also passing the positional suffix bound
    d·min(|A|−i, |B|−j) ≥ n·|A|."""
    import collections
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    n, d = 3, 5
    docs_st = st.lists(
        st.sets(st.integers(min_value=0, max_value=40), min_size=1, max_size=20),
        min_size=2,
        max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(docs=docs_st)
    def check(docs):
        df = collections.Counter(x for s in docs for x in s)
        orders = [sorted(s, key=lambda x: (df[x], x)) for s in docs]
        for (s1, o1), (s2, o2) in itertools.combinations(zip(docs, orders), 2):
            # orient: a = smaller side under the (size, identity) order
            if len(s1) > len(s2):
                (s1, o1), (s2, o2) = (s2, o2), (s1, o1)
            c = len(s1 & s2)
            if d * c >= n * len(s1):  # qualifies in the easiest direction
                plen = len(s1) - (n * len(s1) + d - 1) // d + 1
                common = set(o1[:plen]) & s2
                assert common, (s1, s2)
                assert any(
                    d * min(len(s1) - o1.index(t), len(s2) - o2.index(t))
                    >= n * len(s1)
                    for t in common
                ), (s1, s2)

    check()
