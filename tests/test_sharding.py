"""Sharding / mixture invariants beyond the SQL oracles: shard ids in
range with no empty shard at fixture scale, sort keys collision-free,
and mixture rates that actually rebalance toward uniform without
upsampling."""

from __future__ import annotations

from grader_etl_spark.operators.sharding import N_SHARDS, q_corpus_shards, q_mixture_rates


def test_corpus_shards_cover_and_order(spark, sf_dir):
    rows = q_corpus_shards(spark, sf_dir).collect()
    assert len(rows) == len({r.doc_id for r in rows})
    shards = {r.shard_id for r in rows}
    assert shards <= set(range(N_SHARDS))
    # 500+ docs over 16 shards: every shard populated unless the hash
    # is badly broken.
    assert len(shards) == N_SHARDS
    # Sort keys are the shuffle order — a collision would make the
    # order ambiguous; md5_32 over distinct keys must not collide at
    # fixture scale.
    assert len({r.sort_key for r in rows}) == len(rows)


def test_mixture_rates_rebalance_without_upsampling(spark, sf_dir):
    rows = q_mixture_rates(spark, sf_dir).collect()
    n_total = sum(r.n_docs for r in rows)
    target = n_total / len(rows)
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0
        assert r.expected_docs <= r.n_docs  # never upsample
        # Rates move every over-represented source to ~the uniform
        # target share; under-represented sources are left whole.
        if r.n_docs > target:
            assert abs(r.sample_rate * r.n_docs - target) <= 1.0 + target * 1e-4
        else:
            assert r.sample_rate == 1.0


def test_concat_chunks_conserves_tokens_and_fill(spark, sf_dir):
    """Chunk token fills must sum to the corpus token volume, every
    non-final chunk per shard is exactly full, and chunk ids per
    shard are dense from 0."""
    import collections

    import grader_etl_spark.operators.sharding as sh
    from grader_etl_spark.io import load

    rows = sh.q_concat_chunks(spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    docs = load(spark, sf_dir, "documents", columns=["text"]).collect()
    assert total == sum(len(r["text"].strip().split()) for r in docs)

    by_shard = collections.defaultdict(list)
    for r in rows:
        by_shard[r["shard_id"]].append(r)
    for shard, chunks in by_shard.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks))), shard
        for c in chunks[:-1]:
            assert c["n_tokens"] == sh.CHUNK_TOKENS, (shard, c["chunk_id"])
        assert 0 < chunks[-1]["n_tokens"] <= sh.CHUNK_TOKENS


def test_concat_chunks_matches_pure_python_replay(spark, sf_dir):
    """Replay shard → order → concat → cut in plain Python and demand
    bit-equal chunk rows."""
    import collections

    import grader_etl_spark.operators.sharding as sh
    from grader_etl_spark.functions.hashing import md5_32_py
    from grader_etl_spark.io import load

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"]).collect()
    by_shard = collections.defaultdict(list)
    for r in docs:
        n = len(r["text"].strip().split())
        if n == 0:
            continue
        sid = md5_32_py(f"shard:{r['doc_id']}") % sh.N_SHARDS
        by_shard[sid].append((md5_32_py(f"order:{r['doc_id']}"), r["doc_id"], n))
    want = {}
    for sid, lst in by_shard.items():
        lst.sort()
        off = 0
        agg = collections.defaultdict(lambda: [0, 0, None, None])  # docs, toks, first, last
        for _, doc_id, n in lst:
            for cid in range(off // sh.CHUNK_TOKENS, (off + n - 1) // sh.CHUNK_TOKENS + 1):
                a = agg[cid]
                lo = max(off, cid * sh.CHUNK_TOKENS)
                hi = min(off + n, (cid + 1) * sh.CHUNK_TOKENS)
                a[0] += 1
                a[1] += hi - lo
                if a[2] is None:
                    a[2] = doc_id
                a[3] = doc_id
            off += n
        for cid, a in agg.items():
            want[(sid, cid)] = tuple(a)
    got = {
        (r["shard_id"], r["chunk_id"]): (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in sh.q_concat_chunks(spark, sf_dir).collect()
    }
    assert got == want
