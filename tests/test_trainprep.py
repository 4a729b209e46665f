"""Corpus-rewrite operators (operators/trainprep.py): dedup-rewrite
invariants, SemDeDup cluster accounting, and the BPE trainer pinned
exact against a pure-Python reference on the same word counts."""

from __future__ import annotations

import collections

import duckdb
import pyspark.sql.functions as F

from grader_etl_spark.operators.trainprep import (
    BPE_MERGES,
    CHUNK_WORDS,
    MIX_BUDGET_FRAC,
    bpe_train,
    q_bpe_encode,
    q_bpe_train,
    q_chunk_dedup_rewrite,
    q_mixture_waterfill,
    q_semdedup,
)


def test_chunk_dedup_rewrite_invariants(spark, sf_dir):
    out = q_chunk_dedup_rewrite(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if r["text"]
    }
    assert {r["doc_id"] for r in out} == set(docs)
    n_uniq = duckdb.sql(
        f"""
        SELECT count(DISTINCT array_to_string(
                 string_split(text,' ')[i*{CHUNK_WORDS}+1 : i*{CHUNK_WORDS}+{CHUNK_WORDS}], ' '))
        FROM (SELECT text, unnest(generate_series(0,
                 (len(string_split(text,' '))-1)//{CHUNK_WORDS})) AS i
              FROM read_parquet('{sf_dir}/documents.parquet') WHERE length(text)>0)
        """
    ).fetchone()[0]
    # first-occurrence-wins keeps exactly one copy of each distinct chunk
    assert sum(r["n_kept"] for r in out) == n_uniq
    for r in out:
        assert r["n_kept"] <= r["n_chunks"]
        # a fully-surviving doc reconstructs byte-identically
        if r["n_kept"] == r["n_chunks"]:
            assert r["new_text"] == docs[r["doc_id"]]
        # surviving text is always a subsequence of the original's chunks
        assert len(r["new_text"]) <= len(docs[r["doc_id"]])


def test_chunk_dedup_window_shuffles_hashes_not_text(spark, sf_dir):
    """The first-occurrence window must run on the projected
    (doc_id, idx, md5) frame — its exchange carries a 32-char digest,
    not document text (the module's one-text-shuffle promise)."""
    plan = q_chunk_dedup_rewrite(spark, sf_dir)._jdf.queryExecution().toString()
    window_lines = [l for l in plan.splitlines() if "Window" in l and "row_number" in l]
    assert window_lines and all("chunk" not in l for l in window_lines)


def test_semdedup_accounting(spark, sf_dir):
    rows = q_semdedup(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    per_label = {r["label"]: r["n"] for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert {r["label"]: r["n_members"] for r in rows} == per_label
    for r in rows:
        assert r["n_dup"] + r["n_kept"] == r["n_members"]
        assert r["n_kept"] >= 1  # the lowest-id member of a cluster always survives


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE (Sennrich et al. 2016): same tie-break
    (count desc, left asc, right asc), greedy left-to-right apply."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark, sf_dir):
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in q_bpe_train(spark, sf_dir).orderBy("rank").collect()
    ]
    counts: dict[str, int] = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect():
        for w in (r["text"] or "").split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    assert got == _python_bpe(counts, BPE_MERGES)
    assert len(got) == BPE_MERGES


def test_bpe_encode_preserves_characters(spark, sf_dir):
    """Merging never creates or destroys characters: Σ cnt·len(token)
    over the encoded corpus equals the corpus's non-space length."""
    toks = q_bpe_encode(spark, sf_dir).collect()
    total_chars = duckdb.sql(
        f"""SELECT sum(len(w) * c) FROM (
              SELECT w, count(*) c FROM (SELECT unnest(string_split(text,' ')) w
              FROM read_parquet('{sf_dir}/documents.parquet')) WHERE w<>'' GROUP BY w)"""
    ).fetchone()[0]
    assert sum(r["cnt"] * len(r["token"]) for r in toks) == total_chars
    assert any(len(r["token"]) > 1 for r in toks)  # merges actually fired


def test_waterfill_invariants(spark, sf_dir):
    rows = q_mixture_waterfill(spark, sf_dir).collect()
    budget = int(MIX_BUDGET_FRAC * sum(r["avail"] for r in rows))
    assert abs(sum(r["alloc"] for r in rows) - budget) < 1e-3 * len(rows)
    lams = set()
    for r in rows:
        assert r["alloc"] <= r["avail"] + 1e-9
        if r["saturated"]:
            assert r["alloc"] == r["avail"]
        else:
            lams.add(round(r["alloc"] / r["weight"], 6))
    assert len(lams) <= 1  # one global water level for all unsaturated sources


def test_bpe_train_merged_tokens_grow(spark, sf_dir):
    df = spark.createDataFrame([("abab", 3), ("ab", 2)], "word string, cnt long").select(
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").alias("syms"),
        "cnt",
    )
    merges = bpe_train(df, 2)
    # 'a b' occurs 3+3+2 = 8 times, merges first; then 'ab ab' (3).
    assert merges[0][1:] == ("a", "b", 8)
    assert merges[1][1:] == ("ab", "ab", 3)


def test_tokenizer_fertility_invariants(spark, monkeypatch):
    import grader_etl_spark.operators.trainprep as tp

    # 'er' merges to one token (rule 1); 'xq' never merges (2 tokens).
    rows = [
        (1, "merged", "s", "er er er", 0),
        (2, "split", "s", "xq xq xq", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string, n_chars long"
    )
    monkeypatch.setattr(tp, "load", lambda spark, sf, t, columns=None: docs.select(columns))
    got = {r["lang"]: r for r in tp.q_tokenizer_fertility(spark, "x").collect()}
    assert got["merged"]["fertility"] == 1.0          # 'er' -> ['er']
    assert got["split"]["fertility"] == 2.0           # 'xq' -> ['x','q']
    assert got["merged"]["n_words"] == 3 and got["merged"]["n_tokens"] == 3
    assert got["split"]["chars_per_token"] == 1.0
    assert got["merged"]["chars_per_token"] == 2.0


def test_mixture_temperature_flattens(spark, sf_dir):
    from grader_etl_spark.operators.trainprep import q_mixture_temperature

    rows = q_mixture_temperature(spark, sf_dir).collect()
    raw = {r["source"]: r["raw_share"] for r in rows}
    temp = {r["source"]: r["temp_share"] for r in rows}
    assert abs(sum(raw.values()) - 1.0) < 1e-4
    assert abs(sum(temp.values()) - 1.0) < 1e-4
    # τ=0.5 flattens: the biggest source loses share, the smallest gains.
    big = max(raw, key=raw.get)
    small = min(raw, key=raw.get)
    assert temp[big] < raw[big]
    assert temp[small] > raw[small]
