"""Property-based dedup invariant (SURVEY.md §5.2 item 4).

The reference's `INSERT ... ON CONFLICT DO NOTHING`
(/root/reference/main.py:202) means: across any sequence of
(re-)deliveries, sink contents equal first-writer-wins by key. The
engine renders that as `first_writer_wins` (in-batch) +
`insert_new_keys_only` (cross-batch anti-join); this test checks both
against a pandas model over hypothesis-generated batches.

Spark jobs per example are ~0.5 s, so examples are few but each is a
full two-batch redelivery scenario with overlapping keys.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from grader_etl_spark.operators.dedup import first_writer_wins, insert_new_keys_only

# rows: (key, seq, payload) — small key space forces collisions.
row_st = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=100),
    st.text(alphabet="abc", min_size=0, max_size=3),
)
batch_st = st.lists(row_st, min_size=0, max_size=25)


def _model_first_writer(rows: list[tuple]) -> set[tuple]:
    """First row per key, ordered by (seq, payload) — the invariant."""
    df = pd.DataFrame(rows, columns=["k", "seq", "payload"])
    if df.empty:
        return set()
    df = df.sort_values(["k", "seq", "payload"], kind="mergesort")
    return set(df.groupby("k").head(1).itertuples(index=False, name=None))


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(batch=batch_st)
def test_first_writer_wins_matches_model(spark, batch):
    df = spark.createDataFrame(batch, "k int, seq int, payload string")
    got = set(
        first_writer_wins(df, keys=["k"], order=["seq", "payload"])
        .toLocalIterator()
    )
    got = {(r["k"], r["seq"], r["payload"]) for r in got}
    assert got == _model_first_writer(batch)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(batch1=batch_st, batch2=batch_st)
def test_cross_batch_redelivery_is_idempotent(spark, batch1, batch2):
    """sink = dedup(batch1); sink' = sink + new-keys-only(dedup(batch2)).
    Invariant: sink' keys are unique, batch-1 rows always win on
    overlap, and every key from either batch is present."""
    d1 = first_writer_wins(
        spark.createDataFrame(batch1, "k int, seq int, payload string"),
        keys=["k"],
        order=["seq", "payload"],
    )
    d2 = first_writer_wins(
        spark.createDataFrame(batch2, "k int, seq int, payload string"),
        keys=["k"],
        order=["seq", "payload"],
    )
    sink = d1.unionByName(insert_new_keys_only(d2, d1, keys=["k"]))
    rows = {(r["k"], r["seq"], r["payload"]) for r in sink.collect()}

    m1 = _model_first_writer(batch1)
    m2 = _model_first_writer(batch2)
    keys1 = {r[0] for r in m1}
    expected = m1 | {r for r in m2 if r[0] not in keys1}
    assert rows == expected
