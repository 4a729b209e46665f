"""Property tests for the two-phase / bucketized plan rewrites: the
clever plan must equal the naive semantics on arbitrary inputs —
these guard exactly the places where a partitioning trick could
silently change results."""

from __future__ import annotations

import datetime as dt
import hashlib

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=500),   # orderkey
        st.integers(min_value=1, max_value=7),     # linenumber
        st.sampled_from(["A", "N", "R"]),          # returnflag
    ),
    min_size=1,
    max_size=120,
    unique=True,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_strategy)
def test_salted_stratified_equals_naive_single_window(spark, rows):
    """q_sample_stratified's salted two-phase top-k == the naive
    per-stratum window on any input (the salt may only change the
    plan, never the rows)."""
    import grader_etl_spark.operators.sampling as sa

    df = spark.createDataFrame(
        [(o, l, f) for (o, l, f) in rows],
        "l_orderkey long, l_linenumber long, l_returnflag string",
    )

    class _Loader:
        pass

    monkey = lambda spark, sf, t, columns=None: df  # noqa: E731
    orig = sa.load
    sa.load = monkey
    try:
        got = {
            tuple(r)
            for r in sa.q_sample_stratified(spark, "x").collect()
        }
    finally:
        sa.load = orig

    # naive reference in Python: per flag, 50 smallest md5 keys
    want = set()
    byflag: dict = {}
    for o, l, f in rows:
        h = hashlib.md5(f"{o}-{l}".encode()).hexdigest()
        byflag.setdefault(f, []).append((h, o, l))
    for f, entries in byflag.items():
        for h, o, l in sorted(entries)[:50]:
            want.add((f, o, l))
    assert got == want


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),    # user id
        st.integers(min_value=0, max_value=5000),  # start minute
        st.integers(min_value=1, max_value=900),   # duration minutes
    ),
    min_size=1,
    max_size=60,
    unique=True,  # identical duplicate intervals would collapse in the
    # operator's DISTINCT but count separately in the quadratic reference
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(iv=intervals_strategy)
def test_bucketized_overlap_equals_quadratic(spark, iv):
    """The hour-bucket overlap join must count exactly the pairs the
    quadratic predicate admits — bucketization is pruning, never
    semantics. Uses the operator's internal bucket+verify shape on
    raw intervals (session building is covered by its own oracle)."""
    base = dt.datetime(2024, 1, 1)
    sess = [
        (u, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
        for (u, s, d) in iv
    ]
    df = spark.createDataFrame(sess, "user_id long, st timestamp, en timestamp")
    BUCKET = 3600
    b = df.withColumn(
        "hb",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("st") / BUCKET),
                F.floor((F.unix_timestamp("en") - 1) / BUCKET),
            )
        ),
    )
    a, bb = b.alias("a"), b.alias("b")
    got = (
        a.join(
            bb,
            (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.st") < F.col("b.en"))
            & (F.col("b.st") < F.col("a.en")),
        )
        .select("a.user_id", "b.user_id", "a.st", "a.en", "b.st", "b.en")
        .distinct()
        .count()
    )
    # quadratic reference over unordered interval pairs with u1 != u2
    want = sum(
        1
        for i, (u1, s1, e1) in enumerate(sess)
        for j, (u2, s2, e2) in enumerate(sess)
        if i < j and u1 != u2 and s1 < e2 and s2 < e1
    )
    assert got == want
