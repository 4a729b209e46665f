"""Skew-mitigation utilities (SURVEY.md §7.4(8) discipline).

AQE's skew-join split handles most runtime skew (session.py enables
it), but it only splits SORT-MERGE join partitions; pathological
producer-side skew (one key = 30% of a 100 TB fact table) is still
worth salting explicitly. ``salted_join`` implements the standard
recipe: explode the SMALL side into SALT copies, scatter the big
side's hot rows across salt buckets, join on (key, salt) — same
result set, SALT× smaller max-partition.

Correctness (not performance) is what the unit test pins: salted and
plain joins must return identical multisets for inner joins on any
input, including null keys (nulls never match, with or without salt).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-scattered
    hot keys. ``how`` supports the join types where duplicating the
    small side is sound with a salt-complete right side: inner / left.
    Output columns = big's columns + small's non-key columns."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_col = (F.rand(seed=42) * salt).cast("int")
    big_s = big.withColumn("__salt", salt_col)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


# ---------------------------------------------------------------------------
# V4 — salted join as an oracle-gated query
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from grader_etl_spark.io import load  # noqa: E402
from grader_etl_spark.registry import query  # noqa: E402


@query(
    "q_salted_join_agg",
    oracle="""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
)
def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join, value-pinned in the driver gate: customer ⋈
    nation through ``salted_join`` (small side exploded ×{salt},
    big side scattered by a random-but-seeded salt), aggregated to
    per-nation totals. The oracle is the PLAIN SQL join — salting may
    only change the shuffle layout, never the result multiset, and
    this query makes that invariant part of the hash-checked contract
    rather than just a unit test. (The nondeterministic salt column
    never reaches the output; the aggregate is salt-invariant by
    construction, so the hash is stable across runs.) DECIMAL-exact
    sum keeps partial-order effects out of the comparison.""".format(
        salt=DEFAULT_SALT
    )
    cust = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nat = load(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"]).select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = salted_join(cust, nat, on="c_nationkey")
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
    )
