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
