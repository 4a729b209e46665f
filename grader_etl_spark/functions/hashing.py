"""Cross-engine 32-bit content hash.

Spark and DuckDB share no native word-size hash (Spark: crc32 /
xxhash64 / murmur; DuckDB: its own ``hash()``), which is why the
MinHash and winnowing operators were originally rows-only. Both DO
ship md5 over UTF-8 bytes, so the first 8 hex chars parsed as an
unsigned 32-bit integer give a hash computable bit-identically in
PySpark and in the DuckDB oracle — turning those pipelines into real
value-checked queries. Uniformity is md5-grade (better than crc32);
the 32-bit width keeps the MinHash permutation algebra
(a*h + b with a < 2^31) inside signed-64-bit range in both engines.

JVM-side cost: md5 + conv are codegen'd built-ins — no Python. ~2×
crc32's cost per call, which the affected queries absorb (they are
shuffle-bound, not hash-bound).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# DuckDB rendition: format with the SQL expression producing the text.
MD5_32_SQL = "CAST(CONCAT('0x', SUBSTRING(md5({expr}), 1, 8)) AS BIGINT)"

# Lane variant: the 128-bit md5 digest is four disjoint 32-bit words,
# so a consumer needing d independent-ish hashes of the SAME input
# (Count-Min rows, Bloom probes) pays ONE md5 and slices, instead of
# d md5s over d prefixed inputs. {expr} is the hashed text, {lane} a
# SQL integer expression in [0, 3].
MD5_LANE_SQL = (
    "CAST(CONCAT('0x', SUBSTRING(md5({expr}), 1 + 8 * ({lane}), 8)) AS BIGINT)"
)


def md5_32(col: Column) -> Column:
    """First 32 bits of md5(col) as a non-negative long — the Spark
    half of the cross-engine hash (DuckDB half: MD5_32_SQL)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_lane(digest: Column, lane: int) -> Column:
    """Lane ``lane`` (0-3) of a precomputed ``F.md5`` hex digest as a
    non-negative long (DuckDB half: MD5_LANE_SQL). Taking the digest
    column — not the raw text — keeps the md5 itself single-evaluated
    when d lanes are sliced from one row."""
    return F.conv(F.substring(digest, 1 + 8 * lane, 8), 16, 10).cast("long")


def md5_32_py(s: str) -> int:
    """Pure-Python reference for tests."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def md5_lane_py(s: str, lane: int) -> int:
    """Pure-Python reference for md5_lane, for tests."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[8 * lane : 8 * lane + 8], 16)
