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


def md5_32(col: Column) -> Column:
    """First 32 bits of md5(col) as a non-negative long — the Spark
    half of the cross-engine hash (DuckDB half: MD5_32_SQL)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_32_py(s: str) -> int:
    """Pure-Python reference for tests."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
