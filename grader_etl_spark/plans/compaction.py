"""Small-file compaction — the table-maintenance pass every
long-running ingest needs: streaming/incremental writers (§2.8,
plans/incremental.py) emit per-batch files, and a 100 TB table
accumulating thousands of KB-sized parquet files loses scan
throughput to footer reads and task-scheduling overhead long before
it loses it to I/O.

Strategy: measure the actual on-disk bytes, size the output file
count so each file lands near ``target_bytes`` (the classic 128 MB
HDFS-block heuristic), and rewrite with a round-robin
``repartition(n)`` — an all-to-all shuffle that produces uniformly
sized files regardless of input skew. Sort-preserving variants
(compact within a partition directory, keep a Z-order) compose by
passing ``sort_cols``; date-partitioned tables compact per-partition
via the same call pointed at one partition directory (never shuffle
the whole table to fix one hot day).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (local fs; on a real
    cluster this is a FileSystem.getContentSummary call)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def n_data_files(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``src_dir`` into ``dst_dir`` with files sized toward
    ``target_bytes``. Returns the compacted DataFrame (lazy reader on
    the new location)."""
    size = dir_bytes(src_dir)
    n_out = max(1, math.ceil(size / target_bytes))
    df = spark.read.parquet(src_dir)
    if sort_cols:
        # Range-partition + in-file sort: keeps min/max footer stats
        # tight so data skipping survives compaction.
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)
