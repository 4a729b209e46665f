"""Storage layout — the write-side half of the 100 TB design.

The reference's one store is an unpartitioned Postgres table written
row-at-a-time (main.py:180-228). At scale the store is parquet laid
out so the READ plans in this repo get their pruning for free:

- **date partitioning** (`partitionBy("event_date")`): the daily
  report's date-equality filter (SURVEY §2.3 F3) becomes partition
  pruning — the scan never opens files outside the day.
- **one file per partition-value per write** (`repartition` on the
  partition column first): without it every task writes every date it
  happens to hold → tasks × dates small files, the classic layout
  bug that turns a 100 TB table into billions of tiny objects.
- **sortWithinPartitions(ts)**: clusters rows so parquet row-group
  min/max statistics make intra-day time-range scans skip row groups
  (the pushed-down range filter in io.load_events_range needs this
  physical order to actually skip anything).

tests/test_layout.py pins all three properties: directory structure,
file counts, and that a day-filtered read shows PartitionFilters and
touches only that day's files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load

PARTITION_COL = "event_date"


def write_date_partitioned(
    events: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write events as date-partitioned parquet, one file per day,
    time-sorted within each file."""
    (
        events.withColumn(PARTITION_COL, F.to_date(ts_col))
        .repartition(F.col(PARTITION_COL))
        .sortWithinPartitions(ts_col)
        .write.partitionBy(PARTITION_COL)
        .mode(mode)
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Scan one day from the partitioned store. The equality filter on
    the partition column prunes directories at planning time —
    .explain('formatted') shows it under PartitionFilters, not
    PushedFilters, and inputFiles() stays inside one day directory."""
    return spark.read.parquet(path).filter(F.col(PARTITION_COL) == F.lit(day).cast("date"))


def ingest_events(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Lay out the events fixture as the canonical partitioned store
    (the batch half of the reference pipeline's Load stage)."""
    write_date_partitioned(load(spark, sf_dir, "events"), path)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — multi-column data skipping
# ---------------------------------------------------------------------------

ZORDER_BITS = 16


def morton_code(a, b, bits: int = ZORDER_BITS):
    """Interleave the low ``bits`` of two non-negative int columns into
    one Z-value (a0 b0 a1 b1 ... from the LSB): rows close in Z are
    close in BOTH key ranges. Pure bitwise column algebra — stays in
    codegen; cost is 2*bits shifts per row at write time only."""
    z = F.lit(0).cast("long")
    a = a.cast("long")
    b = b.cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(one)
        bit_b = F.shiftright(b, i).bitwiseAND(one)
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Write ``df`` clustered by the Z-order of (col_a, col_b):
    range-partition on the Morton code (so files own contiguous Z
    ranges), sort within partitions, write. Each parquet file's
    min/max footer stats then bound BOTH columns tightly, so a filter
    on EITHER column skips most files — what a single-column sort only
    gives you for its leading column. This is the lakehouse Z-ORDER
    primitive (Delta OPTIMIZE ZORDER BY) from first principles;
    tests/test_layout.py measures the skipping bound directly from
    the written footers."""
    # Min-max scale both keys into the full bit budget first: raw
    # interleaving degenerates toward a single-column sort when the
    # keys span different magnitudes (the wider key's high bits own
    # every significant Z position). One tiny agg at write time.
    mm = df.agg(
        F.min(col_a).alias("a_lo"), F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"), F.max(col_b).alias("b_hi"),
    ).collect()[0]
    full = (1 << ZORDER_BITS) - 1

    def scaled(c: str, lo, hi):
        span = max(int(hi) - int(lo), 1)
        return ((F.col(c).cast("long") - F.lit(int(lo))) * full / span).cast("long")

    z = morton_code(scaled(col_a, mm["a_lo"], mm["a_hi"]), scaled(col_b, mm["b_lo"], mm["b_hi"]))
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# point-lookup layout — parquet column bloom filters
# ---------------------------------------------------------------------------


def write_point_lookup_layout(
    df: DataFrame,
    path: str,
    *,
    bloom_cols: dict[str, int],
    mode: str = "overwrite",
) -> None:
    """Write parquet with COLUMN BLOOM FILTERS on the given
    high-cardinality keys (``{column: expected_ndv}``) — the layout
    for needle-in-100TB point lookups (doc_id, attempt_id, content
    hash): an equality probe consults the row group's bloom bitset
    from the footer and skips the group without touching data pages,
    where min/max stats are useless because random keys span the full
    range in every group.

    parquet-mr is ADAPTIVE here: a column whose pages all ended up
    dictionary-encoded gets NO bloom (the dictionary already answers
    membership exactly) — so low-cardinality columns cost nothing
    even when listed. Sizing: ndv drives the bitset size (~1.2 MB per
    1M keys at the default 1% fpp); oversizing wastes footer bytes,
    undersizing inflates false-positive row-group reads, neither
    affects correctness (tests/test_layout.py pins both the written
    bitset and the dictionary-skip behavior)."""
    w = df.write.mode(mode)
    for col, ndv in bloom_cols.items():
        w = w.option(f"parquet.bloom.filter.enabled#{col}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{col}", str(int(ndv)))
    w.parquet(path)
