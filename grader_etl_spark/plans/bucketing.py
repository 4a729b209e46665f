"""Bucketed-table co-location (SURVEY.md §4.2 / 100 TB discipline).

A fact⋈fact join (orders⋈lineitem) shuffles both sides on every run.
Bucketing pre-pays that shuffle once at write time: both tables are
written `bucketBy(N, key)` + `sortBy(key)`, and every later equi-join
on the key plans as a sort-merge join with NO Exchange on either side
— at 100 TB this converts the dominant per-query cost into a one-time
layout cost, and the same layout serves groupBy(key) aggregations.

Bucket-count guidance: N should divide evenly into executor-count ×
cores (task parallelism) and keep each bucket file partition-sized
(~128-512 MB at target scale). Both tables MUST use the same N for
co-location; Spark joins differing counts by shuffling the smaller.

The in-session catalog records bucketing metadata; on a cluster this
is the metastore. tests/test_bucketing.py pins the no-Exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) parquet
    table in the session catalog/warehouse."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys — plans with
    zero shuffle exchanges when both sides share the bucket count."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
