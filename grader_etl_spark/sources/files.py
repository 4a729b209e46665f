"""Schema-pinned file readers/writers (SURVEY.md §2.1 S3 + the landed-
file scale path for S1).

Policy, uniform across formats:

- explicit schema always (inference is a second scan at best and a
  silent drift-acceptor at worst);
- PERMISSIVE mode with a retained `_corrupt_record` column for the
  semi-structured formats — the reference's per-record error tolerance
  (main.py:173-176) as a side column instead of a skipped row;
- parquet is the canonical store format (columnar, statistics,
  partition pruning); csv/json exist for interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines reader; malformed lines land in _corrupt_record."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType, header: bool = True) -> DataFrame:
    """CSV reader with the same corrupt-record side channel."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — schema comes from the file footers (parquet is
    self-describing; pinning a schema here would only mask drift that
    should fail loudly at write time instead)."""
    return spark.read.parquet(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) halves of a PERMISSIVE read — F5's quarantine.

    Spark refuses queries that reference ONLY _corrupt_record over a
    raw JSON/CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the column
    is populated during parsing, not stored — so the scan is cached
    once and both halves read the cache. Quarantine is a
    bounded-badness side channel; at 100 TB you'd write both halves
    from this single cached pass anyway."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(df[CORRUPT_COL].isNotNull())
    return clean, corrupt


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "append"
) -> None:
    """Canonical-store writer: date/key-partitioned parquet so
    downstream date filters prune files (the 100 TB layout)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — like parquet, self-describing columnar with
    predicate pushdown and column pruning; supported as an
    interchange format for ORC-based lakes (Hive heritage)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC writer (zlib default compression)."""
    df.write.mode(mode).orc(path)
