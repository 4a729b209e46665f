"""Schema evolution over the parquet store — additive column changes
without rewriting history.

The reference's schema is frozen in a CREATE TABLE executed once
(/root/reference/main.py:180-191); adding a field means hand-ALTERing
Postgres. A parquet store evolves differently: each file carries its
own schema footer, so NEW batches simply write the wider schema and
the store's logical schema is the UNION of footers, resolved at read
time (``mergeSchema``) — no rewrite of the 100 TB of history, which
is the only acceptable cost model at scale.

Rules enforced here (the additive-only discipline every lakehouse
format codifies):

- **add a nullable column**: allowed — old files surface NULL for it
  (``read_evolved``), optionally patched by ``with_backfill`` at read
  time (compute-on-read, zero rewrite) until natural compaction
  cycles the old files out.
- **type change / drop / rename**: refused by ``append_batch`` (a
  rename is a drop+add that silently orphans history; a type change
  makes footers contradict). These require an explicit migration
  rewrite, which is a different job with a different cost — refusing
  is the feature.

tests/test_evolution.py pins: widened append leaves old files
untouched, merged reads see NULL+backfill, incompatible appends
raise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class SchemaEvolutionError(ValueError):
    pass


def append_batch(store_path: str, batch: DataFrame) -> None:
    """Append a batch whose schema may ADD nullable columns relative
    to the store. Refuses drops and type changes — additive-only."""
    spark = batch.sparkSession
    try:
        existing = spark.read.parquet(store_path)
    except Exception:
        existing = None
    if existing is not None:
        old = {f.name: f.dataType for f in existing.schema.fields}
        new = {f.name: f.dataType for f in batch.schema.fields}
        missing = set(old) - set(new)
        if missing:
            raise SchemaEvolutionError(
                f"batch drops store columns {sorted(missing)} — additive-only"
            )
        changed = {c for c in old if old[c] != new[c]}
        if changed:
            raise SchemaEvolutionError(
                f"batch changes column types {sorted(changed)} — additive-only"
            )
    batch.write.mode("append").parquet(store_path)


def read_evolved(spark: SparkSession, store_path: str) -> DataFrame:
    """Read the store under the UNION schema of all file footers;
    files predating a column surface NULL for it."""
    return spark.read.option("mergeSchema", "true").parquet(store_path)


def with_backfill(df: DataFrame, defaults: dict) -> DataFrame:
    """Compute-on-read backfill for evolved columns: replace the
    NULLs old files surface with a default, without touching a byte
    on disk. Rewrite-on-compaction later makes it physical."""
    for col, val in defaults.items():
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(val)))
    return df
