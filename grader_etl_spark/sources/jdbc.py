"""JDBC mirror (SURVEY.md §2.7 K1) — the reference's PostgreSQL sink
(/root/reference/main.py:180-228) re-expressed for Spark.

The reference pays one network round trip per row (main.py:190-217);
Spark's JDBC writer batches per partition. The ON CONFLICT DO NOTHING
half is NOT expressible in df.write.jdbc — the idempotence must happen
BEFORE the write (operators/dedup.insert_new_keys_only against the
mirror's keys), which is why the canonical store is parquet and JDBC
is a mirror, not the source of truth.

No PostgreSQL driver jar ships in this environment, but Spark bundles
Derby (its metastore engine), which is a full JDBC target — the live
round-trip (create → batched append → anti-join idempotent redelivery
→ filter-pushdown scan) is exercised end-to-end against an embedded
Derby database in tests/test_jdbc_live.py; a production deployment
swaps the url/driver pair for Postgres and keeps every code path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.operators.dedup import first_writer_wins, insert_new_keys_only


@dataclass
class JdbcConfig:
    url: str  # e.g. jdbc:postgresql://host:5432/db
    table: str
    user: str = ""
    password: str = ""
    batch_size: int = 10_000  # rows per INSERT round trip, vs the reference's 1
    num_partitions: int = 8  # parallel writer connections
    extra: dict = field(default_factory=dict)

    def options(self) -> dict:
        return {
            "url": self.url,
            "dbtable": self.table,
            "user": self.user,
            "password": self.password,
            "batchsize": str(self.batch_size),
            "numPartitions": str(self.num_partitions),
            **self.extra,
        }


def read_table(spark: SparkSession, cfg: JdbcConfig) -> DataFrame:
    """Mirror scan (S3). Catalyst pushes filters/projections into the
    generated SQL where the JDBC dialect allows."""
    return spark.read.format("jdbc").options(**cfg.options()).load()


def idempotent_mirror_append(
    batch: DataFrame, cfg: JdbcConfig, keys: list[str], order: list[str]
) -> None:
    """The reference's save_to_db semantics at batch granularity:
    in-batch first-writer-wins, anti-join against the mirror's existing
    keys (reads only the key columns), then one batched append."""
    deduped = first_writer_wins(batch, keys=keys, order=order)
    try:
        existing = read_table(batch.sparkSession, cfg).select(*keys)
        new_rows = insert_new_keys_only(deduped, existing, keys=keys)
    except Exception as e:
        # Only a MISSING mirror table means first delivery (append
        # below creates it). A transient read failure must re-raise:
        # swallowing it would append the whole deduped batch and
        # launder duplicates past the idempotence contract. The check
        # requires BOTH the not-found phrase AND the table name in the
        # message (Derby: "Table/View 'T' does not exist", Postgres:
        # 'relation "t" does not exist') so unrelated failures whose
        # stack trace merely contains "not found" re-raise.
        msg = str(e).lower()
        tbl = cfg.table.split(".")[-1].strip('"').strip("'").lower()
        phrase = "does not exist" in msg or "not found" in msg
        # dialect-spanning missing-table markers for engines whose
        # message omits the table name: Oracle ORA-00942, SQLSTATE
        # 42X05 (Derby), 42P01 (Postgres), 42S02 (MySQL/SQLServer)
        coded = any(c in msg for c in ("ora-00942", "42x05", "42p01", "42s02"))
        if not (coded or (phrase and tbl in msg)):
            raise
        new_rows = deduped
    new_rows.write.format("jdbc").options(**cfg.options()).mode("append").save()
