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


# Exact missing-relation SQLSTATEs: 42X05 Derby, 42P01 Postgres,
# 42S02 MySQL/SQLServer. Oracle reports the generic 42000 for
# ORA-00942, so its vendor errorCode is matched instead.
_MISSING_TABLE_SQLSTATES = {"42X05", "42P01", "42S02"}
_MISSING_TABLE_VENDOR_CODES = {942}  # ORA-00942: table or view does not exist


def _sql_state_and_code(e: Exception) -> tuple[str | None, int | None]:
    """Walk the wrapped JVM exception's cause chain to the first
    java.sql.SQLException and return its (getSQLState(),
    getErrorCode()) EXACTLY — never by substring-sniffing the message,
    where a transient failure whose stack trace mentions another
    missing relation (or happens to embed '42p01') would be
    misclassified. Returns (None, None) when no SQLException is
    reachable (pure-Python or non-JDBC failure)."""
    j = getattr(e, "java_exception", None)
    if j is None:
        # pyspark's CapturedException keeps the Py4J error under _origin
        origin = getattr(e, "_origin", None)
        j = getattr(origin, "java_exception", None) if origin is not None else None
    depth = 0
    while j is not None and depth < 16:
        state = code = None
        try:
            state = j.getSQLState()
            code = j.getErrorCode()
        except Exception:
            pass  # not a SQLException level: keep walking the causes
        if state is not None:
            return str(state), int(code) if code is not None else None
        try:
            j = j.getCause()
        except Exception:
            return None, None
        depth += 1
    return None, None


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
        # launder duplicates past the idempotence contract.
        # Classification is by the underlying SQLException's EXACT
        # SQLState/vendor code; when one is present and not a
        # missing-relation marker we re-raise even if the message text
        # happens to contain one. The message heuristic survives only
        # as the fallback for exception shapes carrying no SQLState,
        # and requires BOTH the not-found phrase AND the table name
        # (Derby: "Table/View 'T' does not exist", Postgres:
        # 'relation "t" does not exist').
        state, code = _sql_state_and_code(e)
        tbl = cfg.table.split(".")[-1].strip('"').strip("'").lower()
        if state is not None or code is not None:
            if not (state in _MISSING_TABLE_SQLSTATES
                    or code in _MISSING_TABLE_VENDOR_CODES):
                raise
            # A missing-relation SQLState alone is not enough: the
            # mirror read can surface a missing VIEW/synonym referenced
            # via cfg options or a dropped dependency — treating that
            # as first delivery would append the whole batch and
            # launder duplicates (ADVICE r7). First delivery only when
            # the error names the mirror table itself.
            if tbl not in str(e).lower():
                raise
        else:
            msg = str(e).lower()
            phrase = "does not exist" in msg or "not found" in msg
            if not (phrase and tbl in msg):
                raise
        new_rows = deduped
    new_rows.write.format("jdbc").options(**cfg.options()).mode("append").save()
