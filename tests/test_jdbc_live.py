"""LIVE JDBC mirror tests (sources/jdbc.py, SURVEY K1) against the
Derby engine Spark itself ships — a real JDBC url, real batched
writes, real dialect round-trip; only the url/driver pair differs
from the reference's PostgreSQL sink (main.py:180-228). Covers the
reference's two DB behaviors: batch insert with ON-CONFLICT-DO-NOTHING
idempotence (rendered as the pre-write anti-join) and the report-side
filtered read (predicate pushed into the generated SQL)."""

from __future__ import annotations

import pytest

from grader_etl_spark.sources.jdbc import JdbcConfig, idempotent_mirror_append, read_table

SCHEMA = "user_id string, event_timestamp timestamp, attempt_type string, oauth_consumer_key string"


def _cfg(tmp_path) -> JdbcConfig:
    return JdbcConfig(
        url=f"jdbc:derby:{tmp_path}/mirror;create=true",
        table="statistics",
        num_partitions=2,
        extra={
            "driver": "org.apache.derby.jdbc.EmbeddedDriver",
            # Spark's Derby dialect maps StringType -> CLOB, which
            # Derby cannot compare to literals (ERROR 42818) — the
            # same knob a Postgres deployment uses to pick TEXT vs
            # VARCHAR widths.
            "createTableColumnTypes": (
                "user_id VARCHAR(64), attempt_type VARCHAR(16), "
                "oauth_consumer_key VARCHAR(64)"
            ),
        },
    )


def _rows(spark, cfg):
    return sorted(
        (r.user_id, r.event_timestamp.isoformat(), r.attempt_type)
        for r in read_table(spark, cfg).collect()
    )


def test_live_mirror_idempotent_redelivery(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 15, 10, 0, 0)
    cfg = _cfg(tmp_path)

    # first delivery creates the table; in-batch dup (u1@t0) collapses
    batch1 = spark.createDataFrame(
        [("u1", t0, "run", "ok1"), ("u1", t0, "check", "ok1b"), ("u2", t0, "run", "ok2")],
        SCHEMA,
    )
    idempotent_mirror_append(batch1, cfg, keys=["user_id", "event_timestamp"],
                             order=["attempt_type", "oauth_consumer_key"])
    assert _rows(spark, cfg) == [
        ("u1", "2024-01-15T10:00:00", "check"),  # first-writer-wins order
        ("u2", "2024-01-15T10:00:00", "run"),
    ]

    # overlapping redelivery (same u1@t0 key, different payload) + one new
    batch2 = spark.createDataFrame(
        [("u1", t0, "run", "DIFFERENT"), ("u3", t0, "run", "ok3")], SCHEMA
    )
    idempotent_mirror_append(batch2, cfg, keys=["user_id", "event_timestamp"],
                             order=["attempt_type", "oauth_consumer_key"])
    assert _rows(spark, cfg) == [
        ("u1", "2024-01-15T10:00:00", "check"),  # redelivery did NOT win
        ("u2", "2024-01-15T10:00:00", "run"),
        ("u3", "2024-01-15T10:00:00", "run"),
    ]

    # exact re-delivery of batch2 is a no-op
    idempotent_mirror_append(batch2, cfg, keys=["user_id", "event_timestamp"],
                             order=["attempt_type", "oauth_consumer_key"])
    assert len(_rows(spark, cfg)) == 3


def test_live_read_pushes_filter_into_jdbc_scan(spark, tmp_path):
    import datetime as dt

    cfg = _cfg(tmp_path)
    batch = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 15, 10), "run", "x"),
         ("u2", dt.datetime(2024, 1, 16, 10), "check", "y")],
        SCHEMA,
    )
    idempotent_mirror_append(batch, cfg, keys=["user_id", "event_timestamp"],
                             order=["attempt_type", "oauth_consumer_key"])
    scan = read_table(spark, cfg).filter("user_id = 'u2'").select("user_id", "attempt_type")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan, plan
    assert [tuple(r) for r in scan.collect()] == [("u2", "check")]


def test_bad_url_surfaces_loudly(spark, tmp_path):
    cfg = JdbcConfig(url="jdbc:derby:/nonexistent-parent/nope", table="t",
                     extra={"driver": "org.apache.derby.jdbc.EmbeddedDriver"})
    batch = spark.createDataFrame([("u1",)], "user_id string")
    with pytest.raises(Exception):
        idempotent_mirror_append(batch, cfg, keys=["user_id"], order=["user_id"])


def test_sqlstate_classification_not_fooled_by_message_text(spark, tmp_path, monkeypatch):
    """Round-7 hardening: classification is by the underlying
    SQLException's EXACT SQLState, so a transient failure whose
    MESSAGE happens to contain a missing-table code or phrase
    re-raises instead of laundering the whole batch past the
    idempotence anti-join."""
    import datetime as dt

    from grader_etl_spark.sources import jdbc as jdbc_mod

    class FakeJavaSQLException:
        def __init__(self, state, code, cause=None):
            self._s, self._c, self._cause = state, code, cause

        def getSQLState(self):
            return self._s

        def getErrorCode(self):
            return self._c

        def getCause(self):
            return self._cause

    class FakeError(Exception):
        def __init__(self, msg, state, code):
            super().__init__(msg)
            self.java_exception = FakeJavaSQLException(state, code)

    batch = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 15, 10), "run", "ok")], SCHEMA
    )
    cfg = _cfg(tmp_path)

    # connection failure (08006) whose message name-drops 42P01 and the
    # not-found phrase + table name: MUST re-raise
    poisoned = FakeError(
        'connection dropped while checking relation "statistics" does not '
        "exist hint 42p01 42x05", "08006", 0,
    )
    monkeypatch.setattr(jdbc_mod, "read_table", lambda *_: (_ for _ in ()).throw(poisoned))
    with pytest.raises(FakeError):
        idempotent_mirror_append(batch, cfg, keys=["user_id", "event_timestamp"],
                                 order=["attempt_type", "oauth_consumer_key"])

    # missing-relation SQLState that names a DIFFERENT relation (a
    # dropped view/synonym the mirror read depends on, not the mirror
    # table itself): MUST re-raise — classifying it as first delivery
    # would append the whole batch and launder duplicates (ADVICE r7)
    other_rel = FakeError('relation "stats_view" does not exist', "42P01", 0)
    monkeypatch.setattr(jdbc_mod, "read_table", lambda *_: (_ for _ in ()).throw(other_rel))
    with pytest.raises(FakeError):
        idempotent_mirror_append(batch, cfg, keys=["user_id", "event_timestamp"],
                                 order=["attempt_type", "oauth_consumer_key"])

    # genuine missing relation: exact state AND the error names the
    # mirror table — first delivery proceeds (append creates the table)
    missing = FakeError('relation "statistics" does not exist', "42P01", 0)
    monkeypatch.setattr(jdbc_mod, "read_table", lambda *_: (_ for _ in ()).throw(missing))
    idempotent_mirror_append(batch, cfg, keys=["user_id", "event_timestamp"],
                             order=["attempt_type", "oauth_consumer_key"])
    monkeypatch.undo()
    assert _rows(spark, cfg) == [("u1", "2024-01-15T10:00:00", "run")]


def test_sqlstate_walk_on_real_missing_derby_table(spark, tmp_path):
    """The real Derby chain (SparkException -> SQLSyntaxErrorException)
    resolves to exact SQLState 42X05."""
    from grader_etl_spark.sources.jdbc import _sql_state_and_code

    cfg = JdbcConfig(
        url=f"jdbc:derby:{tmp_path}/probe;create=true", table="nosuchtable",
        extra={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    try:
        read_table(spark, cfg).collect()
        raise AssertionError("expected missing-table failure")
    except AssertionError:
        raise
    except Exception as e:
        assert _sql_state_and_code(e)[0] == "42X05"
    assert _sql_state_and_code(ValueError("not found 42p01")) == (None, None)
