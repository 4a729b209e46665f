"""Python UDTF surface (SURVEY.md §2.10) — Spark 4's user-defined
TABLE functions, the row-expanding escape hatch beside scalar pandas
UDFs and applyInPandas group maps.

The registered example is the table-function twin of the passback
parser (reference main.py:94-101): one serialized dict row expands to
(key, value) rows via LATERAL join. The production path for this
particular job stays `with_passback_parsed` + `explode` (JVM
expressions, split-union Python only on malformed rows —
functions/passback.py); the UDTF exists for the shapes built-ins
can't reach (multi-row emission with per-row Python state), and the
parity test pins that both routes agree exactly.

Scale note: a Python UDTF is row-at-a-time Python — strictly the
LAST resort after (a) built-in generators (explode/inline/stack),
(b) Arrow-batched pandas UDFs returning arrays + explode. It earns
its place only when emission logic is stateful per input row in ways
array expressions can't express.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from grader_etl_spark.functions.passback import safe_parse_passback


@udtf(returnType="key string, value string")
class PassbackExplode:
    """LATERAL passback_explode(raw): one (key, value) row per entry
    of the JSON-or-Python-literal dict, {} (no rows) on garbage —
    decision order identical to the reference scalar."""

    def eval(self, raw: str | None):  # noqa: D102 — contract above
        for k, v in safe_parse_passback(raw).items():
            yield str(k), (None if v is None else str(v))


def register_udtfs(spark) -> None:
    """Idempotent session registration of every UDTF in this module."""
    spark.udtf.register("passback_explode", PassbackExplode)
