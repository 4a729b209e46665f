"""Dual-syntax serialized-dict parsing (SURVEY.md §2.9).

The reference's one UDF-shaped function, ``safe_parse_passback``
(/root/reference/main.py:94-101), accepts BOTH JSON (`{"k": "v"}`)
and Python-literal (`{'k': 'v'}`) dict syntax: try ``json.loads``,
then ``ast.literal_eval``, else ``{}``. Upstream really emits both,
so the tolerance is a semantic, not a bug.

Spark-first hybrid (same decision order, vectorized):

1. fast path — ``from_json(col, MapType)``: JVM-side, codegen, no
   Python. Handles the JSON half, which is the common case.
2. fallback — an Arrow-batched pandas UDF running ``ast.literal_eval``
   ONLY on rows where (1) returned null and the raw string is
   non-null. At 100 TB the Python cost is proportional to the
   malformed fraction, not the table.
3. final fallback — empty map, matching the reference's ``{}``.
"""

from __future__ import annotations

import ast
import json

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import MapType, StringType

# An explicit DataType (not a DDL string): executors re-import this
# module, and parsing a DDL string there would need a live session.
_MAP_TYPE = MapType(StringType(), StringType())


def safe_parse_passback(raw: str | None) -> dict:
    """Reference-parity scalar parser (main.py:94-101) — used by tests
    as the semantic oracle and by the pandas UDF below per batch."""
    if not raw:
        return {}
    try:
        out = json.loads(raw)
    except (ValueError, TypeError):
        try:
            out = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            return {}
    return out if isinstance(out, dict) else {}


@pandas_udf(_MAP_TYPE)
def _literal_eval_udf(raw: pd.Series) -> pd.Series:
    def parse(s: object) -> dict | None:
        d = safe_parse_passback(s if isinstance(s, str) else None)
        # stringify values so the map type is uniform with from_json
        return {str(k): (None if v is None else str(v)) for k, v in d.items()}

    return raw.map(parse)


def parse_passback(raw: Column) -> Column:
    """Hybrid dual-syntax parse as a single Column expression: from_json
    fast path, literal-eval pandas-UDF fallback, `{}` default —
    order-identical to the reference (JSON first, literal second,
    empty last).

    SCALE WARNING: Spark extracts pandas UDFs out of `when` branches
    into an ArrowEvalPython node that evaluates on EVERY input row —
    the guard selects which result is kept, it does not short-circuit
    the Python call. Use :func:`with_passback_parsed` (split-union) in
    anything row-count-bound; this expression form is kept only for
    expression-level composition on small frames and for tests.
    """
    fast = F.from_json(raw, _MAP_TYPE)
    slow = _literal_eval_udf(raw)
    empty = F.create_map().cast(_MAP_TYPE)
    return (
        F.when(fast.isNotNull(), fast)
        .when(raw.isNotNull(), F.coalesce(slow, empty))
        .otherwise(empty)
    )


def with_passback_parsed(df: "DataFrame", raw_col: str, out_col: str) -> "DataFrame":
    """Split-union dual-syntax parse: adds ``out_col`` (map<string,string>)
    parsed from ``df[raw_col]``.

    Row routing (decision order identical to the reference's
    json.loads → ast.literal_eval → {} at main.py:94-101):

    * fast subset — rows where ``from_json`` succeeds OR the raw string
      is null: resolved entirely JVM-side (codegen), zero Python.
    * fallback subset — rows where ``from_json`` returns null on a
      non-null string (Python-literal syntax, or garbage → `{}`): ONLY
      these reach the Arrow-batched literal-eval UDF.

    The ArrowEvalPython node's child is the *filtered* frame, so at
    100 TB the Python/Arrow cost is proportional to the malformed
    fraction, not the table (pinned by tests/test_plans.py). The input
    subtree is evaluated once per branch — two parquet scans with
    identical pushdown, which is far cheaper than one scan plus an
    all-rows Arrow round-trip.
    """
    fast = F.from_json(F.col(raw_col), _MAP_TYPE)
    empty = F.create_map().cast(_MAP_TYPE)
    ok = df.filter(fast.isNotNull() | F.col(raw_col).isNull()).withColumn(
        out_col, F.coalesce(fast, empty)
    )
    fallback = df.filter(fast.isNull() & F.col(raw_col).isNotNull()).withColumn(
        out_col, F.coalesce(_literal_eval_udf(F.col(raw_col)), empty)
    )
    return ok.unionByName(fallback)
